"""Test bootstrap: run all tests on a virtual 8-device CPU mesh.

Kernel unit tests run on the CPU backend so CI needs no TPU; sharding
tests use --xla_force_host_platform_device_count (SURVEY.md §5).

Gotcha (verified 2026-08-16): the environment's ``sitecustomize.py``
registers the axon TPU plugin and pins ``JAX_PLATFORMS=axon`` in every
python process BEFORE conftest runs, so setting the env var here is not
enough — ``jax.config.update`` after import is what actually wins.
XLA_FLAGS still takes effect because the CPU client initializes lazily
on first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
