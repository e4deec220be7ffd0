"""Importing the package must NEVER initialize a jax backend.

A module-level ``jnp.uint32(...)`` constant once forced device-client
creation at import time; behind a slow axon device service that blocked
every CLI invocation (including pure host-placement runs that never
need the device) for minutes.  Run in a clean subprocess so other
tests' device use cannot mask a regression."""

import subprocess
import sys


def test_import_does_not_initialize_backend():
    code = (
        "import scalce_tpu.cli, scalce_tpu.pipeline.driver, "
        "scalce_tpu.pipeline.decode, scalce_tpu.streams.qualities, "
        "scalce_tpu.streams.seqs, scalce_tpu.streams.names, "
        "scalce_tpu.ops.rans, scalce_tpu.ops.core_match, "
        "scalce_tpu.ops.reorder, scalce_tpu.parallel.mesh\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'import initialized a backend'\n"
        "print('clean')\n"
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "clean" in r.stdout


def test_native_builds_when_compiler_present():
    """The numpy fallbacks exist for toolchain-less hosts — but on a
    host WITH a compiler, a silent native build failure must fail CI
    (it once hid an #include-order bug behind 10x-slower fallbacks)."""
    import os
    import shutil

    import pytest

    if shutil.which(os.environ.get("CC", "cc")) is None:
        pytest.skip("no C compiler on this host")
    from scalce_tpu import native
    assert native.AVAILABLE
