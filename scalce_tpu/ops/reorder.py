"""Bucket reordering as one device-wide stable multi-key sort.

The reference maintains a hash table of buckets and flushes them in core
order with an intra-bucket sort [REF: scalce compress.c bucket table —
UNVERIFIED; SURVEY.md §2 "Bucket manager / reorderer"].  A hash table of
dynamic lists is hostile to XLA; the equivalent dataflow formulation is:
compute every read's sort key, run ONE ``lax.sort`` over the whole block,
and gather.  Buckets then exist implicitly as runs of equal key0 in the
sorted order — same adjacency, no pointers, and deterministic across
hosts because the key is a pure function of read content (SURVEY.md §8
"Deterministic multi-host ordering").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sort_permutation(keys: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Stable lexicographic sort by ``keys[:-1]``; ``keys[-1]`` must be the
    row-index operand and is returned as the permutation (int32 [B])."""
    sorted_ops = jax.lax.sort(keys, dimension=0, num_keys=len(keys) - 1,
                              is_stable=True)
    return sorted_ops[-1].astype(jnp.int32)


def apply_permutation(perm: jnp.ndarray, *arrays: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, ...]:
    """Gather rows of each array by ``perm`` (device-side reorder)."""
    return tuple(a[perm] for a in arrays)


def invert_permutation(perm: jnp.ndarray) -> jnp.ndarray:
    """inv[perm[i]] = i — decode-side mapping back to arrival order."""
    B = perm.shape[0]
    inv = jnp.zeros(B, dtype=jnp.int32)
    return inv.at[perm].set(jnp.arange(B, dtype=jnp.int32))
