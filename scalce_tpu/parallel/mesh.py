"""Sharded block pipelines: ``shard_map`` data parallelism.

Design (SURVEY.md §3): reads are sharded into independent fixed-size
blocks; a ``('data',)`` mesh axis carries one block per device per
super-step.  The core dictionary is implicit (a hash — ``bitops.mix32``)
so there is nothing to broadcast; the only genuine collective in the
whole framework is the lossy-quality histogram ``psum`` (all hosts must
derive the same merge table — SURVEY.md §6 "Distributed communication
backend": "histogram all-reduce for shared lossy tables").
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scalce_tpu.ops import core_match, reorder
from scalce_tpu.ops.bitops import pack_bases_u32
from scalce_tpu.ops import rans
from scalce_tpu.streams import qualities


def local_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def _block_stage1(seq, qual, lengths, n_reads, exc_mask, qual_map,
                  k: int, seed: int, order: int):
    """Single-block encode stage (the body shard_map maps over blocks);
    delegates to the same core as the single-device pipeline."""
    from scalce_tpu.pipeline.encode import _encode_core
    # sharded path uses the implicit hash dictionary (sentinel LUT);
    # explicit-LUT mode replicates the table via the same mechanism
    return _encode_core(seq, pack_bases_u32(seq, axis=1), qual, lengths,
                        n_reads, exc_mask, qual_map,
                        jnp.zeros(1, jnp.uint32), k, seed, order)


def make_sharded_stage1(mesh: Mesh, k: int, seed: int, order: int):
    """jit'd stage-1 over stacked blocks ``[D, B, L]`` sharded on 'data'.

    Each device runs its local blocks through the full tokenize→sort→
    reorder→pack→histogram stage with zero cross-device traffic.
    """
    dspec = P("data")
    rspec = P()           # replicated (qual_map)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(dspec, dspec, dspec, dspec, dspec, rspec),
             out_specs=(dspec,) * 6)
    def stage1(seq, qual, lengths, n_reads, exc_mask, qual_map):
        f = partial(_block_stage1, k=k, seed=seed, order=order)
        return jax.vmap(f, in_axes=(0, 0, 0, 0, 0, None))(
            seq, qual, lengths, n_reads, exc_mask, qual_map)

    return jax.jit(stage1)


def make_sharded_qual_encode(mesh: Mesh, n_syms: int, T: int):
    """jit'd rANS pass B over stacked blocks with per-block tables."""
    dspec = P("data")

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(dspec,) * 4, out_specs=(dspec,) * 3)
    def encode(sym, ctx, freq_lut, cum_lut):
        def one(sym_b, ctx_b, f_b, c_b):
            states, words, emits = rans.rans_encode(
                sym_b.reshape(-1), ctx_b.reshape(-1), f_b, c_b, n_syms, T)
            packed, counts = rans.compact_emissions(words, emits)
            return states, packed, counts
        return jax.vmap(one)(sym, ctx, freq_lut, cum_lut)

    return jax.jit(encode)


def make_lossy_hist_allreduce(mesh: Mesh, n_syms: int):
    """Global quality histogram with a psum over 'data' — every shard
    (and every host, over ICI/DCN) sees the same totals, so the lossy
    merge table is identical everywhere by construction."""
    dspec = P("data")

    @partial(jax.shard_map, mesh=mesh, in_specs=(dspec, dspec),
             out_specs=P())
    def hist(qual, lengths):
        B = qual.shape[1]
        L = qual.shape[2]
        col = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        valid = col < lengths[:, :, None]
        sym = jnp.clip(qual.astype(jnp.int32) - qualities.QUAL_OFFSET,
                       0, n_syms - 1)
        sym = jnp.where(valid, sym, n_syms)          # padding -> overflow bin
        h = jnp.zeros(n_syms + 1, jnp.int32).at[sym.reshape(-1)].add(1)
        return jax.lax.psum(h[:n_syms], "data")

    return jax.jit(hist)
