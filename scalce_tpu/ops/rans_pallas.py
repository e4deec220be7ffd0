"""Pallas TPU kernel for the rANS encode scan (SURVEY.md §8 step 7:
"Pallas versions of rans where XLA leaves throughput on the table").

The encode scan is gather-free once the (freq, cum) tables are
pre-gathered (ops/rans.py), so it maps cleanly onto a Pallas kernel:

  grid = (lane tiles, time tiles)    -- TPU grids run sequentially with
                                        the LAST axis innermost, so VMEM
                                        scratch carries the rANS states
                                        across the time tiles of one
                                        lane tile
  per step: pure VPU arithmetic (renorm compare, exact u32/u13 divide
            via two corrected f32 divides, state update)

The kernel emits the same (states, words, emits) as the XLA scan; all
compaction stays in XLA.  It is OPTIONAL: callers fall back to the
lax.scan implementation off-TPU or if the kernel fails to build, and a
property test pins bit-identical outputs against the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scalce_tpu.ops.bitops import U32
from scalce_tpu.ops.rans import PROB_BITS, RANS_L

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    PALLAS_OK = True
except Exception:  # pragma: no cover - exotic backends
    PALLAS_OK = False

# plain ints: module-level jnp scalars would be captured as constants,
# which pallas_call rejects
_MASK16 = 0xFFFF
_MASK12 = (1 << PROB_BITS) - 1
_RANS_L_INT = int(RANS_L)

#: lane/time tile sizes (VMEM footprint ~= 2 in + 2 out tiles + state)
_NT = 2048
_TT = 128


def _f32_floordiv(a, f):
    # Mosaic has no u32->f32 cast; operands are < 2^24 so the detour
    # through i32 is exact
    af = a.astype(jnp.int32).astype(jnp.float32)
    ff = f.astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(af / ff).astype(jnp.int32)
    r = a.astype(jnp.int32) - q * f.astype(jnp.int32)
    fi = f.astype(jnp.int32)
    q = jnp.where(r < 0, q - 1, jnp.where(r >= fi, q + 1, q))
    return q.astype(U32)


def _kernel(f_ref, c_ref, words_ref, emits_ref, states_ref, x_ref):
    """One (lane-tile, time-tile) grid step; tiles arrive in ENCODE
    order (t descending).  x_ref: VMEM scratch [1, NT] carrying states
    across this lane tile's time tiles."""
    t_tile = pl.program_id(1)

    @pl.when(t_tile == 0)
    def _init():
        x_ref[:] = jnp.full_like(x_ref, jnp.uint32(_RANS_L_INT))

    def step(i, x):
        f = f_ref[i, :]
        cum = c_ref[i, :]
        emit = (x >> 20) >= f
        # u32 stores: Mosaic cannot do dynamic single-row stores of
        # 16/8-bit vectors (sublane granularity); narrowed outside
        words_ref[i, :] = x & jnp.uint32(_MASK16)
        emits_ref[i, :] = emit.astype(jnp.uint32)
        x = jnp.where(emit, x >> 16, x)
        # exact x // f, x % f for f <= 4096 (ops/rans.udiv_u32_small)
        xh = x >> 12
        xl = x & jnp.uint32(_MASK12)
        q1 = _f32_floordiv(xh, f)
        rem1 = xh - q1 * f
        low = (rem1 << 12) | xl
        q2 = _f32_floordiv(low, f)
        r = low - q2 * f
        return (((q1 << 12) + q2) << PROB_BITS) + r + cum

    x = jax.lax.fori_loop(0, f_ref.shape[0], step, x_ref[0, :])
    x_ref[0, :] = x

    @pl.when(t_tile == pl.num_programs(1) - 1)
    def _flush():
        states_ref[0, :] = x_ref[0, :]


@partial(jax.jit, static_argnames=("interpret",))
def encode_scan_pallas(f_all: jnp.ndarray, c_all: jnp.ndarray,
                       interpret: bool = False):
    """Pallas rANS encode over pre-gathered tables.

    f_all/c_all: u32 ``[T, N]`` in DATA order (t ascending).  Returns
    ``(states u32 [N], words u16 [T, N], emits bool [T, N])`` with the
    time axis in DECODE order — bit-identical to the lax.scan path in
    ``rans.rans_encode``.
    """
    T, N = f_all.shape
    NT = min(_NT, N)
    TT = min(_TT, T)
    if N % NT or T % TT:
        raise ValueError("encode_scan_pallas needs tile-divisible shapes")
    # encoder walks t descending: feed reversed tiles
    f_rev = f_all[::-1]
    c_rev = c_all[::-1]

    spec = pl.BlockSpec((TT, NT), lambda n, t: (t, n),
                        memory_space=pltpu.VMEM)
    words_rev, emits_rev, states = pl.pallas_call(
        _kernel,
        grid=(N // NT, T // TT),
        in_specs=[spec, spec],
        out_specs=(
            spec,
            pl.BlockSpec((TT, NT), lambda n, t: (t, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT), lambda n, t: (0, n),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, N), jnp.uint32),
            jax.ShapeDtypeStruct((T, N), jnp.uint32),
            jax.ShapeDtypeStruct((1, N), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((1, NT), jnp.uint32)],
        interpret=interpret,
    )(f_rev, c_rev)
    return (states[0], words_rev[::-1].astype(jnp.uint16),
            emits_rev[::-1] != 0)
