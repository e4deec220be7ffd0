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


def _kernel_tbl(sym_ref, pidx_ref, tbl_ref, words_ref, emits_ref,
                states_ref, x_ref, *, T: int, L: int, TT: int,
                col_div: int, PB: int, Rpad: int):
    """Table-resident encode step (round 5): instead of consuming
    pre-gathered per-symbol (f, cum) tables — whose XLA gather costs
    ~290 ms/block at 15 ns/element — the kernel selects them per step
    with the decode kernel's slab trick: the position bucket is a
    per-step SCALAR, the context column comes from a one-hot matmul
    over pidx, and the (f, cum) pair rides as v = f*4096 + cum <= 2^24
    split into THREE bf16-exact byte planes (v>>16, (v>>8)&255, v&255),
    recombined exactly in f32.  sym [TT, NT] and pidx [TT, NT] arrive
    in ENCODE order (t descending); tbl [PB, 3*96, Rpad] bf16."""
    t_tile = pl.program_id(1)

    @pl.when(t_tile == 0)
    def _init():
        x_ref[:] = jnp.full_like(x_ref, jnp.uint32(_RANS_L_INT))

    NT = x_ref.shape[1]
    prev_iota = jax.lax.broadcasted_iota(jnp.int32, (Rpad, NT), 0)
    sym_iota = jax.lax.broadcasted_iota(jnp.int32, (96, NT), 0)

    def step(i, x):
        # original data-order index of this reversed row
        t_orig = T - 1 - (t_tile * TT + i)
        col = t_orig - (t_orig // L) * L
        pb = jnp.minimum(col // col_div, PB - 1)
        sym = sym_ref[pl.ds(i, 1), :]               # [1, NT] i32
        pidx = pidx_ref[pl.ds(i, 1), :]
        oh = (prev_iota == pidx).astype(jnp.bfloat16)
        slab = tbl_ref[pl.ds(pb, 1), :, :][0]       # [3*96, Rpad]
        hl = jnp.dot(slab, oh,
                     preferred_element_type=jnp.float32)  # [288, NT]
        m = sym_iota == sym                         # [96, NT]
        v = (jnp.sum(jnp.where(m, hl[0:96], 0.0), axis=0,
                     keepdims=True) * 65536.0
             + jnp.sum(jnp.where(m, hl[96:192], 0.0), axis=0,
                       keepdims=True) * 256.0
             + jnp.sum(jnp.where(m, hl[192:288], 0.0), axis=0,
                       keepdims=True))
        vi = v.astype(jnp.int32)
        f = (vi >> 12).astype(U32)                  # [1, NT]
        cum = (vi & jnp.int32(_MASK12)).astype(U32)
        emit = (x >> 20) >= f
        words_ref[pl.ds(i, 1), :] = x & jnp.uint32(_MASK16)
        emits_ref[pl.ds(i, 1), :] = emit.astype(jnp.uint32)
        x = jnp.where(emit, x >> 16, x)
        xh = x >> 12
        xl = x & jnp.uint32(_MASK12)
        q1 = _f32_floordiv(xh, f)
        rem1 = xh - q1 * f
        low = (rem1 << 12) | xl
        q2 = _f32_floordiv(low, f)
        r = low - q2 * f
        return (((q1 << 12) + q2) << PROB_BITS) + r + cum

    x = jax.lax.fori_loop(0, TT, step, x_ref[0:1, :])
    x_ref[0:1, :] = x

    @pl.when(t_tile == pl.num_programs(1) - 1)
    def _flush():
        states_ref[0:1, :] = x_ref[0:1, :]


@partial(jax.jit, static_argnames=("T", "L", "col_div", "PB",
                                   "interpret"))
def encode_scan_tbl_pallas(sym_lanes: jnp.ndarray, pidx_lanes: jnp.ndarray,
                           tbl: jnp.ndarray, T: int, L: int,
                           col_div: int, PB: int,
                           interpret: bool = False):
    """Table-resident Pallas rANS encode (see ``_kernel_tbl``).

    sym_lanes/pidx_lanes: i32 ``[T, N]`` in DATA order (t ascending;
    lane n owns symbols n*T..(n+1)*T, exactly ``rans.rans_encode``'s
    layout).  tbl: bf16 ``[PB, 3*96, Rpad]`` from
    :func:`build_encode_slabs`.  Returns ``(states u32 [N],
    words u16 [T, N], emits bool [T, N])`` — bit-identical to
    ``rans.rans_encode`` over the same tables."""
    Tn, N = sym_lanes.shape
    assert Tn == T
    Rpad = tbl.shape[2]
    NT = min(_NT, N)
    TT = min(_TT, T)
    if N % NT or T % TT:
        raise ValueError("encode_scan_tbl_pallas needs tile-divisible "
                         "shapes")
    sym_rev = sym_lanes[::-1].astype(jnp.int32)
    pidx_rev = pidx_lanes[::-1].astype(jnp.int32)
    spec = pl.BlockSpec((TT, NT), lambda n, t: (t, n),
                        memory_space=pltpu.VMEM)
    kernel = partial(_kernel_tbl, T=T, L=L, TT=TT, col_div=col_div,
                     PB=PB, Rpad=Rpad)
    words_rev, emits_rev, states = pl.pallas_call(
        kernel,
        grid=(N // NT, T // TT),
        in_specs=[
            spec, spec,
            pl.BlockSpec((PB, 3 * 96, Rpad), lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
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
    )(sym_rev, pidx_rev, tbl)
    return (states[0], words_rev[::-1].astype(jnp.uint16),
            emits_rev[::-1] != 0)


def build_encode_slabs(freq: jnp.ndarray, cum: jnp.ndarray, R: int,
                       PB: int) -> jnp.ndarray:
    """Pack (freq, cum) tables into the encode kernel's bf16 planes.

    freq/cum: ``[C, 94]`` with C = 1 + PB*R (ctx 0 = padding).  Layout:
    bucket pb, plane j (of v>>16, (v>>8)&255, v&255 for
    v = f*4096 + cum <= 2^24), row s, column p — column R holds ctx 0
    so padding cells (pidx = R) select the full-mass no-op row."""
    C = freq.shape[0]
    Rpad = _round_up_128(R + 1)
    v = freq.astype(jnp.int32) * 4096 + cum.astype(jnp.int32)  # [C, 94]
    # columns: p < R -> ctx 1 + pb*R + p ; p == R -> ctx 0
    body = v[1:].reshape(PB, R, 94).transpose(0, 2, 1)     # [PB, 94, R]
    ctx0 = jnp.broadcast_to(v[0].reshape(1, 94, 1), (PB, 94, 1))
    full = jnp.concatenate([body, ctx0], axis=2)           # [PB, 94, R+1]
    planes = []
    for sh, mask in ((16, False), (8, True), (0, True)):
        # plane 0 is NOT byte-masked: v = 2^24 exactly (the full-mass
        # f = 4096, cum = 0 row) has v>>16 = 256 — still bf16-exact,
        # but `& 255` would truncate it to 0
        p = (full >> sh) & 255 if mask else full >> sh
        p = jnp.pad(p, ((0, 0), (0, 96 - 94), (0, Rpad - (R + 1))))
        planes.append(p)
    return jnp.concatenate(planes, axis=1).astype(jnp.bfloat16)


def _round_up_128(x: int) -> int:
    return (x + 127) // 128 * 128


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
