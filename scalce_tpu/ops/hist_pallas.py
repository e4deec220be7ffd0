"""Pallas TPU kernel for the (ctx, sym) histogram — scatter-free via
one-hot MXU accumulation.

Mosaic has no scatter-add ("Unimplemented primitive ... scatter-add"),
which kept the quality histogram (`ops.rans.context_histogram`, the
device replacement for the reference's adaptive-model counting pass
[REF: scalce arithmetic.c model updates — UNVERIFIED; SURVEY.md §3
"Quality codec"]) on the XLA `.at[].add` path — the last stage of the
device quality encode still paying the remote XLA compiler minutes per
fresh graph.  This kernel removes the scatter instead of porting it,
with the same trick the round-3 decode kernel proved out
(`rans_decode_pallas.py`): counting IS a matmul on one-hot operands.

  cell index  idx = ctx*n_syms + sym              (flat, < C*S)
  factored    idx = hi*LO + lo                    (LO = 512 lanes)
  per tile    hist[hi, lo] += onehot_hi[Rh, TT] @ onehot_lo[TT, LO]

accumulated over time tiles in an i32 VMEM scratch (TPU grids run
sequentially, so the scratch carries across tiles).  Exactness without
``precision=HIGHEST``: one-hot entries are 0.0/1.0 — exact in bf16, so
even the MXU's default one-pass bf16 input truncation is lossless —
and the MXU accumulates in f32 where every count <= TT << 2^24 is
exact.  (Contrast the decode kernel, whose table VALUES reach 2^23 and
DO get truncated; here only the accumulator grows.)

Padding: the wrapper pads the symbol stream to a tile multiple with
``hi = Rh_pad`` — beyond every iota row, so the padded columns one-hot
to all-zero and count nothing.

Output is bit-identical to the `.at[].add` fallback (pinned by
tests/test_rans.py in interpret mode); callers fall back off-TPU or
for tiny inputs where the kernel's fixed tile cost isn't worth it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    PALLAS_OK = True
except Exception:  # pragma: no cover - exotic backends
    PALLAS_OK = False

#: symbols per time tile (the matmul's contraction depth); multiple of
#: the 8x128 f32 tile in both oh operands
_TT = 512
#: minor factor of the cell index (the matmul's output lane dim)
_LO = 512
#: VMEM budget for eligibility (v5e ~16 MB/core minus Mosaic staging)
_VMEM_BUDGET = 12 << 20
#: below this many symbols the XLA scatter-add is cheaper than the
#: kernel's fixed tile cost (and tests' tiny grids stay on the exact
#: code path they pin)
_MIN_SYMBOLS = 1 << 14


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(hi_ref, lo_ref, out_ref, acc_ref, *, Rh_pad: int, LO: int):
    """hi [1, TT] i32; lo [TT, 1] i32; out/acc [Rh_pad, LO] i32."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    TT = hi_ref.shape[1]
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (Rh_pad, TT), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (TT, LO), 1)
    oh_hi = (hi_iota == hi_ref[:]).astype(jnp.float32)    # [Rh_pad, TT]
    oh_lo = (lo_iota == lo_ref[:]).astype(jnp.float32)    # [TT, LO]
    # default precision is exact here: 0/1 inputs are bf16-exact and the
    # MXU accumulates in f32 (counts <= TT << 2^24)
    prod = jnp.dot(oh_hi, oh_lo, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + prod.astype(jnp.int32)

    @pl.when(g == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("n_cells", "interpret"))
def histogram_pallas(idx: jnp.ndarray, n_cells: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Count occurrences of each cell index.

    idx: i32/u32 ``[S]`` flat cell indices in ``[0, n_cells)``.
    Returns i32 ``[n_cells]`` — bit-identical to
    ``jnp.zeros(n_cells, i32).at[idx].add(1)``.
    """
    S = idx.shape[0]
    TT = min(_TT, _round_up(max(S, 8), 8))
    Rh = -(-n_cells // _LO)
    Rh_pad = _round_up(Rh, 8)
    idx = idx.astype(jnp.int32)
    Sp = _round_up(S, TT)
    # pad with hi = Rh_pad: beyond every iota row -> counts nothing
    pad_idx = Rh_pad * _LO
    if Sp != S:
        idx = jnp.pad(idx, (0, Sp - S), constant_values=pad_idx)
    # hi rides a 3-D layout: a (1, TT) block of a [G, TT] array violates
    # Mosaic's minor-dims rule (second-minor must be 8-divisible or the
    # full dim), so the grid axis gets its own major dim instead
    hi = (idx // _LO).reshape(Sp // TT, 1, TT)
    lo = (idx % _LO).reshape(Sp, 1)

    kernel = partial(_kernel, Rh_pad=Rh_pad, LO=_LO)
    out = pl.pallas_call(
        kernel,
        grid=(Sp // TT,),
        in_specs=[
            pl.BlockSpec((None, 1, TT), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rh_pad, _LO), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rh_pad, _LO), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Rh_pad, _LO), jnp.int32)],
        interpret=interpret,
    )(hi, lo)
    return out.reshape(-1)[:n_cells]


def _vmem_bytes(n_cells: int) -> int:
    Rh_pad = _round_up(-(-n_cells // _LO), 8)
    # oh_hi + oh_lo + product + out + scratch (all f32/i32)
    return 4 * (Rh_pad * _TT + _TT * _LO + 3 * Rh_pad * _LO)


def eligible(S: int, n_cells: int, backend: str) -> bool:
    """Static gate; the `.at[].add` fallback is bit-identical."""
    if not PALLAS_OK or backend != "tpu":
        return False
    if S < _MIN_SYMBOLS:
        return False
    return _vmem_bytes(n_cells) <= _VMEM_BUDGET
