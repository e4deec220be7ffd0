"""Pallas TPU kernel for the core-matcher rank/argmin stage
(SURVEY.md §2 "LCE tokenizer / core matcher": "Pallas kernel: per-read
sliding 2-bit window hash + LUT lookup, vectorized argmax of core rank
over positions"; CLAUDE.md roadmap #1).

The matcher's hot section is six masked reductions over the ``[B, P]``
k-mer rank grid (min rank, arg positions and k-mer values for BOTH
strands).  XLA's variadic argmin lowers poorly on this environment
(~30 ms/block where the elementwise rank math is ~0.1 ms); as VPU
reductions in one Mosaic kernel the same work is a few ms — and Mosaic
compiles in seconds where fresh XLA graphs cost minutes on the remote
compile service.

The kernel consumes the rolling k-mers and the invalid-window mask
(both cheap XLA elementwise ops), computes both strands' mix32 ranks
in-register, and emits per row:

  lane 0: bf     best forward rank           (u32, U32_MAX = none)
  lane 1: pf     first position achieving bf
  lane 2: br     best reverse-complement rank
  lane 3: pfw    LAST forward position achieving br (= first position
                 in the RC frame, matching the XLA tie-break)
  lane 4: kf     forward k-mer at pf
  lane 5: kr     RC k-mer at pfw

The final selects (core/pos/strand from these six values) are [B]-sized
elementwise XLA ops.  Bit-identical to the pure-XLA path — pinned by
``tests/test_core_match.py`` in interpret mode; the caller falls back
to XLA off-TPU or for non-tileable shapes, so this is a pure
performance placement like ``rans_pallas``.

Mosaic constraints honoured (CLAUDE.md): no dynamic-index gathers (the
"k-mer at argmin position" reads are masked reductions instead), plain
Python ints for module constants, u32-only vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scalce_tpu.ops.bitops import U32

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    PALLAS_OK = True
except Exception:  # pragma: no cover - exotic backends
    PALLAS_OK = False

_BIG = 0xFFFFFFFF      # U32_MAX as a plain int (module-level jnp scalars
                       # would be captured as constants by pallas_call)
_ROWS = 512            # row-tile height (VMEM ~= 2 in + 1 out + temps)
_LANES = 6             # packed output values per row


def _mix32(x, seed: int):
    x = x ^ jnp.uint32(seed & 0xFFFFFFFF)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _revcomp(v, k: int):
    from scalce_tpu.ops.bitops import rev_lanes_u32
    return rev_lanes_u32((~v).astype(U32)) >> (32 - 2 * k)


def _kernel(km_ref, bad_ref, out_ref, *, k: int, seed: int):
    # Mosaic has no unsigned reductions: rank mins run on the
    # order-preserving XOR-bias view (u32 order == i32 order of
    # x ^ 0x8000_0000); position/k-mer reductions use i32 sentinels
    # (both values are < 2^31 for k <= 15).
    km = km_ref[:]                       # [R, Pp] u32 rolling k-mers
    bad = bad_ref[:]                     # [R, Pp] u32, 1 = invalid/pad
    big = jnp.uint32(_BIG)
    bias = jnp.uint32(0x80000000)
    isent = jnp.int32(0x7FFFFFFF)
    rkm = _revcomp(km, k)
    rank_f = jnp.where(bad != 0, big, _mix32(km, seed))
    rank_r = jnp.where(bad != 0, big, _mix32(rkm, seed))
    pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)

    bf_b = jnp.min((rank_f ^ bias).astype(jnp.int32), axis=1,
                   keepdims=True)
    br_b = jnp.min((rank_r ^ bias).astype(jnp.int32), axis=1,
                   keepdims=True)
    bf = bf_b.astype(jnp.uint32) ^ bias
    br = br_b.astype(jnp.uint32) ^ bias
    # argmin with the XLA tie-breaks: FIRST position for the forward
    # strand, LAST for the RC strand (= first in the RC frame)
    pf = jnp.min(jnp.where(rank_f == bf, pos, isent), axis=1,
                 keepdims=True)
    pfw = jnp.max(jnp.where(rank_r == br, pos, jnp.int32(-1)), axis=1,
                  keepdims=True)
    # k-mer value at the chosen position, gather-free (k-mers < 2^31)
    kf = jnp.min(jnp.where(pos == pf, km.astype(jnp.int32), isent),
                 axis=1, keepdims=True)
    kr = jnp.min(jnp.where(pos == pfw, rkm.astype(jnp.int32), isent),
                 axis=1, keepdims=True)

    lane = jax.lax.broadcasted_iota(jnp.uint32, out_ref.shape, 1)
    out = jnp.where(lane == 0, bf,
          jnp.where(lane == 1, pf.astype(jnp.uint32),
          jnp.where(lane == 2, br,
          jnp.where(lane == 3, pfw.astype(jnp.uint32),
          jnp.where(lane == 4, kf.astype(jnp.uint32),
                    kr.astype(jnp.uint32))))))
    out_ref[:] = out


def eligible(B: int) -> bool:
    """Static (trace-time) placement check; the XLA path is
    bit-identical, so this only affects speed."""
    if not PALLAS_OK:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return B % min(_ROWS, B) == 0 and B >= 8


@partial(jax.jit, static_argnames=("k", "seed", "interpret"))
def rank_argmin_pallas(kmers: jnp.ndarray, invalid: jnp.ndarray,
                       k: int, seed: int, interpret: bool = False):
    """Six per-row reductions over the rank grid (see module docstring).

    kmers u32 [B, P], invalid bool [B, P].  Returns (bf, pf, br, pfw,
    kf, kr), each [B] u32.
    """
    B, P = kmers.shape
    Pp = -(-P // 128) * 128
    km = jnp.pad(kmers, ((0, 0), (0, Pp - P)))
    bad = jnp.pad(invalid.astype(jnp.uint32), ((0, 0), (0, Pp - P)),
                  constant_values=1)
    R = min(_ROWS, B)
    out = pl.pallas_call(
        partial(_kernel, k=k, seed=seed),
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, Pp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Pp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.uint32),
        interpret=interpret,
    )(km, bad)
    return (out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4],
            out[:, 5])
