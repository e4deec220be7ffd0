"""Host-side rANS table construction (deterministic, shared by all streams).

The reference's arithmetic coder adapts its model per symbol
[REF: scalce arithmetic.c model update — UNVERIFIED]; a static-table
coder must instead normalize per-block histograms into frequency tables
that BOTH sides derive identically.  Tables are built on host (tiny:
contexts × symbols), stored in the container, and uploaded for both
encode and decode — the decoder never re-derives them from data, so
normalization only needs to be deterministic, not clever.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from scalce_tpu.ops.rans import M_TOTAL, PROB_BITS


def device_normalize(counts, n_ctx: int, n_syms: int):
    """Device-side histogram normalization (jnp; fully vectorized).

    Same contract as :func:`normalize_freqs` (rows sum to M_TOTAL,
    nonzero counts keep freq >= 1, deterministic) with a different —
    but equally valid — mass split: the codec only requires that the
    STORED table be used by both sides, so the split rule is free.

    Scheme: reserve 1 per present symbol, scale the rest by
    ``floor(c * scale * (1 - 1e-5))`` (the bias makes the f32 floor err
    low, so the remainder d >= 0), then add d to the most frequent
    symbol.  No data-dependent loops, no host sync.

    Returns (freq u32 [C, S], cum u32 [C, S]).
    """
    import jax.numpy as jnp
    ci = counts.reshape(n_ctx, n_syms).astype(jnp.int32)
    nz = ci > 0
    # ALL reductions stay in integer: f32 reduction order is
    # lowering-dependent, and these tables must be bit-identical across
    # the plain-jit and shard_map/vmap compilations (the byte-identity
    # invariant).  Only the elementwise scale/floor is f32, which IEEE
    # pins regardless of lowering; operands stay < 2^24 so they are
    # exactly representable.
    nnz = jnp.sum(nz, axis=1, dtype=jnp.int32)
    total = jnp.sum(ci, axis=1, dtype=jnp.int32)
    c = ci.astype(jnp.float32)
    scale = (M_TOTAL - nnz).astype(jnp.float32) / \
        jnp.maximum(total, 1).astype(jnp.float32)
    f_extra = jnp.floor(c * scale[:, None] * (1.0 - 1e-5)).astype(jnp.int32)
    f = jnp.where(nz, 1 + f_extra, 0)
    d = M_TOTAL - jnp.sum(f, axis=1, dtype=jnp.int32)
    top = jnp.argmax(ci, axis=1)
    f = f.at[jnp.arange(n_ctx), top].add(
        jnp.where(nnz > 0, d, 0))
    # empty contexts: all mass on symbol 0 (never referenced)
    f = jnp.where((nnz == 0)[:, None],
                  jnp.zeros_like(f).at[:, 0].set(M_TOTAL), f)
    f = f.astype(jnp.uint32)
    cum = jnp.cumsum(f, axis=1, dtype=jnp.uint32) - f
    return f, cum


def host_normalize(counts: np.ndarray, n_ctx: int, n_syms: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """NumPy mirror of :func:`device_normalize`, bit-identical by
    construction: every arithmetic step is the same IEEE f32 / int32
    operation in the same order, so the host quality codec path emits
    exactly the bytes the device path would (pinned by test).

    Dispatches to the one-pass C mirror when available (same ops, same
    order — bit-identity pinned by test): numpy's ~10 array passes cost
    ~5 ms/block across the order auto-trial's three tables.
    """
    try:
        from scalce_tpu import native as _native
        if _native.AVAILABLE and hasattr(_native, "host_normalize_tbl"):
            return _native.host_normalize_tbl(np.asarray(counts),
                                              n_ctx, n_syms)
    except Exception:  # pragma: no cover - fall through to numpy
        pass
    return host_normalize_np(counts, n_ctx, n_syms)


def host_normalize_np(counts: np.ndarray, n_ctx: int, n_syms: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """The NumPy reference body (tests pin the C mirror against this)."""
    ci = np.asarray(counts).reshape(n_ctx, n_syms).astype(np.int32)
    nz = ci > 0
    nnz = nz.sum(axis=1).astype(np.int32)
    total = ci.sum(axis=1).astype(np.int32)
    c = ci.astype(np.float32)
    scale = (M_TOTAL - nnz).astype(np.float32) / \
        np.maximum(total, 1).astype(np.float32)
    bias = np.float32(1.0 - 1e-5)      # f32-rounded, as jnp computes it
    f_extra = np.floor(c * scale[:, None] * bias).astype(np.int32)
    f = np.where(nz, 1 + f_extra, 0)
    d = M_TOTAL - f.sum(axis=1).astype(np.int32)
    top = np.argmax(ci, axis=1)
    f[np.arange(n_ctx), top] += np.where(nnz > 0, d, 0)
    empty = nnz == 0
    if empty.any():
        f[empty] = 0
        f[empty, 0] = M_TOTAL
    f = f.astype(np.uint32)
    cum = np.cumsum(f, axis=1, dtype=np.uint32) - f
    return f, cum


def normalize_freqs(counts: np.ndarray, n_syms: int) -> np.ndarray:
    """Host REFERENCE normalizer (tests and offline tooling only).

    The production encode path normalizes on device via
    :func:`device_normalize` — the two deliberately use different mass
    splits (both valid: the stored table defines the codec).  Do not
    assume they produce identical tables.

    Normalize per-context histograms to sum exactly M_TOTAL.

    counts: int array ``[C, n_syms]``.  Returns uint32 freq ``[C, n_syms]``
    where every context row sums to M_TOTAL and every symbol with a
    nonzero count keeps freq >= 1.  Empty contexts put all mass on
    symbol 0 (they are never referenced).  Fully deterministic.
    """
    counts = counts.astype(np.int64)
    C = counts.shape[0]
    totals = counts.sum(axis=1)
    freq = np.zeros_like(counts)
    nz = counts > 0
    safe_tot = np.maximum(totals, 1)[:, None]
    f = counts * M_TOTAL // safe_tot
    f = np.maximum(f, nz.astype(np.int64))
    diff = M_TOTAL - f.sum(axis=1)

    for c in np.flatnonzero(diff != 0):
        d = int(diff[c])
        row = f[c]
        if totals[c] == 0:
            continue
        if d > 0:
            row[np.argmax(counts[c])] += d
        else:
            # shave from the largest freqs, never below 1
            while d < 0:
                i = int(np.argmax(row))
                take = min(int(row[i]) - 1, -d)
                if take <= 0:
                    raise ValueError("cannot normalize: too many symbols")
                row[i] -= take
                d += take
    empty = totals == 0
    if empty.any():
        freq[empty, 0] = M_TOTAL
        f[empty] = freq[empty]
    assert (f.sum(axis=1) == M_TOTAL).all()
    return f.astype(np.uint32)


def freq_to_cum(freq: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum per context row (uint32 [C, n_syms])."""
    cum = np.zeros_like(freq)
    np.cumsum(freq[:, :-1], axis=1, out=cum[:, 1:])
    return cum


def build_decode_lut(freq: np.ndarray, cum: np.ndarray) -> np.ndarray:
    """Packed decode table uint32 ``[C * M_TOTAL]``.

    Entry for (ctx c, slot s): ``sym << 24 | (freq-1) << 12 | cum`` —
    one gather per decoded symbol instead of three
    (symbol-from-slot, freq, cum).
    """
    C, n_syms = freq.shape
    if n_syms > 256:
        raise ValueError("n_syms must fit 8 bits in the packed LUT")
    # symbol owning each slot: repeat sym id freq[c, sym] times
    sym_of_slot = np.repeat(
        np.tile(np.arange(n_syms, dtype=np.uint32), C),
        freq.reshape(-1).astype(np.int64)).reshape(C, M_TOTAL)
    f = np.take_along_axis(freq, sym_of_slot.astype(np.int64), axis=1)
    cm = np.take_along_axis(cum, sym_of_slot.astype(np.int64), axis=1)
    packed = (sym_of_slot << 24) | ((f - 1) << PROB_BITS) | cm
    return packed.reshape(-1).astype(np.uint32)


def table_payload(freq: np.ndarray) -> bytes:
    """Serialize normalized freq tables for the container.

    freq values are in [0, M_TOTAL]; rows are sparse and similar, so the
    u16 image is deflated here (self-contained: the table must be
    readable before the stream's own entropy decode can start).
    """
    import zlib
    return zlib.compress(freq.astype("<u2").tobytes(), 6)


def payload_to_freq(payload: bytes, n_ctx: int, n_syms: int) -> np.ndarray:
    import zlib
    freq = np.frombuffer(zlib.decompress(payload), dtype="<u2").reshape(
        n_ctx, n_syms).astype(np.uint32)
    return freq


def tables_from_counts(counts: np.ndarray, n_ctx: int, n_syms: int,
                       build_lut: bool = True
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """counts (flat or [C,S]) -> (freq [C,S], cum [C,S], decode_lut flat).

    build_lut=False skips the decode LUT (encode paths never need it —
    it is rebuilt from the stored freq table at decode time)."""
    counts = np.asarray(counts).reshape(n_ctx, n_syms)
    freq = normalize_freqs(counts, n_syms)
    cum = freq_to_cum(freq)
    lut = build_decode_lut(freq, cum) if build_lut else None
    return freq, cum, lut
