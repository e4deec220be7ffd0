"""Sequence stream: aligned-predecessor delta coding.

The reference writes reordered sequences raw and lets the gz/bz backend
find cross-read redundancy [REF: scalce compress.c flush → buffio —
UNVERIFIED; SURVEY.md §2 "Sequence stream writer"].  scalce_tpu computes
that redundancy explicitly on device (``pipeline.encode._delta_seq``):
after the core sort, each read stores a per-position "copy from the
aligned predecessor" bitmask plus the literal bases that differ.  On the
evaluation workloads this beats deflate-over-raw by ~30% on the
sequence stream while shrinking the device→host transfer ~4x.

Payload layout per block:
  mask_bits  u8  [n, L/8]   copy bits (LSB-first within each byte)
  shifts     i16 [n]        predecessor column shift (0 = no predecessor)
  lit_packed u32 [ceil(nl/16)] non-matching bases, 2-bit packed
  lengths / exceptions / permutation as before

Decode reconstructs rows sequentially (row i needs row i-1) — a memcpy
-class loop done in native C (``native.reconstruct_delta``) with a
NumPy row-loop fallback.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from scalce_tpu import container

try:
    from scalce_tpu import native as _native
    _NATIVE = _native.AVAILABLE and hasattr(_native, "reconstruct_delta")
except Exception:  # pragma: no cover
    _native = None
    _NATIVE = False


def unpack2bit_np(words: np.ndarray, n: int) -> np.ndarray:
    """uint32 words -> first n 2-bit codes (big-endian in-word)."""
    shifts = (2 * np.arange(15, -1, -1)).astype(np.uint32)
    codes = ((words[:, None] >> shifts) & 3).astype(np.uint8).reshape(-1)
    return codes[:n]


def payload(delta: Dict[str, np.ndarray], lengths: np.ndarray, n_reads: int,
            exc_pos: np.ndarray, exc_byte: np.ndarray,
            perm: np.ndarray, level: int = 6, backend: str = "gz") -> bytes:
    arrays = {
        "n_reads": np.asarray([n_reads], np.int64),
        "mask_bits": np.ascontiguousarray(delta["mask_bits"][:n_reads]),
        "shifts": np.ascontiguousarray(delta["shifts"][:n_reads]),
        "lit_packed": delta["lit_packed"],
        "n_lits": np.asarray([int(delta["n_lits"])], np.int64),
        "pred_k": np.ascontiguousarray(delta["pred_k"][:n_reads]),
        "rc_bits": delta["rc_bits"][: (n_reads + 7) // 8],
        "lengths": lengths[:n_reads].astype(np.uint16),
        "exc_pos": exc_pos.astype(np.uint64),
        "exc_byte": exc_byte.astype(np.uint8),
        "perm": perm[:n_reads].astype(np.uint32),
    }
    # per-array codec levels (measured on the bench workload):
    #   lit_packed is entropy-coded 2-bit data — incompressible, stored
    #   raw (attempting it costs ~25 ms/block for nothing)
    #   mask_bits is the big compressible one — pay a higher level there
    #   perm is a near-random permutation — low level loses nothing
    return container.pack_arrays(
        arrays, deflate={"mask_bits": 9, "shifts": 6, "pred_k": 6,
                         "rc_bits": 6, "lengths": 3, "exc_pos": 3,
                         "exc_byte": 3, "perm": 3},
        level=level, backend=backend)


def parse(blob: bytes, B: int, L: int) -> Tuple[np.ndarray, np.ndarray, int,
                                                np.ndarray, np.ndarray,
                                                np.ndarray, np.ndarray]:
    """Payload -> (codes u8 [B, L] reconstructed (canonical orientation),
    lengths i32 [B], n_reads, exc_pos, exc_byte, perm, rc bool [B])."""
    a = container.unpack_arrays(blob)
    n = int(a["n_reads"][0])
    n_lits = int(a["n_lits"][0])
    _validate(a, n, B, L, n_lits)
    lits = unpack2bit_np(a["lit_packed"].astype(np.uint32), n_lits)
    lengths = np.zeros(B, np.int32)
    lengths[:n] = a["lengths"].astype(np.int32)
    codes = np.zeros((B, L), np.uint8)
    _reconstruct(a["mask_bits"], a["shifts"].astype(np.int16),
                 a["pred_k"].astype(np.uint8), lits,
                 lengths[:n].astype(np.int64), L, codes)
    rc = np.zeros(B, bool)
    rc[:n] = np.unpackbits(a["rc_bits"], bitorder="little")[:n].astype(bool)
    return codes, lengths, n, a["exc_pos"].astype(np.int64), \
        a["exc_byte"], a["perm"].astype(np.int64), rc


def _validate(a, n: int, B: int, L: int, n_lits: int) -> None:
    """Bounds-check container-supplied fields BEFORE they reach the
    native reconstruction loop — a corrupt/truncated/malicious block
    must raise, not write out of bounds."""
    if not (0 <= n <= B):
        raise ValueError("corrupt .scalcer block: n_reads out of range")
    lens = a["lengths"].astype(np.int64)
    shifts = a["shifts"].astype(np.int64)
    pred_k = a["pred_k"].astype(np.int64)
    if lens.shape[0] != n or shifts.shape[0] != n or pred_k.shape[0] != n:
        raise ValueError("corrupt .scalcer block: field length mismatch")
    # mask_bits must be exactly [n, L/8]: a smaller array would broadcast
    # through the checks below but stride out of bounds in the native
    # reconstruction loop
    if a["mask_bits"].ndim != 2 or a["mask_bits"].shape != (n, L // 8):
        raise ValueError("corrupt .scalcer block: mask_bits shape mismatch")
    # exceptions: positions must index inside the block's base grid and
    # pair 1:1 with replacement bytes (u64 >= 2^63 would go negative in
    # int64 downstream and index from the end)
    exc_pos = a["exc_pos"]
    if exc_pos.shape[0] != a["exc_byte"].shape[0]:
        raise ValueError("corrupt .scalcer block: exception arrays disagree")
    if exc_pos.size and int(exc_pos.max()) >= n * L:
        raise ValueError("corrupt .scalcer block: exception position out "
                         "of range")
    if lens.size and (lens.max() > L or lens.min() < 0):
        raise ValueError("corrupt .scalcer block: read length > max")
    bits = np.unpackbits(a["mask_bits"], axis=1, bitorder="little")[:, :L]
    rows = np.arange(n)
    # a row that copies anything must have its predecessor INSIDE the
    # block: source row = i - 1 - pred_k >= 0  <=>  pred_k < i
    has_mask = bits.any(axis=1) if n else np.zeros(0, bool)
    if n and ((pred_k < 0) | ((pred_k >= rows) & has_mask)).any():
        raise ValueError("corrupt .scalcer block: predecessor before "
                         "block start")
    # every masked copy must read in-bounds of the predecessor row:
    # 0 <= col + shift < L for all cols < len is over-strict (mask may
    # not cover all cols), but |shift| < L is the safe envelope the
    # native loop needs together with the mask bound below
    if n and (np.abs(shifts) >= L).any():
        raise ValueError("corrupt .scalcer block: shift out of range")
    col = np.arange(L)[None, :]
    if n and (bits & (col >= lens[:, None])).any():
        raise ValueError("corrupt .scalcer block: mask past read length")
    # masked source columns must be in-bounds
    if n:
        src = col + shifts[:, None]
        if (bits & ((src < 0) | (src >= L))).any():
            raise ValueError("corrupt .scalcer block: copy source out of "
                             "bounds")
    need = int(lens.sum() - bits.sum())
    if n_lits != need or n_lits < 0:
        raise ValueError("corrupt .scalcer block: literal count mismatch")
    if a["lit_packed"].shape[0] < (n_lits + 15) // 16:
        raise ValueError("corrupt .scalcer block: literal stream short")
    perm = a["perm"].astype(np.int64)
    if perm.shape[0] != n or (n and (perm.min() < 0 or perm.max() >= n)):
        raise ValueError("corrupt .scalcer block: bad permutation")
    if a["rc_bits"].shape[0] < (n + 7) // 8:
        raise ValueError("corrupt .scalcer block: rc bits short")


def _reconstruct(mask_bits: np.ndarray, shifts: np.ndarray,
                 pred_k: np.ndarray, lits: np.ndarray, lens: np.ndarray,
                 L: int, out: np.ndarray) -> None:
    n = len(lens)
    if n == 0:
        return
    if _NATIVE:
        _native.reconstruct_delta(np.ascontiguousarray(mask_bits),
                                  np.ascontiguousarray(shifts),
                                  np.ascontiguousarray(pred_k),
                                  np.ascontiguousarray(lits), lens, L, out)
        return
    # NumPy fallback: vectorized within each row, sequential across rows
    bits = np.unpackbits(mask_bits, axis=1, bitorder="little")[:, :L]
    lit_off = 0
    for i in range(n):
        l = int(lens[i])
        m = bits[i, :l].astype(bool)
        k = int(m.sum())
        row = out[i]
        if k:
            src_cols = np.flatnonzero(m) + int(shifts[i])
            row[np.flatnonzero(m)] = out[i - 1 - int(pred_k[i]), src_cols]
        nm = np.flatnonzero(~m)
        row[nm] = lits[lit_off:lit_off + l - k]
        lit_off += l - k
