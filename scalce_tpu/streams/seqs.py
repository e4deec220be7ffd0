"""Sequence stream: device 2-bit packing + generic byte backend.

The reference writes reordered sequences to ``.scalcer`` through its
gz/bz/no buffered-file backend [REF: scalce compress.c flush →
buffio — UNVERIFIED; SURVEY.md §2 "Sequence stream writer"].  Here the
reordered base codes are packed 4-per-byte (16 per u32 word) on device
(``ops.bitops.pack_bases_u32`` inside the encode pipeline jit), and the
packed words are deflated on host.  Reordering is what makes the
deflate effective: overlapping reads sit next to each other, so LZ
matches hit inside a small window — the whole point of SCALCE
(SURVEY.md §1 item 2).

Non-ACGT bases travel as an exception side-channel (position, byte) in
the REORDERED frame so the decoder can splat them back after unpacking.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from scalce_tpu import container


def payload(packed: np.ndarray, lengths: np.ndarray, n_reads: int,
            exc_pos: np.ndarray, exc_byte: np.ndarray,
            perm: np.ndarray, level: int = 6) -> bytes:
    """Assemble the per-block ``.scalcer`` payload.

    packed: uint32 ``[B, W]`` device-packed codes (only first n_reads
    rows are stored).  exc_pos/exc_byte: reordered-frame exceptions.
    perm: the block's sort permutation (reordered row i came from
    original row perm[i]).  Storing it lets name columns stay in
    original order (where numeric deltas are tiny) and enables
    order-restoring decompression — which the reference cannot do.
    """
    arrays = {
        "n_reads": np.asarray([n_reads], np.int64),
        "packed": np.ascontiguousarray(packed[:n_reads]),
        "lengths": lengths[:n_reads].astype(np.uint16),
        "exc_pos": exc_pos.astype(np.uint64),
        "exc_byte": exc_byte.astype(np.uint8),
        "perm": perm[:n_reads].astype(np.uint32),
    }
    return container.pack_arrays(
        arrays, deflate=("packed", "lengths", "exc_pos", "exc_byte", "perm"),
        level=level)


def parse(blob: bytes, B: int) -> Tuple[np.ndarray, np.ndarray, int,
                                        np.ndarray, np.ndarray, np.ndarray]:
    """Payload -> (packed u32 [B, W] zero-padded, lengths i32 [B],
    n_reads, exc_pos, exc_byte, perm)."""
    a = container.unpack_arrays(blob)
    n_reads = int(a["n_reads"][0])
    stored = a["packed"]
    W = stored.shape[1]
    packed = np.zeros((B, W), np.uint32)
    packed[:n_reads] = stored
    lengths = np.zeros(B, np.int32)
    lengths[:n_reads] = a["lengths"].astype(np.int32)
    return packed, lengths, n_reads, a["exc_pos"].astype(np.int64), \
        a["exc_byte"], a["perm"].astype(np.int64)
