"""Generic byte-stream backends (the reference's gz/bz/no modes).

The reference routes every output byte through a ``buffered_file`` vtable
selecting plain, zlib, or bzip2 files [REF: scalce buffio.c — UNVERIFIED;
SURVEY.md §2 L0].  Here the backends compress already-assembled in-memory
segments, optionally fanned out over a host thread pool — the TPU-native
replacement for the reference's ``-T`` pthread chunking
(SURVEY.md §2 "Threading"): every segment is independent by construction.
"""

from __future__ import annotations

import bz2
import concurrent.futures as _fut
import zlib
from typing import List, Optional, Sequence

_BACKENDS = ("gz", "bz", "no")


def compress_bytes(data: bytes, backend: str, level: int = 6) -> bytes:
    if backend == "gz":
        return zlib.compress(data, level)
    if backend == "bz":
        return bz2.compress(data, min(max(level, 1), 9))
    if backend == "no":
        return data
    raise ValueError(f"unknown backend {backend!r}")


def decompress_bytes(data: bytes, backend: str) -> bytes:
    if backend == "gz":
        return zlib.decompress(data)
    if backend == "bz":
        return bz2.decompress(data)
    if backend == "no":
        return data
    raise ValueError(f"unknown backend {backend!r}")


class BackendPool:
    """Thread pool for parallel backend compression of independent segments.

    zlib/bz2 release the GIL, so host threads scale nearly linearly —
    the same win the reference gets from pthreads over chunks
    [REF: scalce compress.c -T path — UNVERIFIED; SURVEY.md §2].
    """

    def __init__(self, threads: int = 1):
        self._pool: Optional[_fut.ThreadPoolExecutor] = (
            _fut.ThreadPoolExecutor(max_workers=threads) if threads > 1 else None)

    def compress_many(self, segments: Sequence[bytes], backend: str,
                      level: int = 6) -> List[bytes]:
        if self._pool is None or len(segments) <= 1:
            return [compress_bytes(s, backend, level) for s in segments]
        return list(self._pool.map(
            lambda s: compress_bytes(s, backend, level), segments))

    def decompress_many(self, segments: Sequence[bytes],
                        backend: str) -> List[bytes]:
        if self._pool is None or len(segments) <= 1:
            return [decompress_bytes(s, backend) for s in segments]
        return list(self._pool.map(
            lambda s: decompress_bytes(s, backend), segments))

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=True)
