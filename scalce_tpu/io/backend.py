"""Generic byte-stream backends (the reference's gz/bz/no modes).

The reference routes every output byte through a ``buffered_file`` vtable
selecting plain, zlib, or bzip2 files [REF: scalce buffio.c — UNVERIFIED;
SURVEY.md §2 L0].  Here the backends compress already-assembled in-memory
segments; ``container.pack_arrays`` calls these per array, and the
pipelined driver's worker pool provides the concurrency the reference
got from ``-T`` pthreads (zlib/bz2 release the GIL).
"""

from __future__ import annotations

import bz2
import zlib

try:
    import zstandard as _zstd
    _ZSTD_OK = True
except ImportError:  # pragma: no cover - zstd is present in dev/CI images
    _zstd = None
    _ZSTD_OK = False

BACKENDS = ("zstd", "gz", "bz", "no") if _ZSTD_OK else ("gz", "bz", "no")

#: best available payload backend — "zstd" where the package exists,
#: zlib otherwise (Config and internal cost probes both resolve to this
#: so a zstd-less host degrades instead of crashing)
DEFAULT_BACKEND = "zstd" if _ZSTD_OK else "gz"


def compress_bytes(data: bytes, backend: str, level: int = 6) -> bytes:
    if backend == "zstd":
        if _zstd is None:
            raise RuntimeError(
                "zstd backend requested but the zstandard package is "
                "not installed on this host")
        # zstd reaches zlib-6 ratios at ~10-30x less CPU on this
        # pipeline's payloads (measured); levels map 1:1 to zstd levels
        return _zstd.ZstdCompressor(level=level).compress(data)
    if backend == "gz":
        return zlib.compress(data, level)
    if backend == "bz":
        return bz2.compress(data, min(max(level, 1), 9))
    if backend == "no":
        return data
    raise ValueError(f"unknown backend {backend!r}")


def decompress_bytes(data: bytes, backend: str) -> bytes:
    if backend == "zstd":
        if _zstd is None:
            raise RuntimeError(
                "this file uses the zstd backend but the zstandard "
                "package is not installed on this host")
        return _zstd.ZstdDecompressor().decompress(data)
    if backend == "gz":
        return zlib.decompress(data)
    if backend == "bz":
        return bz2.decompress(data)
    if backend == "no":
        return data
    raise ValueError(f"unknown backend {backend!r}")
