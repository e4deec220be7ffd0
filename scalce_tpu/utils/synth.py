"""Seeded synthetic FASTQ generation for tests and benchmarks.

The reference has no test fixtures (SURVEY.md §5); round-trip property
tests need realistic inputs.  Reads are sampled from a random "genome" so
they overlap — which is exactly the redundancy that core-based reordering
is supposed to expose (SURVEY.md §1 item 2).
"""

from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def synth_fastq(n_reads: int, read_len: int = 100, *, seed: int = 0,
                genome_len: int = 100_000, n_rate: float = 0.002,
                var_len: bool = False, qual_model: str = "illumina",
                name_style: str = "sra",
                mate: Optional[int] = None) -> bytes:
    """Generate a FASTQ payload as bytes.

    qual_model:
      "illumina" — position-dependent mean with noise (realistic entropy)
      "uniform"  — uniform random over the full range (incompressible)
      "const"    — constant 'I'
    """
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.int64)
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    if var_len:
        lens = rng.integers(max(20, read_len // 2), read_len + 1, size=n_reads)
    else:
        lens = np.full(n_reads, read_len, dtype=np.int64)

    out = io.BytesIO()
    pos_mean = 38.0 - 12.0 * (np.arange(read_len) / max(read_len - 1, 1)) ** 2
    for i in range(n_reads):
        L = int(lens[i])
        codes = genome[starts[i]: starts[i] + L]
        # sequencing errors
        err = rng.random(L) < 0.005
        codes = np.where(err, rng.integers(0, 4, size=L), codes)
        bases = _BASES[codes].copy()
        if n_rate > 0:
            nmask = rng.random(L) < n_rate
            bases[nmask] = ord("N")
        if qual_model == "illumina":
            q = np.clip(pos_mean[:L] + rng.normal(0, 3, size=L), 2, 40)
            qual = (q.astype(np.int64) + 33).astype(np.uint8)
        elif qual_model == "uniform":
            qual = rng.integers(33, 74, size=L).astype(np.uint8)
        else:
            qual = np.full(L, ord("I"), dtype=np.uint8)

        if name_style == "sra":
            name = f"SRR000001.{i + 1} {i + 1} length={L}".encode()
        elif name_style == "illumina":
            tile = 1101 + (i % 16)
            x, y = 1000 + i * 7 % 20000, 2000 + i * 13 % 20000
            m = mate if mate is not None else 1
            name = f"MACHINE1:42:FLOWCELL:1:{tile}:{x}:{y} {m}:N:0:ACGTACGT".encode()
        else:
            name = f"read{i}".encode()
        out.write(b"@" + name + b"\n" + bases.tobytes() + b"\n+\n"
                  + qual.tobytes() + b"\n")
    return out.getvalue()


def synth_pair(n_reads: int, read_len: int = 100, *, seed: int = 0,
               **kw) -> Tuple[bytes, bytes]:
    """A paired-end FASTQ pair with mate-consistent naming."""
    a = synth_fastq(n_reads, read_len, seed=seed, mate=1,
                    name_style="illumina", **kw)
    b = synth_fastq(n_reads, read_len, seed=seed + 1, mate=2,
                    name_style="illumina", **kw)
    return a, b
