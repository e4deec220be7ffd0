"""Experiment (VERDICT r3 #6): would minimizer-landmark bucketing buy
anything for LONG reads?

Current long-read mode (container v5) is identity-order, literal-only:
every base rides the order-2 literal rANS, no reordering, no
predecessor delta — zero "boosting".  This prototype measures what a
minimizer-bucketed order + anchored predecessor delta would save on
overlapping long-read synthetics:

  1. global-minimizer key per read: min of mix32(16-mer) over the read;
     reads sharing a minimizer go adjacent (sorted by hash, then by
     minimizer position DESCENDING so each read's anchor lands inside
     its predecessor)
  2. anchored delta: shift = minpos_prev - minpos_cur; copy mask
     against the aligned predecessor (exactly the short-read delta,
     u32 shift range)
  3. size model: literal stream = order-0 base entropy of surviving
     literals (the real coder is order-2 — this UNDERCOUNTS the win);
     mask stream = order-0 entropy of mask bytes; + shift/selector
     overhead

Caveat recorded with the results: the synthetics have SUBSTITUTION
errors only.  Real long-read platforms (ONT/PacBio CLR) are
indel-dominated, where a fixed-shift copy mask breaks alignment at the
first indel — the numbers here are an upper bound for sub-only data
(HiFi-like), not a promise for raw nanopore.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 16


def mix32(x: np.ndarray) -> np.ndarray:
    """The core matcher's avalanche hash (ops/core_match.py contract)."""
    x = x.astype(np.uint32)
    x ^= x >> 16
    x = (x * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 15
    x = (x * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 16
    return x


def entropy_bytes(arr: np.ndarray, alphabet: int) -> float:
    c = np.bincount(arr.reshape(-1), minlength=alphabet).astype(np.float64)
    p = c[c > 0] / c.sum()
    return float(-(c[c > 0] * np.log2(p)).sum() / 8)


def main() -> None:
    rng = np.random.default_rng(7)
    genome_len = 1_000_000
    L = int(os.environ.get("EXP_L", 10_000))
    n_reads = int(os.environ.get("EXP_READS", 2000))     # ~20x coverage
    err = float(os.environ.get("EXP_ERR", 0.005))
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - L, n_reads)
    codes = genome[starts[:, None] + np.arange(L)[None, :]]
    e = rng.random((n_reads, L)) < err
    codes = np.where(e, rng.integers(0, 4, (n_reads, L), dtype=np.uint8),
                     codes).astype(np.uint8)

    # --- baseline: literal-only order-0 entropy (order-2 on random
    # genomes is the same: contexts are iid) + 2-bit floor
    base_bytes = min(entropy_bytes(codes, 4), codes.size / 4)

    # --- minimizer key per read (vectorized rolling 2-bit k-mers)
    t0 = time.monotonic()
    km = np.zeros((n_reads, L - K + 1), np.uint32)
    acc = np.zeros((n_reads,), np.uint32)
    # rolling pack: kmer[:, j] = codes[:, j:j+K] as 2K bits
    w = codes.astype(np.uint32)
    kmer = np.zeros((n_reads, L - K + 1), np.uint32)
    v = np.zeros(n_reads, np.uint32)
    for j in range(K):
        v = ((v << 2) | w[:, j]) & np.uint32((1 << (2 * K)) - 1)
    kmer[:, 0] = v
    mask = np.uint32((1 << (2 * K)) - 1)
    for j in range(1, L - K + 1):
        v = ((v << 2) | w[:, j + K - 1]) & mask
        kmer[:, j] = v
    h = mix32(kmer)
    minpos = h.argmin(axis=1)
    minhash = h[np.arange(n_reads), minpos]
    t_key = time.monotonic() - t0

    # --- order: (minhash, -minpos) so predecessors contain the anchor
    order = np.lexsort((-minpos, minhash))
    codes_s = codes[order]
    mh_s = minhash[order]
    mp_s = minpos[order]

    # --- anchored delta vs immediate predecessor in the same bucket
    prev = np.roll(codes_s, 1, axis=0)
    same = np.zeros(n_reads, bool)
    same[1:] = mh_s[1:] == mh_s[:-1]
    shift = np.where(same, np.roll(mp_s, 1) - mp_s, 0)
    col = np.arange(L)[None, :]
    pidx = col + shift[:, None]
    inb = (pidx >= 0) & (pidx < L)
    aligned = np.take_along_axis(prev, np.clip(pidx, 0, L - 1), axis=1)
    match = same[:, None] & inb & (aligned == codes_s)

    n_match = int(match.sum())
    lits = codes_s[~match]
    lit_bytes = min(entropy_bytes(lits, 4), lits.size / 4)
    mask_bytes_raw = match.reshape(n_reads, -1, 8)
    mask_packed = (mask_bytes_raw.astype(np.uint8)
                   << np.arange(8, dtype=np.uint8)).sum(axis=2,
                                                        dtype=np.uint8)
    mask_bytes = entropy_bytes(mask_packed, 256)
    overhead = n_reads * (4 + 1)          # u32 shift + flags per read
    delta_bytes = lit_bytes + mask_bytes + overhead

    cov = n_reads * L / genome_len
    print(f"reads={n_reads} L={L} cov={cov:.0f}x err={err}")
    print(f"minimizer keys: {t_key:.2f}s; bucketed reads "
          f"(same-minimizer pred): {int(same.sum())}/{n_reads} "
          f"({100*same.mean():.0f}%); matched cells "
          f"{100*n_match/codes.size:.1f}%")
    print(f"baseline literal-only: {base_bytes/1e6:.3f} MB")
    print(f"minimizer+delta:       {delta_bytes/1e6:.3f} MB "
          f"(lit {lit_bytes/1e6:.3f} + mask {mask_bytes/1e6:.3f} + "
          f"ovh {overhead/1e6:.3f})")
    print(f"ratio improvement: {base_bytes/delta_bytes:.2f}x on the seq "
          f"stream")


if __name__ == "__main__":
    main()
