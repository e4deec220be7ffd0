"""Experiment (VERDICT r4 #6): quality-model headroom beyond the
shipped orders — position-ADAPTIVE context widths and a finer
pos x order-2 hybrid, measured as exact conditional entropy + the
analytic table cost (the same objective the order auto-trial uses).

Models (ctx count -> table rows):
  o1   pos8(col//16) x prev95                  (shipped order 1)
  o2   pos8 x prev25q x prev2-7                (shipped order 2)
  o3   pos32(col//4) x prev95                  (shipped order 3)
  oA   posA(adaptive 16) x prev95: boundaries at equal cumulative
       column-mean total variation — fine buckets where the quality
       profile bends, coarse where it is flat; +16 boundary bytes
  oH   pos32 x prev25q x prev2-7: order-3's fine position grid crossed
       with order-2's two-symbol history (the "cheap mix")

Profiles: the bench synthetic (position-trend iid noise), hiseq
(cycle-correlated anomalies, the order-3 win case), binned (modern
4-level Illumina), and an AR(1)-correlated profile (real-platform-like
serial correlation, EXPERIMENTS §2).

Verdict criteria: a model earns its keep only if it beats every
shipped order on SOME profile by >= 1% of the quality stream with no
loss elsewhere (the auto-trial would then pick it per block).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scalce_tpu.streams import qualities as Q

N_SYMS = Q.N_SYMS


def cost_bytes(sym, prevq, pb, nctx_pos, prev_levels, scale=1.0):
    """Exact data bits at normalized frequencies + analytic table cost
    for ctx = pb * prev_levels + prevq (+1 for the padding ctx)."""
    from scalce_tpu.models import entropy
    from scalce_tpu.ops import rans
    C = 1 + nctx_pos * prev_levels
    idx = (1 + pb.astype(np.int64) * prev_levels + prevq.astype(np.int64))
    counts = np.bincount(idx * N_SYMS + sym.astype(np.int64),
                         minlength=C * N_SYMS)
    freq, _ = entropy.host_normalize(counts, C, N_SYMS)
    cs = counts.reshape(C, N_SYMS)
    nz = (cs > 0) & (freq > 0)
    bits = (cs[nz] * (rans.PROB_BITS - np.log2(freq[nz]))).sum()
    return bits * scale / 8.0 + Q._table_cost_bytes(freq)


def grids(qual, lengths):
    B, L = qual.shape
    col = np.arange(L)[None, :]
    valid = col < lengths[:, None]
    sym = np.clip(qual.astype(np.int32) - Q.QUAL_OFFSET, 0, N_SYMS - 1)
    sym = np.where(valid, sym, 0)
    prev1 = np.zeros_like(sym)
    prev1[:, 1:] = sym[:, :-1]
    prev2 = np.zeros_like(sym)
    prev2[:, 2:] = sym[:, :-2]
    return sym[valid], prev1[valid], prev2[valid], \
        np.broadcast_to(col, sym.shape)[valid], valid


def adaptive_bounds(qual, lengths, nb=16):
    """Equal cumulative total-variation of the column mean."""
    col = np.arange(qual.shape[1])[None, :]
    valid = col < lengths[:, None]
    cm = np.where(valid, qual, 0).sum(0) / np.maximum(valid.sum(0), 1)
    d = np.abs(np.diff(cm, prepend=cm[0])) + 1e-6
    cd = np.cumsum(d)
    targets = cd[-1] * (np.arange(1, nb) / nb)
    bounds = np.searchsorted(cd, targets)
    return np.unique(np.concatenate([[0], bounds])).astype(np.int64)


def eval_profiles():
    from scalce_tpu.utils.synth import synth_fastq
    from scalce_tpu.io import fastq as fq
    import tempfile
    rng = np.random.default_rng(3)
    B, L = 65536, 100
    profiles = {}
    for name in ("illumina", "hiseq", "binned"):
        payload = synth_fastq(B, L, seed=17, qual_model=name)
        tmp = tempfile.mkdtemp()
        p = os.path.join(tmp, "x.fastq")
        open(p, "wb").write(payload)
        blk = next(fq.iter_blocks(p, B, 128))
        profiles[name] = (blk.qual[:B], blk.lengths[:B].astype(np.int64))
    # AR(1)-correlated profile (EXPERIMENTS §2)
    base = 38 - (np.arange(L) * 10 / L)
    ar = np.zeros((B, L))
    eps = rng.normal(0, 2.5, (B, L))
    for c in range(1, L):
        ar[:, c] = 0.8 * ar[:, c - 1] + eps[:, c]
    q = np.clip(base[None, :] + ar, 2, 41).astype(np.uint8) + 33
    qual = np.zeros((B, 128), np.uint8)
    qual[:, :L] = q
    profiles["ar1"] = (qual, np.full(B, L, np.int64))
    return profiles


def main():
    profiles = eval_profiles()
    print(f"{'profile':>9} {'o1 KB':>9} {'o2 KB':>9} {'o3 KB':>9} "
          f"{'oA KB':>9} {'oH KB':>9}  best")
    for name, (qual, lens) in profiles.items():
        sym, p1, p2, col, valid = grids(qual, lens)
        pb8 = np.minimum(col // 16, 7)
        pb32 = np.minimum(col // 4, 31)
        c0 = col == 0
        c1 = col == 1
        # prev indices exactly as the shipped models build them
        prev95 = np.where(c0, 94, np.minimum(p1, 93))
        pq = np.where(c0, 24, np.minimum(p1 >> 2, 23))
        p2q = np.where(c0 | c1, 6, np.minimum(p2 >> 4, 5))
        prev175 = pq * 7 + p2q
        res = {
            "o1": cost_bytes(sym, prev95, pb8, 8, 95),
            "o2": cost_bytes(sym, prev175, pb8, 8, 175),
            "o3": cost_bytes(sym, prev95, pb32, 32, 95),
        }
        bounds = adaptive_bounds(qual, lens, 16)
        pbA = np.searchsorted(bounds, col, side="right") - 1
        res["oA"] = cost_bytes(sym, prev95, pbA, len(bounds), 95) \
            + 16          # stored boundary bytes
        res["oH"] = cost_bytes(sym, prev175, pb32, 32, 175)
        best = min(res, key=res.get)
        ship = min(res["o1"], res["o2"], res["o3"])
        gain = (ship - res[best]) / ship * 100
        print(f"{name:>9} " + " ".join(f"{res[k]/1024:>9.1f}"
                                       for k in ("o1", "o2", "o3",
                                                 "oA", "oH"))
              + f"  {best} ({gain:+.2f}% vs shipped)")


if __name__ == "__main__":
    main()
