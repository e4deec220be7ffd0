"""Experiment (VERDICT r4 #5): indel-robust long-read delta.

EXPERIMENTS §14's own caveat: the v6 single-anchor fixed-shift delta is
a well-tested no-op on indel-dominated reads (ONT/PacBio CLR) — the
copy register breaks at the first indel after the anchor and the
50%-density gate degrades every row to literals.  This prototype
measures whether a MULTI-ANCHOR form — segment each read, per-segment
minimizer anchors matched against the predecessor's anchors,
per-segment shifts — recovers a win at realistic indel rates, vs:

  A  literal floor (v5 behavior: min(order-0 entropy, 2 bits/base))
  B  v6 single global anchor + 50% row gate (shipped)
  C  multi-anchor: NSEG segment minimizers per read; each segment
     anchors on any hash shared with the predecessor's segment set
     (fallback: nearest matched segment's shift); per-SEGMENT 50% gate

Size model mirrors the real coders: literals at order-0 entropy capped
at 2 bits (the real order-2 coder only does better), the mask stream at
ORDER-1 conditional byte entropy (the shipped mask_mode=1 model —
EXPERIMENTS §5), plus per-read shift/flag overhead (v6: one i32; C:
NSEG zig-zag i32 planes, which deflate far below 4 B each, counted
at raw cost anyway = conservative for C).

Read generation walks the genome with independent per-base sub / ins /
del events, so reads are ragged and alignment drifts — the regime v6
cannot handle by construction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 16
NO_KEY = np.uint32(0xFFFFFFFF)


def mix32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x ^= x >> 16
    x = (x * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 15
    x = (x * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 16
    return x


def entropy_bytes(arr: np.ndarray, alphabet: int) -> float:
    c = np.bincount(arr.reshape(-1), minlength=alphabet).astype(np.float64)
    if c.sum() == 0:
        return 0.0
    p = c[c > 0] / c.sum()
    return float(-(c[c > 0] * np.log2(p)).sum() / 8)


def mask_entropy_order1(mask_rows, lens) -> float:
    """Order-1 conditional entropy of the packed mask byte stream
    (ctx = previous byte), the shipped mask_mode=1 model."""
    bs = []
    for m, ln in zip(mask_rows, lens):
        mb = np.packbits(m[:ln], bitorder="little")
        bs.append(mb)
    stream = np.concatenate(bs) if bs else np.zeros(0, np.uint8)
    if stream.size < 2:
        return float(stream.size)
    prev = np.concatenate(([0], stream[:-1])).astype(np.int64)
    idx = prev * 256 + stream
    c = np.bincount(idx, minlength=65536).astype(np.float64)
    cp = np.bincount(prev, minlength=256).astype(np.float64)
    nz = c > 0
    bits = -(c[nz] * np.log2(c[nz] / cp.repeat(256)[nz])).sum()
    return float(bits / 8)


def gen_reads(rng, genome, n_reads, L_target, sub, ins, dele):
    """Ragged reads with independent sub/ins/del per emitted base."""
    reads = []
    gl = len(genome)
    span = int(L_target * (1 + dele + 0.05))
    starts = rng.integers(0, gl - span, n_reads)
    for s in starts:
        src = genome[s: s + span]
        # event per SOURCE base: 0 copy, 1 sub, 2 del; insert after
        ev = rng.random(span)
        subs = ev < sub
        dels = (ev >= sub) & (ev < sub + dele)
        base = np.where(subs, (src + rng.integers(1, 4, span)) % 4, src)
        keep = ~dels
        out = base[keep]
        ins_mask = rng.random(out.size) < ins
        if ins_mask.any():
            n_ins = int(ins_mask.sum())
            ins_vals = rng.integers(0, 4, n_ins)
            pos = np.flatnonzero(ins_mask)
            out = np.insert(out, pos, ins_vals)
        reads.append(out[:L_target].astype(np.uint8))
    lens = np.array([r.size for r in reads], np.int64)
    L = int(lens.max())
    codes = np.zeros((n_reads, L), np.uint8)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
    return codes, lens


def rolling_kmers(codes, lens):
    n, L = codes.shape
    w = codes.astype(np.uint32)
    kmer = np.zeros((n, L - K + 1), np.uint32)
    mask = np.uint32((1 << (2 * K)) - 1)
    v = np.zeros(n, np.uint32)
    for j in range(K):
        v = ((v << 2) | w[:, j]) & mask
    kmer[:, 0] = v
    for j in range(1, L - K + 1):
        v = ((v << 2) | w[:, j + K - 1]) & mask
        kmer[:, j] = v
    h = mix32(kmer)
    pos = np.arange(L - K + 1)[None, :]
    return np.where(pos + K <= lens[:, None], h, NO_KEY)


def seg_minimizers(h, lens, nseg):
    """Per-read segment minimizers: (hash, pos) per equal span of len."""
    n, P = h.shape
    sh = np.full((n, nseg), NO_KEY, np.uint32)
    sp = np.zeros((n, nseg), np.int64)
    pos = np.arange(P)[None, :]
    for s in range(nseg):
        lo = (lens * s) // nseg
        hi = (lens * (s + 1)) // nseg
        hm = np.where((pos >= lo[:, None]) & (pos < hi[:, None]),
                      h, NO_KEY)
        p = hm.argmin(axis=1)
        sh[:, s] = hm[np.arange(n), p]
        sp[:, s] = p
    return sh, sp


def run(rng, cov, L_target, sub, ins, dele, nseg):
    genome_len = 1_000_000
    n_reads = int(cov * genome_len / L_target)
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)
    codes, lens = gen_reads(rng, genome, n_reads, L_target, sub, ins, dele)
    n, L = codes.shape
    total = int(lens.sum())
    valid = np.arange(L)[None, :] < lens[:, None]

    base_bytes = min(entropy_bytes(codes[valid], 4), total / 4)

    h = rolling_kmers(codes, lens)
    gp = h.argmin(axis=1)
    gh = h[np.arange(n), gp]
    order = np.lexsort((-gp, gh))
    cs, ls, hs, ps = codes[order], lens[order], gh[order], gp[order]
    hseg = h[order]
    valids = np.arange(L)[None, :] < ls[:, None]
    col = np.arange(L)[None, :]
    prev_rows = np.roll(cs, 1, axis=0)
    prev_len = np.roll(ls, 1)
    same = np.zeros(n, bool)
    same[1:] = (hs[1:] == hs[:-1]) & (hs[1:] != NO_KEY)

    def masked_size(match, shifts_per_read, gated_rows):
        lits = cs[(~match) & valids]
        lit_b = min(entropy_bytes(lits, 4), lits.size / 4)
        mask_b = mask_entropy_order1(list(match), list((ls + 7) // 8))
        ovh = n * 4 * shifts_per_read + n  # raw i32 shifts + flags
        return lit_b + mask_b + ovh, lit_b, mask_b

    # --- B: v6 single anchor + 50% row gate ---------------------------
    shift1 = np.where(same, np.roll(ps, 1) - ps, 0)
    pidx = col + shift1[:, None]
    inb = (pidx >= 0) & (pidx < prev_len[:, None])
    aligned = np.take_along_axis(prev_rows, np.clip(pidx, 0, L - 1), axis=1)
    m1 = same[:, None] & inb & (aligned == cs) & valids
    cnt = m1.sum(axis=1)
    keep = cnt * 2 >= ls
    m1 &= keep[:, None]
    v6_bytes, v6_lit, v6_mask = masked_size(m1, 1, keep)

    # --- C: multi-anchor segmented delta ------------------------------
    sh_cur, sp_cur = seg_minimizers(hseg, ls, nseg)
    sh_prev = np.roll(sh_cur, 1, axis=0)
    sp_prev = np.roll(sp_cur, 1, axis=0)
    # per cur segment: first prev segment with the same hash
    seg_shift = np.zeros((n, nseg), np.int64)
    seg_ok = np.zeros((n, nseg), bool)
    for a in range(nseg):
        for b in range(nseg):
            hit = (~seg_ok[:, a]) & same & \
                (sh_cur[:, a] == sh_prev[:, b]) & (sh_cur[:, a] != NO_KEY)
            seg_shift[hit, a] = sp_prev[hit, b] - sp_cur[hit, a]
            seg_ok[hit, a] = True
    # global anchor as an extra candidate for unmatched segments
    for a in range(nseg):
        miss = (~seg_ok[:, a]) & same
        seg_shift[miss, a] = shift1[miss]
        seg_ok[miss, a] = True
    # nearest matched segment inheritance is subsumed by the global
    # fallback here (the global anchor IS a matched anchor when same)
    # per-cell shift by segment of col
    seg_of = np.minimum((col * nseg) // np.maximum(ls[:, None], 1),
                        nseg - 1)
    cell_shift = np.take_along_axis(seg_shift, seg_of, axis=1)
    pidx = col + cell_shift
    inb = (pidx >= 0) & (pidx < prev_len[:, None])
    aligned = np.take_along_axis(prev_rows, np.clip(pidx, 0, L - 1), axis=1)
    mc = same[:, None] & inb & (aligned == cs) & valids
    # per-SEGMENT 50% gate
    for s in range(nseg):
        in_seg = seg_of == s
        seg_cells = (in_seg & valids).sum(axis=1)
        seg_match = (mc & in_seg).sum(axis=1)
        kill = seg_match * 2 < seg_cells
        mc &= ~(kill[:, None] & in_seg)
    mc_bytes, mc_lit, mc_mask = masked_size(mc, nseg, None)

    return dict(n=n, total=total, base=base_bytes,
                v6=v6_bytes, v6_pct=100 * m1.sum() / total,
                mc=mc_bytes, mc_pct=100 * mc.sum() / total)


def main() -> None:
    rng = np.random.default_rng(11)
    L = int(os.environ.get("EXP_L", 10_000))
    cov = float(os.environ.get("EXP_COV", 20))
    nseg = int(os.environ.get("EXP_NSEG", 8))
    print(f"L={L} cov={cov}x nseg={nseg} (sub=err/2, ins=del=err/4)")
    print(f"{'err':>6} {'base MB':>8} {'v6 MB':>8} {'v6 match':>9} "
          f"{'multi MB':>9} {'mc match':>9} {'v6 gain':>8} {'mc gain':>8}")
    for err in (0.002, 0.005, 0.01, 0.03, 0.1):
        t0 = time.monotonic()
        r = run(rng, cov, L, sub=err / 2, ins=err / 4, dele=err / 4,
                nseg=nseg)
        print(f"{err:>6} {r['base']/1e6:>8.3f} {r['v6']/1e6:>8.3f} "
              f"{r['v6_pct']:>8.1f}% {r['mc']/1e6:>9.3f} "
              f"{r['mc_pct']:>8.1f}% {r['base']/r['v6']:>7.2f}x "
              f"{r['base']/r['mc']:>7.2f}x   ({time.monotonic()-t0:.0f}s)")


if __name__ == "__main__":
    main()
