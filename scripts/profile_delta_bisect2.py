"""Bisect the CURRENT (reduction-only) _delta_seq: pass1 reductions,
pass2 match rebuild, literal compaction — timed as separate jits with
varied inputs on the axon device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from scalce_tpu.ops import core_match
    from scalce_tpu.ops.bitops import pack_bases_u32

    B, L = 1 << 17, 128
    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    ck0 = jnp.asarray((rng.integers(0, 9, B) * 2654435761 % (1 << 24))
                      .astype(np.uint32))
    cp0 = jnp.asarray(rng.integers(0, 32, B, dtype=np.int32))
    len0 = jnp.asarray(np.full(B, 100, np.int32))
    n_reads = jnp.int32(B)

    @jax.jit
    def vary(c, i):
        return c ^ (i & 1).astype(jnp.uint8)

    def timeit(label, fn, reps=3):
        ts = []
        for i in range(reps):
            c = jax.block_until_ready(vary(codes0, jnp.int32(i)))
            t0 = time.monotonic()
            jax.block_until_ready(fn(c))
            ts.append(time.monotonic() - t0)
        print(f"  {label:44s} " + " ".join(f"{t*1e3:8.1f}" for t in ts),
              flush=True)

    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    row = jnp.arange(B, dtype=jnp.int32)

    def pass1(codes_s):
        valid = col < len0[:, None]
        best_count = jnp.full(B, -1, jnp.int32)
        best_shift = jnp.zeros(B, jnp.int32)
        best_k = jnp.zeros(B, jnp.int32)
        for k in range(1, 5):
            prev_codes = jnp.roll(codes_s, k, axis=0)
            prev_len = jnp.roll(len0, k)
            same = (ck0 == jnp.roll(ck0, k)) & (ck0 != core_match.NO_CORE)
            same = same & (row >= k) & (row < n_reads)
            shift = jnp.where(same, (jnp.roll(cp0, k) - cp0).astype(
                jnp.int32), 0)
            pidx = col + shift[:, None]
            inb = (pidx >= 0) & (pidx < prev_len[:, None])
            aligned = jnp.take_along_axis(prev_codes,
                                          jnp.clip(pidx, 0, L - 1), axis=1)
            m = (same[:, None] & inb & (aligned == codes_s) & valid)
            cnt = jnp.where(same, jnp.sum(m, axis=1, dtype=jnp.int32), -1)
            better = cnt > best_count
            best_count = jnp.where(better, cnt, best_count)
            best_shift = jnp.where(better, shift, best_shift)
            best_k = jnp.where(better, k - 1, best_k)
        return best_count, best_shift, best_k

    @jax.jit
    def j_pass1(c):
        return pass1(c)

    def pass2(codes_s, best_count, best_shift, best_k):
        valid = col < len0[:, None]
        ok = best_count >= 0
        src_row = jnp.maximum(row - 1 - best_k, 0)
        prev_codes = codes_s[src_row]
        prev_len = len0[src_row]
        pidx = col + best_shift[:, None]
        inb = (pidx >= 0) & (pidx < prev_len[:, None])
        aligned = jnp.take_along_axis(prev_codes, jnp.clip(pidx, 0, L - 1),
                                      axis=1)
        return ok[:, None] & inb & (aligned == codes_s) & valid

    @jax.jit
    def j_pass12(c):
        bc, bs, bk = pass1(c)
        return pass2(c, bc, bs, bk)

    def compact(codes_s, match):
        valid = col < len0[:, None]
        lit_mask = (~match) & valid
        order_idx = jnp.cumsum(lit_mask.reshape(-1).astype(jnp.int32)) - 1
        n_lits = order_idx[-1] + 1
        flat = jnp.where(lit_mask.reshape(-1), order_idx, B * L)
        lits = jnp.zeros(B * L, jnp.uint8).at[flat].set(
            codes_s.reshape(-1), mode="drop")
        lit_packed = pack_bases_u32(lits.reshape(B * L // 16, 16), axis=1
                                    ).reshape(-1)
        bit_w = jnp.left_shift(jnp.uint8(1),
                               jnp.arange(8, dtype=jnp.uint8)[None, None, :])
        mask_bits = jnp.sum(
            match.reshape(B, L // 8, 8).astype(jnp.uint8) * bit_w, axis=2,
            dtype=jnp.uint8)
        return mask_bits, lit_packed, n_lits

    @jax.jit
    def j_full(c):
        bc, bs, bk = pass1(c)
        m = pass2(c, bc, bs, bk)
        return compact(c, m)

    timeit("P1 pass1 reductions only", j_pass1)
    timeit("P12 pass1+pass2 (match grid out)", j_pass12)
    timeit("P_full pass1+2+compaction", j_full)


if __name__ == "__main__":
    main()
