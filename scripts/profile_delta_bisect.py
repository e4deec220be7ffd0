"""Bisect the 840ms warm cost of _delta_seq: which sub-piece is slow?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from scalce_tpu.ops.bitops import pack_bases_u32
    from scalce_tpu.ops import core_match

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
        print(f"  {label:40s} " + " ".join(f"{t*1e3:8.1f}" for t in ts),
              flush=True)

    def best_of_4(codes_s):
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        row = jnp.arange(B, dtype=jnp.int32)
        valid = col < len0[:, None]
        best_match = jnp.zeros((B, L), jnp.bool_)
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
            best_match = jnp.where(better[:, None], m, best_match)
            best_count = jnp.where(better, cnt, best_count)
            best_shift = jnp.where(better, shift, best_shift)
            best_k = jnp.where(better, k - 1, best_k)
        return best_match, best_shift, best_k, valid

    @jax.jit
    def v1_loop_only(c):
        m, s, k, v = best_of_4(c)
        return m, s, k

    @jax.jit
    def v2_maskbits(c):
        m, s, k, v = best_of_4(c)
        bit_w = jnp.left_shift(jnp.uint8(1),
                               jnp.arange(8, dtype=jnp.uint8)[None, None, :])
        mask_bits = jnp.sum(m.reshape(B, L // 8, 8).astype(jnp.uint8) * bit_w,
                            axis=2, dtype=jnp.uint8)
        return mask_bits, s, k

    @jax.jit
    def v3_lits(c):
        m, s, k, valid = best_of_4(c)
        lit_mask = (~m) & valid
        order_idx = jnp.cumsum(lit_mask.reshape(-1).astype(jnp.int32)) - 1
        n_lits = order_idx[-1] + 1
        flat = jnp.where(lit_mask.reshape(-1), order_idx, B * L)
        lits = jnp.zeros(B * L, jnp.uint8).at[flat].set(
            c.reshape(-1), mode="drop")
        lit_packed = pack_bases_u32(lits.reshape(B * L // 16, 16), axis=1
                                    ).reshape(-1)
        return lit_packed, n_lits

    @jax.jit
    def v4_lits_nopack(c):
        m, s, k, valid = best_of_4(c)
        lit_mask = (~m) & valid
        order_idx = jnp.cumsum(lit_mask.reshape(-1).astype(jnp.int32)) - 1
        n_lits = order_idx[-1] + 1
        flat = jnp.where(lit_mask.reshape(-1), order_idx, B * L)
        lits = jnp.zeros(B * L, jnp.uint8).at[flat].set(
            c.reshape(-1), mode="drop")
        return lits, n_lits

    @jax.jit
    def v5_pack_only(c):
        return pack_bases_u32(c.reshape(B * L // 16, 16), axis=1)

    timeit("v1 best-of-4 loop (full outputs)", v1_loop_only)
    timeit("v2 + mask_bits pack", v2_maskbits)
    timeit("v3 + literal compact + 2bit pack", v3_lits)
    timeit("v4 literal compact (no pack)", v4_lits_nopack)
    timeit("v5 2bit pack alone", v5_pack_only)


if __name__ == "__main__":
    main()
