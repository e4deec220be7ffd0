"""Cache-proof re-run of the primitive microbenchmarks: inputs vary per
rep (derived from a counter on device) so no result memoization can
fake the timing; every rep is printed individually."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    B, L = 1 << 17, 128
    rng = np.random.default_rng(0)
    codes0 = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    shifts0 = jnp.asarray(rng.integers(0, L, B, dtype=np.int32))

    @jax.jit
    def vary(c, s, i):
        return (c ^ (i & 1).astype(jnp.uint8), (s + i) % L)

    def timeit(label, fn, reps=4):
        ts = []
        for i in range(reps):
            c, s = vary(codes0, shifts0, jnp.int32(i))
            jax.block_until_ready((c, s))
            t0 = time.monotonic()
            r = jax.block_until_ready(fn(c, s))
            ts.append(time.monotonic() - t0)
        print(f"  {label:44s} " + " ".join(f"{t*1e3:8.1f}" for t in ts),
              flush=True)
        return r

    @jax.jit
    def gather_shift(c, s):
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        pidx = jnp.clip(col + s[:, None], 0, L - 1)
        return jnp.take_along_axis(c, pidx, axis=1)
    timeit("take_along_axis [B,128] row-shift", gather_shift)

    @jax.jit
    def gather_shift_sum(c, s):
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        pidx = jnp.clip(col + s[:, None], 0, L - 1)
        g = jnp.take_along_axis(c, pidx, axis=1)
        return jnp.sum(g == c, axis=1, dtype=jnp.int32)
    timeit("  + compare/sum (forces materialize)", gather_shift_sum)

    @jax.jit
    def four_gathers(c, s):
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        acc = jnp.zeros((B,), jnp.int32)
        for k in range(1, 5):
            pc = jnp.roll(c, k, axis=0)
            pidx = jnp.clip(col + ((s + k) % L)[:, None], 0, L - 1)
            g = jnp.take_along_axis(pc, pidx, axis=1)
            acc = acc + jnp.sum(g == c, axis=1, dtype=jnp.int32)
        return acc
    timeit("4x roll+gather+cmp (delta-like)", four_gathers)

    @jax.jit
    def logshift_sum(c, s):
        W2 = 2 * L
        g = jnp.pad(c, ((0, 0), (0, L)))
        for j in range(8):
            bit = ((s >> j) & 1).astype(jnp.bool_)[:, None]
            g = jnp.where(bit, jnp.roll(g, 1 << j, axis=1), g)
        acc = jnp.zeros((B,), jnp.int32)
        for k in range(1, 5):
            acc = acc + jnp.sum(jnp.roll(g, k, axis=0) == g, axis=1,
                                dtype=jnp.int32)
        return acc
    timeit("logshift[B,256] + 4x roll+cmp", logshift_sum)

    # the real delta function for reference
    from scalce_tpu.pipeline.encode import _delta_seq

    @jax.jit
    def delta_like(c, s):
        ck = s.astype(jnp.uint32) % 7      # fake buckets
        cp = (s % 32).astype(jnp.int32)
        lens = jnp.full((B,), L, jnp.int32)
        d = _delta_seq(c, lens, ck, cp, jnp.int32(B))
        return d["n_lits"], d["mask_bits"][0, 0]
    timeit("_delta_seq (current impl)", delta_like)

    # D2H of a freshly computed device array
    @jax.jit
    def compute_big(c, s):
        return (c.astype(jnp.uint16) * 3 + s[:, None].astype(jnp.uint16))
    for i in range(3):
        c, s = vary(codes0, shifts0, jnp.int32(10 + i))
        out = jax.block_until_ready(compute_big(c, s))
        t0 = time.monotonic()
        h = np.asarray(out)
        dt = time.monotonic() - t0
        print(f"  D2H fresh [B,128] u16 ({h.nbytes/1e6:.1f}MB)      "
              f"{dt*1e3:8.1f} ms ({h.nbytes/1e6/dt:.0f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
