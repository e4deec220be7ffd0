"""Microbenchmarks of the primitive ops the encode pipeline is built
from, on the current device — measures whether per-row-shift gathers can
be replaced by log-shift roll composites, plus scatter/D2H costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, L = 1 << 17, 128
    W = 2 * L
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    shifts = jnp.asarray(rng.integers(0, L, B, dtype=np.int32))
    grid2 = jnp.asarray(rng.integers(0, 4, (B, W), dtype=np.uint8))
    perm = jnp.asarray(rng.permutation(B).astype(np.int32))
    idx_flat = jnp.asarray(rng.integers(0, 201 * 94, B * L, dtype=np.int32))
    words_u16 = jnp.asarray(rng.integers(0, 65535, (1 << 22,),
                                         dtype=np.uint16))

    def timeit(label, fn, *a, reps=3):
        t0 = time.monotonic()
        r = jax.block_until_ready(fn(*a))
        tc = time.monotonic() - t0
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            r = jax.block_until_ready(fn(*a))
            ts.append(time.monotonic() - t0)
        print(f"  {label:44s} {min(ts)*1e3:9.1f} ms  (compile {tc:.1f}s)",
              flush=True)
        return r

    @jax.jit
    def gather_shift(c, s):
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        pidx = jnp.clip(col + s[:, None], 0, L - 1)
        return jnp.take_along_axis(c, pidx, axis=1)
    timeit("take_along_axis [B,128] row-shift", gather_shift, codes, shifts)

    @jax.jit
    def logshift(g, s):
        # shift row i right by s[i] via log2(W) static rolls
        out = g
        for j in range(8):
            bit = ((s >> j) & 1).astype(jnp.bool_)[:, None]
            out = jnp.where(bit, jnp.roll(out, 1 << j, axis=1), out)
        return out
    timeit("log-shift composite [B,256] (8 roll+sel)", logshift, grid2,
           shifts)

    @jax.jit
    def one_roll(g):
        return jnp.roll(g, 16, axis=1)
    timeit("single static roll [B,256] axis1", one_roll, grid2)

    @jax.jit
    def roll0(g):
        return jnp.roll(g, 1, axis=0)
    timeit("single static roll [B,256] axis0", roll0, grid2)

    @jax.jit
    def sel(g, h):
        return jnp.where(g > h, g, h)
    timeit("elementwise where [B,256]", sel, grid2, jnp.roll(grid2, 1, 0))

    @jax.jit
    def row_gather(c, p):
        return c[p]
    timeit("row gather [B,128] by perm (axis0)", row_gather, codes, perm)

    @jax.jit
    def hist_scatter(i):
        return jnp.zeros(201 * 94, jnp.int32).at[i].add(1)
    timeit("scatter-add 16.7M -> 19k bins", hist_scatter, idx_flat)

    @jax.jit
    def compact_scatter(c, i):
        flat = c.reshape(-1)
        return jnp.zeros(B * L, jnp.uint8).at[i].set(flat, mode="drop")
    timeit("scatter-set 16.7M -> 16.7M", compact_scatter, codes,
           idx_flat * 7 % (B * L))

    @jax.jit
    def big_cumsum(c):
        return jnp.cumsum(c.reshape(-1).astype(jnp.int32))
    timeit("cumsum 16.7M i32", big_cumsum, codes)

    @jax.jit
    def sort4(k0, k1, k2, k3):
        return jax.lax.sort((k0, k1, k2, k3), dimension=0, num_keys=3,
                            is_stable=True)
    k0 = jnp.asarray(rng.integers(0, 2**31, B, np.int32).astype(np.uint32))
    timeit("lax.sort 4-op [131072]", sort4, k0, k0 ^ 1, k0 ^ 2,
           jnp.arange(B, dtype=jnp.uint32))

    # D2H bandwidth by dtype
    for label, arr in [
        ("D2H 8MB u8", jnp.asarray(rng.integers(0, 255, 8 << 20, np.uint8))),
        ("D2H 8MB u16", words_u16[: 4 << 20].reshape(2048, 2048)),
        ("D2H 8MB u32", jnp.asarray(rng.integers(0, 2**31, 2 << 20,
                                                 np.int32))),
    ]:
        jax.block_until_ready(arr)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            np.asarray(arr)
            ts.append(time.monotonic() - t0)
        mb = arr.size * arr.dtype.itemsize / 1e6
        print(f"  {label:44s} {min(ts)*1e3:9.1f} ms  "
              f"({mb/min(ts):.0f} MB/s)", flush=True)

    # H2D for comparison
    host_u8 = rng.integers(0, 255, 16 << 20, np.uint8)
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        jax.block_until_ready(jax.device_put(host_u8))
        ts.append(time.monotonic() - t0)
    print(f"  {'H2D 16MB u8':44s} {min(ts)*1e3:9.1f} ms  "
          f"({16.8/min(ts):.0f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
