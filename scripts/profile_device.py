"""Sub-stage timing of the device encode graphs — finds which device op
dominates the 1.8s/block stage A+B cost observed on the axon emulator.

python scripts/profile_device.py            # axon TPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from scalce_tpu.config import Config
    from scalce_tpu.io import fastq
    from scalce_tpu.ops import core_match, reorder
    from scalce_tpu.ops.bitops import unpack_bases_u32
    from scalce_tpu.pipeline import encode as enc_mod
    from scalce_tpu.streams import qualities
    from scalce_tpu.utils.synth import synth_fastq
    import tempfile

    B = int(os.environ.get("PROF_BLOCK_READS", 1 << 17))
    cfg = Config(mode="compress", inputs=("x",), block_reads=B)

    tmp = tempfile.mkdtemp(prefix="prof_")
    path = os.path.join(tmp, "in.fastq")
    with open(path, "wb") as f:
        f.write(synth_fastq(B, 100, seed=42, genome_len=1_000_000,
                            n_rate=0.001))
    block = next(fastq.iter_blocks(path, cfg.block_reads, cfg.max_read_len))
    print("parsed", flush=True)

    seq_packed = jnp.asarray(enc_mod._host_pack(block.seq))
    qual = jnp.asarray(block.qual)
    lengths = jnp.asarray(block.lengths)
    n_reads = jnp.int32(block.n_reads)
    Bn, L = block.seq.shape
    exc_pos = jnp.asarray(enc_mod._pad_exc(block.exc_pos.astype(np.int32),
                                           Bn * L))
    rank_lut = jnp.zeros(1, jnp.uint32)
    k, seed = cfg.core_k, cfg.dict_seed

    def timeit(label, fn, *a, reps=3):
        # compile
        t0 = time.monotonic()
        r = jax.block_until_ready(fn(*a))
        tc = time.monotonic() - t0
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            r = jax.block_until_ready(fn(*a))
            ts.append(time.monotonic() - t0)
        print(f"  {label:34s} {min(ts)*1e3:9.1f} ms   (compile {tc:.1f}s)",
              flush=True)
        return r

    # full stages for reference
    devout_a = timeit("stage A (full)", partial(
        enc_mod._device_stage_a, k=k, seed=seed), seq_packed, qual, lengths,
        n_reads, exc_pos, rank_lut)
    perm, codes_s, qual_s, len_s, ck_s, cp_s, rc_s = devout_a
    timeit("stage B (full)", partial(
        enc_mod._device_stage_b, order=1), codes_s, qual_s, len_s, ck_s,
        cp_s, rc_s, n_reads, jnp.asarray(np.arange(256, dtype=np.uint8)))

    # --- stage A parts
    @jax.jit
    def j_unpack(sp):
        return unpack_bases_u32(sp, axis=1)
    codes = timeit("A1 unpack", j_unpack, seq_packed)

    @jax.jit
    def j_exc(ep):
        return jnp.zeros(Bn * L, jnp.bool_).at[ep].set(
            True, mode="drop").reshape(Bn, L)
    exc = timeit("A2 exc scatter", j_exc, exc_pos)

    @partial(jax.jit, static_argnames=("kk", "ss"))
    def j_cores(c, ln, e, kk, ss):
        return core_match.find_cores_canonical(c, ln, e, kk, ss, rank_lut=None)
    ck, cp, is_rc, codes_o, _ = timeit(
        "A3 find_cores_canonical",
        partial(j_cores, kk=k, ss=seed), codes, lengths, exc)

    @jax.jit
    def j_keys(co, ln, c1, c2):
        return core_match.build_sort_keys(co, ln, c1, c2, n_reads)
    keys = timeit("A4 build_sort_keys", j_keys, codes_o, lengths, ck, cp)

    @jax.jit
    def j_sort(kk):
        return reorder.sort_permutation(kk)
    perm2 = timeit("A5 sort_permutation", j_sort, keys)

    @jax.jit
    def j_apply(p, co, q, ln, c1, c2, rc):
        return reorder.apply_permutation(p, co, q, ln, c1, c2, rc)
    timeit("A6 apply_permutation", j_apply, perm2, codes_o, qual, lengths,
           ck, cp, is_rc)

    # --- stage B parts
    @jax.jit
    def j_delta(cs, ls, c1, c2):
        return enc_mod._delta_seq(cs, ls, c1, c2, n_reads)
    timeit("B1 delta_seq (best-of-4)", j_delta, codes_s, len_s, ck_s, cp_s)

    @partial(jax.jit, static_argnames=("order",))
    def j_hist(q, ln, order):
        return qualities.sym_ctx_hist(q, ln, order)
    timeit("B2 sym_ctx_hist", partial(j_hist, order=1), qual_s, len_s)

    # --- quality encode parts
    sym, ctx, counts = j_hist(qual_s, len_s, order=1)
    T = qualities.pick_T(Bn, L, cfg.qual_T_target)
    freq_dev, cum_dev = timeit(
        "Q1 normalize", partial(qualities._normalize_pass, order=1), counts)

    from scalce_tpu.ops import rans

    @partial(jax.jit, static_argnames=("TT",))
    def j_rans_enc(s, c, fl, cl, TT):
        return rans.rans_encode(s.reshape(-1), c.reshape(-1), fl, cl,
                                qualities.N_SYMS, TT)
    states, words, emits = timeit(
        "Q2 rans_encode (pallas/scan)",
        partial(j_rans_enc, TT=T), sym, ctx,
        freq_dev.reshape(-1), cum_dev.reshape(-1))

    @jax.jit
    def j_compact(w, e):
        return rans.compact_emissions(w, e)
    timeit("Q3 compact_emissions", j_compact, words, emits)

    @partial(jax.jit, static_argnames=("W",))
    def j_slice(p, W):
        return p[:, :W]
    packed, counts_w = j_compact(words, emits)
    timeit("Q4 slice_words W=256", partial(j_slice, W=256), packed)

    # D2H timings
    def d2h(x):
        return np.asarray(x)
    t0 = time.monotonic()
    w = d2h(j_slice(packed, 256))
    print(f"  {'D2H words [16384,256] u16':34s} "
          f"{(time.monotonic()-t0)*1e3:9.1f} ms ({w.nbytes/1e6:.1f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
