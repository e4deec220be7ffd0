"""Phase-by-phase profile of the encode assemble stage on the current
device — finds where the host CPU-seconds go (VERDICT r1: assemble is
36 worker-seconds per 11.6s bench wall while the device sits idle).

Run on the real device:  python scripts/profile_assemble.py
Run on CPU:              JAX_PLATFORMS=cpu python scripts/profile_assemble.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from scalce_tpu.config import Config
    from scalce_tpu.io import fastq
    from scalce_tpu.pipeline.encode import BlockEncoder, _slice_flat
    from scalce_tpu.streams import names as names_stream
    from scalce_tpu.streams import qualities, seqs
    from scalce_tpu.utils.synth import synth_fastq
    import tempfile

    B = int(os.environ.get("PROF_BLOCK_READS", 1 << 17))
    cfg = Config(mode="compress", inputs=("x",), block_reads=B)

    tmp = tempfile.mkdtemp(prefix="prof_")
    path = os.path.join(tmp, "in.fastq")
    t0 = time.monotonic()
    with open(path, "wb") as f:
        f.write(synth_fastq(B, 100, seed=42, genome_len=1_000_000,
                            n_rate=0.001))
    print(f"synth: {time.monotonic()-t0:.2f}s", flush=True)

    t0 = time.monotonic()
    block = next(fastq.iter_blocks(path, cfg.block_reads, cfg.max_read_len))
    print(f"parse: {time.monotonic()-t0:.2f}s", flush=True)

    enc = BlockEncoder(cfg)

    def phase(label, fn, *a, n=1, **kw):
        t0 = time.monotonic()
        for _ in range(n):
            r = fn(*a, **kw)
        dt = (time.monotonic() - t0) / n
        print(f"  {label:34s} {dt*1e3:9.1f} ms", flush=True)
        return r

    for it in range(3):
        print(f"--- iteration {it} ---", flush=True)
        t0 = time.monotonic()
        devout = enc.encode_device(block)
        print(f"  {'device dispatch (async)':34s} "
              f"{(time.monotonic()-t0)*1e3:9.1f} ms", flush=True)
        perm, delta, len_s, sym, ctx, counts = devout
        phase("device block_until_ready", jax.block_until_ready,
              (perm, delta, len_s, counts))

        # ---- qualities pass B, decomposed
        Bq, L = block.seq.shape
        T = qualities.pick_T(Bq, L, cfg.qual_T_target)
        freq_dev, cum_dev = phase(
            "q: normalize_pass + wait",
            lambda: jax.block_until_ready(qualities._normalize_pass(
                counts, cfg.qual_context_order)))
        states, packed, wcounts = phase(
            "q: encode_pass + wait",
            lambda: jax.block_until_ready(qualities._encode_pass(
                sym, ctx, freq_dev.reshape(-1), cum_dev.reshape(-1), T)))
        enc_q = phase(
            "q: finish_encoded (D2H+gather)", qualities.finish_encoded,
            np.asarray(freq_dev), np.asarray(states), packed,
            np.asarray(wcounts), Bq, L, T, cfg.qual_context_order)
        q_payload = phase("q: payload (deflate)", qualities.payload, enc_q,
                          backend=cfg.backend)
        print(f"    q payload bytes: {len(q_payload)}", flush=True)

        # ---- exceptions
        perm_np = phase("perm D2H", np.asarray, perm)

        def exc_remap():
            inv = np.empty(Bq, np.int64)
            inv[perm_np] = np.arange(Bq)
            rows, cols = block.exc_pos // L, block.exc_pos % L
            new_pos = inv[rows] * L + cols
            order_idx = np.argsort(new_pos, kind="stable")
            return new_pos[order_idx], block.exc_byte[order_idx]
        exc_pos_s, exc_byte_s = phase("exc remap", exc_remap)

        # ---- delta D2H
        def delta_d2h():
            n_lits = int(delta["n_lits"])
            n_words = (n_lits + 15) // 16
            W = max(64, (Bq * L // 16) // 16)
            while W < n_words:
                W <<= 1
            return {
                "mask_bits": np.asarray(delta["mask_bits"]),
                "shifts": np.asarray(delta["shifts"]),
                "lit_packed": np.asarray(_slice_flat(
                    delta["lit_packed"],
                    min(W, delta["lit_packed"].shape[0])))[:n_words],
                "n_lits": n_lits,
                "pred_k": np.asarray(delta["pred_k"]),
                "rc_bits": np.asarray(delta["rc_bits"]),
            }
        delta_np = phase("delta D2H", delta_d2h)
        len_np = phase("len D2H", np.asarray, len_s)
        r_payload = phase("r: payload (deflate)", seqs.payload, delta_np,
                          len_np, block.n_reads, exc_pos_s, exc_byte_s,
                          perm_np, backend=cfg.backend)
        print(f"    r payload bytes: {len(r_payload)}", flush=True)

        n_payload = phase("n: names encode", enc._encode_names, block)
        print(f"    n payload bytes: {len(n_payload)}", flush=True)


if __name__ == "__main__":
    main()
