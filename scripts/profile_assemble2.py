"""Phase profile of the CURRENT (host-qual placement) encode path."""

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
    from scalce_tpu.streams import qualities, seqs
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
    enc = BlockEncoder(cfg)

    def phase(label, fn, *a, **kw):
        t0 = time.monotonic()
        r = fn(*a, **kw)
        print(f"  {label:36s} {(time.monotonic()-t0)*1e3:9.1f} ms",
              flush=True)
        return r

    for it in range(3):
        print(f"--- iteration {it} ---", flush=True)
        t0 = time.monotonic()
        devout = enc.encode_device(block)
        print(f"  {'device dispatch (async)':36s} "
              f"{(time.monotonic()-t0)*1e3:9.1f} ms", flush=True)
        perm, delta, len_s, _, _, _ = devout
        phase("device wait (block_until_ready)", jax.block_until_ready,
              (perm, delta, len_s))
        perm_np = phase("perm D2H", np.asarray, perm)
        len_np = phase("len D2H", np.asarray, len_s)
        qual_s = phase("qual permute (host)", lambda: block.qual[perm_np])
        enc_q = phase("qual encode (native)", qualities.encode_host,
                      qual_s, len_np, cfg.qual_context_order,
                      qual_map=enc.qual_map_np)
        q_payload = phase("q payload pack", qualities.payload, enc_q,
                          backend=cfg.backend)

        def delta_d2h():
            n_lits = int(delta["n_lits"])
            n_words = (n_lits + 15) // 16
            L = block.seq.shape[1]
            W = max(64, (B * L // 16) // 16)
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
        L = block.seq.shape[1]
        inv = np.empty(B, np.int64)
        inv[perm_np] = np.arange(B)
        rows, cols = block.exc_pos // L, block.exc_pos % L
        new_pos = inv[rows] * L + cols
        oi = np.argsort(new_pos, kind="stable")
        r_payload = phase("r payload (lit trial + zstd)", seqs.payload,
                          delta_np, len_np, block.n_reads, new_pos[oi],
                          block.exc_byte[oi], perm_np,
                          backend=cfg.backend)
        n_payload = phase("names encode", enc._encode_names, block)
        print(f"    bytes: q={len(q_payload)} r={len(r_payload)} "
              f"n={len(n_payload)}", flush=True)


if __name__ == "__main__":
    main()
