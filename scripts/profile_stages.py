"""Warm timing of the CURRENT stage A / stage B graphs with varied
inputs (the emulator can cache same-input executions; vary to be safe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from scalce_tpu.config import Config
    from scalce_tpu.io import fastq
    from scalce_tpu.pipeline import encode as enc_mod
    from scalce_tpu.utils.synth import synth_fastq
    import tempfile

    print("backend:", jax.default_backend(), flush=True)
    B = int(os.environ.get("PROF_BLOCK_READS", 1 << 17))
    cfg = Config(mode="compress", inputs=("x",), block_reads=B)
    tmp = tempfile.mkdtemp(prefix="prof_")
    path = os.path.join(tmp, "in.fastq")
    with open(path, "wb") as f:
        f.write(synth_fastq(B, 100, seed=42, genome_len=1_000_000,
                            n_rate=0.001))
    block = next(fastq.iter_blocks(path, cfg.block_reads, cfg.max_read_len))
    Bn, L = block.seq.shape
    print(f"block shape {Bn}x{L}", flush=True)

    packed0 = enc_mod._host_pack(block.seq)
    lengths = jnp.asarray(block.lengths)
    n_reads = jnp.int32(block.n_reads)
    exc_pos = jnp.asarray(enc_mod._pad_exc(block.exc_pos.astype(np.int32),
                                           Bn * L))
    rank_lut = jnp.zeros(1, jnp.uint32)
    k, seed = cfg.core_k, cfg.dict_seed

    @jax.jit
    def vary(p, i):
        # flip low bit of one word per row: changes content, same shapes
        return p.at[:, 0].set(p[:, 0] ^ (i & 1).astype(jnp.uint32))

    packed = jnp.asarray(packed0)

    for it in range(4):
        pv = jax.block_until_ready(vary(packed, jnp.uint32(it)))
        t0 = time.monotonic()
        a_out = jax.block_until_ready(enc_mod._device_stage_a_nq(
            pv, lengths, n_reads, exc_pos, rank_lut, k, seed))
        tA = time.monotonic() - t0
        perm, codes_s, len_s, ck_s, cp_s, rc_s = a_out
        t0 = time.monotonic()
        delta = jax.block_until_ready(enc_mod._device_stage_b_nq(
            codes_s, len_s, ck_s, cp_s, rc_s, n_reads))
        tB = time.monotonic() - t0
        print(f"iter {it}: stageA {tA*1e3:8.1f} ms   stageB {tB*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
