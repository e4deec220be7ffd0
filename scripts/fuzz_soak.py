"""Extended round-trip fuzz soak (not in CI — run by hand / end of
round): like tests/test_fuzz.py but across a much wider config cross
product, including the round-3 surfaces (order 3 + auto, delta-device
decode, single-member gzip AND BGZF inputs, long-read mode,
keep-order both ways).

Usage: JAX_PLATFORMS=cpu python scripts/fuzz_soak.py [n_trials [seed0]]
Prints one line per failure; exit code 1 if anything failed.
"""
import gzip
import os
import pathlib
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver
from scalce_tpu.utils.synth import bgzf_compress, synth_fastq, synth_pair


def one_trial(trial: int, td: pathlib.Path) -> None:
    rng = np.random.default_rng(99_000 + trial)
    long_mode = trial % 17 == 13
    paired = (not long_mode) and bool(trial % 4 == 1)
    if long_mode:
        L = int(rng.choice([33008, 65536, 100000]))
        n = int(rng.integers(3, 40))
        read_len = int(rng.integers(L // 2, L))
    else:
        L = 128
        n = int(rng.integers(50, 4000))
        read_len = int(rng.integers(24, 112))
    kw = dict(seed=trial, genome_len=int(rng.integers(5_000, 300_000)),
              n_rate=float(rng.choice([0.0, 0.001, 0.05])),
              var_len=bool(rng.integers(0, 2)),
              qual_model=str(rng.choice(["illumina", "uniform", "const",
                                         "binned"])),
              name_style=str(rng.choice(["sra", "illumina", "simple"])),
              rc_rate=float(rng.choice([0.0, 0.5])))
    ckw = dict(block_reads=int(rng.choice([256, 1024])),
               core_k=int(rng.choice([8, 12, 14])),
               qual_context_order=int(rng.choice([0, 1, 2, 3])),
               backend=str(rng.choice(["gz", "zstd", "no"])),
               max_read_len=L,
               lossy_pct=int(rng.choice([0, 0, 30])))
    if long_mode:
        ckw["qual_context_order"] = int(rng.choice([1, 2, 3]))
    dev_delta = bool(trial % 5 == 2) and not long_mode

    if paired:
        pkw = {k: v for k, v in kw.items()
               if k not in ("seed", "name_style")}
        a, b = synth_pair(n, read_len, seed=trial, **pkw)
        p1, p2 = td / "1.fq", td / "2.fq"
        p1.write_bytes(a)
        p2.write_bytes(b)
        driver.compress(Config(mode="compress", inputs=(str(p1), str(p2)),
                               paired=True, output=str(td / "o"), **ckw))
        driver.decompress(Config(mode="decompress",
                                 inputs=(str(td / "o.00_1.scalcen"),),
                                 output=str(td / "d"),
                                 keep_order=(ckw["lossy_pct"] == 0),
                                 delta_on_device=dev_delta))
        if ckw["lossy_pct"] == 0:
            assert (td / "d_1.fastq").read_bytes() == a, "mate1 mismatch"
            assert (td / "d_2.fastq").read_bytes() == b, "mate2 mismatch"
        else:
            s = lambda x: sorted(x.split(b"\n")[1::4])
            assert s((td / "d_1.fastq").read_bytes()) == s(a)
            assert s((td / "d_2.fastq").read_bytes()) == s(b)
        return

    payload = synth_fastq(n, read_len, **kw)
    inp = td / "in.fastq"
    if trial % 6 == 3:                 # single-member gzip input
        inp = td / "in.fastq.gz"
        inp.write_bytes(gzip.compress(payload, 1))
    elif trial % 6 == 5 and not long_mode:   # BGZF input
        inp = td / "in.fastq.gz"
        inp.write_bytes(bgzf_compress(
            payload, block=int(rng.integers(2000, 65000))))
    else:
        inp.write_bytes(payload)
    driver.compress(Config(mode="compress", inputs=(str(inp),),
                           output=str(td / "o"), **ckw))
    driver.decompress(Config(mode="decompress",
                             inputs=(str(td / "o.00.scalcer"),),
                             output=str(td / "d"),
                             keep_order=(ckw["lossy_pct"] == 0),
                             delta_on_device=dev_delta))
    out = (td / "d.fastq").read_bytes()
    if ckw["lossy_pct"] == 0:
        assert out == payload, "byte mismatch"
    else:
        assert sorted(out.split(b"\n")[1::4]) == \
            sorted(payload.split(b"\n")[1::4]), "seq mismatch (lossy)"


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    fails = 0
    for trial in range(n_trials):
        with tempfile.TemporaryDirectory() as td:
            try:
                one_trial(trial, pathlib.Path(td))
            except Exception as e:  # keep soaking; report at the end
                fails += 1
                print(f"FAIL trial {trial}: {type(e).__name__}: {e}",
                      flush=True)
        if trial % 20 == 19:
            print(f"[{trial + 1}/{n_trials}] ok so far: "
                  f"{trial + 1 - fails}", flush=True)
    print(f"done: {n_trials - fails}/{n_trials} passed", flush=True)
    return 1 if fails else 0           # raw counts wrap mod 256


if __name__ == "__main__":
    sys.exit(main())
