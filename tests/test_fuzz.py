"""Randomized round-trip property fuzzing over config space
(SURVEY.md §5: property tests with varying read lengths, N-runs,
quality distributions, name schemata)."""

import numpy as np
import pytest

from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver
from scalce_tpu.utils.synth import synth_fastq


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_roundtrip(tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(50, 3000))
    read_len = int(rng.integers(24, 112))
    kw = dict(
        seed=seed,
        genome_len=int(rng.integers(5_000, 300_000)),
        n_rate=float(rng.choice([0.0, 0.001, 0.05])),
        var_len=bool(rng.integers(0, 2)),
        qual_model=str(rng.choice(["illumina", "uniform", "const"])),
        name_style=str(rng.choice(["sra", "illumina", "simple"])),
        rc_rate=float(rng.choice([0.0, 0.5])),
    )
    payload = synth_fastq(n, read_len, **kw)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    cfg = Config(
        mode="compress", inputs=(str(inp),), output=str(tmp_path / "o"),
        block_reads=int(rng.choice([256, 1024])),
        core_k=int(rng.choice([8, 12, 14])),
        qual_context_order=int(rng.choice([1, 2])),
        backend=str(rng.choice(["gz", "bz", "no"])),
        max_read_len=128,
    )
    driver.compress(cfg)
    dcfg = Config(mode="decompress", inputs=(str(tmp_path / "o.00.scalcer"),),
                  output=str(tmp_path / "d"),
                  block_reads=cfg.block_reads, keep_order=True)
    driver.decompress(dcfg)
    assert (tmp_path / "d.fastq").read_bytes() == payload, \
        f"fuzz round-trip failed for {kw} / {cfg}"
