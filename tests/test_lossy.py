"""Lossy quality quantizer tests (config 3: seq stream bit-exact,
qualities within the -p budget, quality stream shrinks)."""

import numpy as np
import pytest

from scalce_tpu.config import Config
from scalce_tpu.models import lossy
from scalce_tpu.pipeline import driver
from scalce_tpu.utils.synth import synth_fastq


def test_identity_at_p0():
    hist = np.ones(lossy.N_SYMS, np.int64)
    np.testing.assert_array_equal(lossy.build_quant_map(hist, 0),
                                  lossy.identity_map())


def test_quant_map_respects_budget():
    rng = np.random.default_rng(0)
    hist = rng.integers(0, 10_000, size=lossy.N_SYMS).astype(np.int64)
    for pct in (10, 30, 50):
        lut = lossy.build_quant_map(hist, pct)
        sym = np.arange(lossy.N_SYMS)
        mapped = lut[sym + lossy.QUAL_OFFSET].astype(np.int64) \
            - lossy.QUAL_OFFSET
        # every value within pct% of its original
        assert np.all(np.abs(mapped - sym) <= pct / 100.0 * sym + 1e-9)
        # mapping is idempotent (representatives map to themselves)
        again = lut[mapped + lossy.QUAL_OFFSET].astype(np.int64) \
            - lossy.QUAL_OFFSET
        np.testing.assert_array_equal(again, mapped)
    # deterministic
    np.testing.assert_array_equal(lossy.build_quant_map(hist, 30),
                                  lossy.build_quant_map(hist, 30))


def test_quant_map_shrinks_alphabet():
    rng = np.random.default_rng(1)
    hist = rng.integers(0, 10_000, size=lossy.N_SYMS).astype(np.int64)
    lut = lossy.build_quant_map(hist, 30)
    sym = np.arange(lossy.N_SYMS)
    n_distinct = len(np.unique(lut[sym + lossy.QUAL_OFFSET]))
    assert n_distinct < lossy.N_SYMS // 2


def _records(payload: bytes):
    lines = payload.decode().splitlines()
    return [tuple(lines[i:i + 4]) for i in range(0, len(lines), 4)]


def test_lossy_roundtrip_seq_exact_qual_within_budget(tmp_path):
    payload = synth_fastq(4096, 100, seed=20, n_rate=0.005)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)

    sizes = {}
    for tag, pct in (("lossless", 0), ("lossy", 30)):
        out = str(tmp_path / f"out_{tag}")
        cfg = Config(mode="compress", inputs=(str(inp),), output=out,
                     block_reads=1 << 10, lossy_pct=pct, sample_size=2048)
        st = driver.compress(cfg)
        sizes[tag] = st.stream_bytes["q"]
        dcfg = Config(mode="decompress", inputs=(out + ".00.scalcen",),
                      output=str(tmp_path / f"dec_{tag}"),
                      block_reads=1 << 10, keep_order=True)
        driver.decompress(dcfg)

    orig = _records(payload)
    lossless = _records((tmp_path / "dec_lossless.fastq").read_bytes())
    lossy_recs = _records((tmp_path / "dec_lossy.fastq").read_bytes())
    assert lossless == orig
    # names + sequences byte-exact under -p (keep_order aligns records)
    assert [r[:3] for r in lossy_recs] == [r[:3] for r in orig]
    # qualities within 30% of original Phred value
    for (_, _, _, q_orig), (_, _, _, q_lossy) in zip(orig, lossy_recs):
        v = np.frombuffer(q_orig.encode(), np.uint8).astype(np.int64) - 33
        w = np.frombuffer(q_lossy.encode(), np.uint8).astype(np.int64) - 33
        assert np.all(np.abs(w - v) <= 0.3 * v + 1e-9)
    # the lossy quality stream must be clearly smaller
    assert sizes["lossy"] < 0.8 * sizes["lossless"], sizes
