"""Paired-end (-r) tests: pair-sync invariant, shared permutation,
byte-exact keep-order round-trip (config 2)."""

import numpy as np
import pytest

from scalce_tpu import cli
from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver
from scalce_tpu.utils.synth import synth_pair


def _records(payload: bytes):
    lines = payload.decode().splitlines()
    return [tuple(lines[i:i + 4]) for i in range(0, len(lines), 4)]


def _compress_pair(tmp_path, a, b, **kw):
    p1, p2 = tmp_path / "in_1.fastq", tmp_path / "in_2.fastq"
    p1.write_bytes(a)
    p2.write_bytes(b)
    cfg = Config(mode="compress", inputs=(str(p1), str(p2)),
                 output=str(tmp_path / "out"), paired=True,
                 block_reads=1 << 10, **kw)
    return driver.compress(cfg)


def test_paired_roundtrip_pair_sync(tmp_path):
    a, b = synth_pair(3000, 100, seed=30, n_rate=0.005)
    stats = _compress_pair(tmp_path, a, b)
    assert stats.n_reads == 6000
    dcfg = Config(mode="decompress",
                  inputs=(str(tmp_path / "out.00_1.scalcen"),),
                  output=str(tmp_path / "dec"), block_reads=1 << 10)
    driver.decompress(dcfg)
    d1 = _records((tmp_path / "dec_1.fastq").read_bytes())
    d2 = _records((tmp_path / "dec_2.fastq").read_bytes())
    o1, o2 = _records(a), _records(b)
    assert sorted(d1) == sorted(o1)
    assert sorted(d2) == sorted(o2)
    # pair-sync: record i of dec_1 must be the original mate of record i
    # of dec_2 — original pairing is by input position
    pos1 = {r: i for i, r in enumerate(o1)}
    pos2 = {r: i for i, r in enumerate(o2)}
    for r1, r2 in zip(d1, d2):
        assert pos1[r1] == pos2[r2], "mates desynchronized"


def test_paired_keep_order_byte_exact(tmp_path):
    a, b = synth_pair(1500, 100, seed=31, var_len=False)
    _compress_pair(tmp_path, a, b)
    dcfg = Config(mode="decompress",
                  inputs=(str(tmp_path / "out.00_2.scalceq"),),
                  output=str(tmp_path / "dec"), block_reads=1 << 10,
                  keep_order=True)
    driver.decompress(dcfg)
    assert (tmp_path / "dec_1.fastq").read_bytes() == a
    assert (tmp_path / "dec_2.fastq").read_bytes() == b


def test_paired_lossy_seq_exact(tmp_path):
    a, b = synth_pair(2000, 100, seed=32)
    _compress_pair(tmp_path, a, b, lossy_pct=30, sample_size=1000)
    dcfg = Config(mode="decompress",
                  inputs=(str(tmp_path / "out.00_1.scalcen"),),
                  output=str(tmp_path / "dec"), block_reads=1 << 10,
                  keep_order=True)
    driver.decompress(dcfg)
    for orig, dec in ((a, "dec_1.fastq"), (b, "dec_2.fastq")):
        got = _records((tmp_path / dec).read_bytes())
        ref = _records(orig)
        assert [r[:3] for r in got] == [r[:3] for r in ref]


def test_paired_cli(tmp_path):
    a, b = synth_pair(800, 96, seed=33)
    p1, p2 = tmp_path / "a.fastq", tmp_path / "b.fastq"
    p1.write_bytes(a)
    p2.write_bytes(b)
    rc = cli.main([str(p1), str(p2), "-r", "-o", str(tmp_path / "o"),
                   "--block-reads", "1024"])
    assert rc == 0
    rc = cli.main(["-d", str(tmp_path / "o.00_1.scalcen"), "-o",
                   str(tmp_path / "d"), "--block-reads", "1024"])
    assert rc == 0
    assert (tmp_path / "d_1.fastq").exists()
    assert (tmp_path / "d_2.fastq").exists()


def test_paired_mismatched_counts_rejected(tmp_path):
    a, b = synth_pair(500, 96, seed=34)
    b2 = b + b"@extra\nACGT\n+\nIIII\n"
    p1, p2 = tmp_path / "a.fastq", tmp_path / "b.fastq"
    p1.write_bytes(a)
    p2.write_bytes(b2)
    cfg = Config(mode="compress", inputs=(str(p1), str(p2)),
                 output=str(tmp_path / "o"), paired=True,
                 block_reads=1 << 10)
    with pytest.raises(ValueError, match="differing read counts"):
        driver.compress(cfg)
