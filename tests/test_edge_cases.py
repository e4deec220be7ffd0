"""Edge-case round-trips: empty input, single read, tiny reads, all-N,
extreme quality bytes, unstructured names (raw fallback)."""

import numpy as np
import pytest

from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver


def _roundtrip_bytes(tmp_path, payload: bytes, **kw):
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    cfg = Config(mode="compress", inputs=(str(inp),),
                 output=str(tmp_path / "o"), block_reads=256, **kw)
    driver.compress(cfg)
    dcfg = Config(mode="decompress", inputs=(str(tmp_path / "o.00.scalcer"),),
                  output=str(tmp_path / "d"), block_reads=256,
                  keep_order=True)
    driver.decompress(dcfg)
    return (tmp_path / "d.fastq").read_bytes()


def test_empty_input(tmp_path):
    assert _roundtrip_bytes(tmp_path, b"") == b""


def test_single_read(tmp_path):
    payload = b"@only\nACGTACGTACGT\n+\nIIIIIIIIIIII\n"
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_reads_shorter_than_core_k(tmp_path):
    payload = b"".join(
        f"@r{i}\nACG\n+\nIII\n".encode() for i in range(10))
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_all_n_reads(tmp_path):
    payload = b"".join(
        f"@n{i}\n{'N'*50}\n+\n{'#'*50}\n".encode() for i in range(20))
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_lowercase_and_iupac_bases(tmp_path):
    payload = (b"@x\nacgtRYKMswBDHVn\n+\nIIIIIIIIIIIIIII\n"
               b"@y\nACGTacgtNNRRYYKK\n+\nIIIIIIIIIIIIIIII\n")
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_extreme_quality_bytes(tmp_path):
    # full printable FASTQ quality range '!' (33) .. '~' (126)
    quals = bytes(range(33, 127))
    seq = b"A" * len(quals)
    payload = b"@q\n" + seq + b"\n+\n" + quals + b"\n"
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_unstructured_names_fallback(tmp_path):
    names = [b"weird [name] {with} ~stuff~ 1",
             b"@@@", b"x", b"tab\ttab", b"trailing ", b"",
             b"unicode-\xc3\xa9\xc2\xb5"]
    recs = []
    for i, nm in enumerate(names):
        recs.append(b"@" + nm + b"\nACGTACGT\n+\nIIIIIIII\n")
    payload = b"".join(recs)
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_plus_line_with_repeated_name(tmp_path):
    payload = (b"@r1 desc\nACGT\n+r1 desc\nIIII\n"
               b"@r2\nGGCC\n+r2\nJJJJ\n")
    assert _roundtrip_bytes(tmp_path, payload) == payload


def test_mixed_read_lengths_same_block(tmp_path):
    rng = np.random.default_rng(0)
    recs = []
    for i in range(64):
        L = int(rng.integers(1, 128))
        seq = bytes(rng.choice(list(b"ACGT"), L).astype(np.uint8))
        q = bytes(rng.integers(33, 127, L).astype(np.uint8))
        recs.append(b"@m" + str(i).encode() + b"\n" + seq + b"\n+\n" + q
                    + b"\n")
    payload = b"".join(recs)
    assert _roundtrip_bytes(tmp_path, payload) == payload
