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


def test_fuzz_corrupt_container_never_crashes(tmp_path):
    """Single-byte corruptions anywhere in the triplet must produce
    either a clean decode (payload bytes that still validate) or a
    CONTROLLED error — never an uncontrolled crash, hang, or
    out-of-bounds access in the native reconstruction paths
    (SURVEY.md §6 "Failure detection"; ADVICE r1 hardening)."""
    payload = synth_fastq(600, 80, seed=77, n_rate=0.01, var_len=True)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    cfg = Config(mode="compress", inputs=(str(inp),),
                 output=str(tmp_path / "o"), block_reads=1 << 9)
    driver.compress(cfg)

    files = [tmp_path / f"o.00.scalce{s}" for s in "nrq"]
    originals = {f: f.read_bytes() for f in files}
    # Any Python exception counts as a controlled failure; the real
    # assertions are: no segfault (process survives), no hang (suite
    # timeout), and decode NEVER writes outside its buffers (the
    # container validators gate every native reconstruction call).
    rng = np.random.default_rng(99)
    n_trials = 60
    for t in range(n_trials):
        f = files[int(rng.integers(0, 3))]
        data = bytearray(originals[f])
        pos = int(rng.integers(0, len(data)))
        data[pos] ^= int(rng.integers(1, 256))
        f.write_bytes(bytes(data))
        try:
            dcfg = Config(mode="decompress",
                          inputs=(str(tmp_path / "o.00.scalcer"),),
                          output=str(tmp_path / f"d{t}"),
                          block_reads=1 << 9)
            driver.decompress(dcfg)
        except Exception:
            pass          # controlled failure is acceptable
        finally:
            f.write_bytes(originals[f])
    # and the pristine container still round-trips afterwards
    dcfg = Config(mode="decompress",
                  inputs=(str(tmp_path / "o.00.scalcer"),),
                  output=str(tmp_path / "dfinal"), block_reads=1 << 9,
                  keep_order=True)
    driver.decompress(dcfg)
    assert (tmp_path / "dfinal.fastq").read_bytes() == payload


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_modes_and_placements(tmp_path, trial):
    """Random mode combinations (paired/lossy/keep-order × core
    placement × backend) must round-trip; placement must never change
    the outcome."""
    rng = np.random.default_rng(3000 + trial)
    n = int(rng.integers(200, 2500))
    rl = int(rng.integers(24, 110))
    paired = bool(trial % 2)
    lossy = int(rng.choice([0, 30]))
    place = [None, True, False][trial % 3]
    br = int(rng.choice([256, 1024]))

    def seqs(x):
        return sorted(x.split(b"\n")[1::4])

    if paired:
        from scalce_tpu.utils.synth import synth_pair
        a, b = synth_pair(n, rl, seed=trial)
        p1, p2 = tmp_path / "1.fq", tmp_path / "2.fq"
        p1.write_bytes(a)
        p2.write_bytes(b)
        driver.compress(Config(mode="compress", inputs=(str(p1), str(p2)),
                               paired=True, output=str(tmp_path / "o"),
                               block_reads=br, lossy_pct=lossy,
                               core_on_device=place))
        driver.decompress(Config(mode="decompress",
                                 inputs=(str(tmp_path / "o.00_1.scalcen"),),
                                 output=str(tmp_path / "d"),
                                 block_reads=br))
        assert seqs((tmp_path / "d_1.fastq").read_bytes()) == seqs(a)
        assert seqs((tmp_path / "d_2.fastq").read_bytes()) == seqs(b)
    else:
        payload = synth_fastq(n, rl, seed=trial, var_len=True,
                              n_rate=0.01)
        p = tmp_path / "in.fq"
        p.write_bytes(payload)
        driver.compress(Config(mode="compress", inputs=(str(p),),
                               output=str(tmp_path / "o"), block_reads=br,
                               lossy_pct=lossy, core_on_device=place))
        driver.decompress(Config(mode="decompress",
                                 inputs=(str(tmp_path / "o.00.scalcer"),),
                                 output=str(tmp_path / "d"),
                                 block_reads=br, keep_order=(lossy == 0)))
        out = (tmp_path / "d.fastq").read_bytes()
        if lossy == 0:
            assert out == payload
        else:
            assert seqs(out) == seqs(payload)


def test_simd_vs_numpy_differential_odd_shapes(tmp_path):
    """Differential fuzz of the SIMD native paths against the numpy
    fallbacks on odd static shapes (partial mask strides, tiny L,
    ragged lengths): encoded bytes and decoded records must agree."""
    import numpy as np
    from scalce_tpu.config import Config
    from scalce_tpu.io import fastq
    from scalce_tpu.pipeline.encode import BlockEncoder
    from scalce_tpu.pipeline.decode import BlockDecoder
    from scalce_tpu.pipeline.encode import file_meta
    import scalce_tpu.streams.seqs as seqs_mod
    import scalce_tpu.streams.qualities as qual_mod
    from scalce_tpu.utils.synth import synth_fastq

    rng = np.random.default_rng(99)
    for L, n_reads, seed in [(16, 700, 1), (48, 1200, 2), (80, 900, 3),
                             (128, 1500, 4)]:
        max_len = max(L - 4, 1)
        data = synth_fastq(n_reads, max_len, seed=seed, var_len=True,
                           n_rate=0.02, genome_len=4096)
        p = tmp_path / f"in{L}.fastq"
        p.write_bytes(data)
        cfg = Config(mode="compress", inputs=(str(p),), block_reads=1024,
                     max_read_len=L, core_on_device=False)
        blocks = list(fastq.iter_blocks(str(p), cfg.block_reads, L))
        enc = BlockEncoder(cfg)
        payloads = [enc.encode_block(b).payloads for b in blocks]
        dec = BlockDecoder(file_meta(cfg))
        native_out = [dec.decode_block(pl) for pl in payloads]
        # numpy fallbacks for the r-stream parse + quality decode
        nat_s, nat_q = seqs_mod._NATIVE, qual_mod._NATIVE_Q
        seqs_mod._NATIVE, qual_mod._NATIVE_Q = False, False
        try:
            np_out = [dec.decode_block(pl) for pl in payloads]
        finally:
            seqs_mod._NATIVE, qual_mod._NATIVE_Q = nat_s, nat_q
        for a, b in zip(native_out, np_out):
            assert np.array_equal(a.seq, b.seq)
            assert np.array_equal(a.qual, b.qual)
            assert np.array_equal(a.lengths, b.lengths)
            assert bytes(a.names.cat) == bytes(b.names.cat)
