"""Multi-host determinism: N-host encode + ordered merge must be
byte-identical to the 1-host output (SURVEY.md §5), simulated as N
sequential driver invocations in one process."""

import pytest

from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver
from scalce_tpu.utils.synth import synth_fastq


def _triplet_bytes(tmp_path, prefix):
    out = {}
    for ext in (".scalcen", ".scalcer", ".scalceq"):
        part = 0
        chunks = []
        while (tmp_path / f"{prefix}.{part:02d}{ext}").exists():
            chunks.append((tmp_path / f"{prefix}.{part:02d}{ext}"
                           ).read_bytes())
            part += 1
        out[ext] = chunks
    return out


@pytest.mark.parametrize("part_size", [0, 120_000])
def test_three_host_output_byte_identical(tmp_path, part_size):
    payload = synth_fastq(7000, 100, seed=40, var_len=True, n_rate=0.003)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)

    base = dict(mode="compress", inputs=(str(inp),), block_reads=1 << 10,
                part_size=part_size)
    # single host
    driver.compress(Config(output=str(tmp_path / "one"), **base))

    # three simulated hosts + merge
    n_hosts = 3
    for h in range(n_hosts):
        driver.compress(Config(output=str(tmp_path / "multi"),
                               n_hosts=n_hosts, host_id=h, **base))
    n = driver.merge_hosts(Config(output=str(tmp_path / "multi"),
                                  n_hosts=n_hosts, **base))
    assert n == 7            # ceil(7000 / 1024)

    one = _triplet_bytes(tmp_path, "one")
    multi = _triplet_bytes(tmp_path, "multi")
    assert one == multi, "multi-host merge is not byte-identical"
    # intermediates cleaned up
    assert not list(tmp_path.glob("multi.host*"))


def test_merge_detects_missing_host_blocks(tmp_path):
    payload = synth_fastq(4000, 100, seed=41)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    base = dict(mode="compress", inputs=(str(inp),), block_reads=1 << 10)
    # host 1 of 2 never runs
    driver.compress(Config(output=str(tmp_path / "m"), n_hosts=2,
                           host_id=0, **base))
    with pytest.raises((ValueError, FileNotFoundError)):
        driver.merge_hosts(Config(output=str(tmp_path / "m"), n_hosts=2,
                                  **base))


def test_resume_after_torn_write(tmp_path):
    """Crash mid-write -> --resume keeps durable blocks, redoes the rest,
    and the final output round-trips (SURVEY.md §6 checkpoint/resume)."""
    from scalce_tpu.utils.synth import synth_fastq as _synth
    payload = _synth(5000, 100, seed=50, var_len=True)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    base = dict(inputs=(str(inp),), block_reads=1 << 10,
                output=str(tmp_path / "out"))
    driver.compress(Config(mode="compress", **base))
    # simulate a crash: drop the footer + tail of the LAST block, and cut
    # one stream mid-block
    import os
    for ext, cut in ((".scalcer", 300), (".scalceq", 40)):
        p = tmp_path / f"out.00{ext}"
        data = p.read_bytes()
        p.write_bytes(data[:-cut])
    st = driver.compress(Config(mode="compress", resume=True, **base))
    assert st.n_blocks >= 1          # at least the torn block was redone
    assert st.n_blocks < 5           # but not all five
    dcfg = Config(mode="decompress", inputs=(str(tmp_path / "out.00.scalcen"),),
                  output=str(tmp_path / "dec"), block_reads=1 << 10,
                  keep_order=True)
    driver.decompress(dcfg)
    assert (tmp_path / "dec.fastq").read_bytes() == payload


def test_paired_multihost_byte_identical(tmp_path):
    from scalce_tpu.utils.synth import synth_pair
    a, b = synth_pair(5000, 100, seed=70)
    p1, p2 = tmp_path / "a.fastq", tmp_path / "b.fastq"
    p1.write_bytes(a)
    p2.write_bytes(b)
    base = dict(mode="compress", inputs=(str(p1), str(p2)), paired=True,
                block_reads=1 << 10)
    driver.compress(Config(output=str(tmp_path / "one"), **base))
    for h in range(2):
        driver.compress(Config(output=str(tmp_path / "multi"), n_hosts=2,
                               host_id=h, **base))
    driver.merge_hosts(Config(output=str(tmp_path / "multi"), n_hosts=2,
                              **base))
    for mate in (1, 2):
        for ext in (".scalcen", ".scalcer", ".scalceq"):
            one = (tmp_path / f"one.00_{mate}{ext}").read_bytes()
            multi = (tmp_path / f"multi.00_{mate}{ext}").read_bytes()
            assert one == multi, f"mate {mate} {ext} differs"


def test_cli_merge_hosts(tmp_path):
    from scalce_tpu import cli
    from scalce_tpu.utils.synth import synth_fastq as _synth
    payload = _synth(3000, 100, seed=80)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    for h in range(2):
        rc = cli.main([str(inp), "-o", str(tmp_path / "m"),
                       "--n-hosts", "2", "--host-id", str(h),
                       "--block-reads", "1024"])
        assert rc == 0
    rc = cli.main([str(inp), "-o", str(tmp_path / "m"), "--n-hosts", "2",
                   "--merge-hosts", "--block-reads", "1024"])
    assert rc == 0
    rc = cli.main(["-d", str(tmp_path / "m.00.scalcen"), "-o",
                   str(tmp_path / "d"), "--block-reads", "1024"])
    assert rc == 0
    lines = (tmp_path / "d.fastq").read_bytes().decode().splitlines()
    assert len(lines) == 4 * 3000


def test_three_host_lossy_output_byte_identical(tmp_path):
    """Multihost + lossy (-p): every host samples the SAME prefix
    blocks for the quantizer histogram (each parses the whole input),
    so the merged N-host output must be byte-identical to 1-host —
    pinned here because the determinism argument is by-construction
    (VERDICT r1 weak #8)."""
    payload = synth_fastq(6000, 100, seed=44, var_len=True,
                          qual_model="illumina")
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    base = dict(mode="compress", inputs=(str(inp),), block_reads=1 << 10,
                lossy_pct=30, sample_size=2000)
    driver.compress(Config(output=str(tmp_path / "one"), **base))
    n_hosts = 3
    for h in range(n_hosts):
        driver.compress(Config(output=str(tmp_path / "multi"),
                               n_hosts=n_hosts, host_id=h, **base))
    driver.merge_hosts(Config(output=str(tmp_path / "multi"),
                              n_hosts=n_hosts, **base))
    assert _triplet_bytes(tmp_path, "one") == \
        _triplet_bytes(tmp_path, "multi")


def test_multihost_plus_data_parallel_byte_identical(tmp_path):
    """BASELINE.json config 5's shape in miniature: every host runs
    --data-parallel over its local (virtual 8-device) mesh AND the
    hosts split blocks by id; the merged output must still be
    byte-identical to a plain single-host single-device run."""
    payload = synth_fastq(9000, 100, seed=55, var_len=True, n_rate=0.002,
                          rc_rate=0.4)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    base = dict(mode="compress", inputs=(str(inp),), block_reads=1 << 9)
    driver.compress(Config(output=str(tmp_path / "one"), **base))
    n_hosts = 2
    for h in range(n_hosts):
        driver.compress(Config(output=str(tmp_path / "dp"),
                               n_hosts=n_hosts, host_id=h,
                               data_parallel=True, **base))
    driver.merge_hosts(Config(output=str(tmp_path / "dp"),
                              n_hosts=n_hosts, **base))
    assert _triplet_bytes(tmp_path, "one") == \
        _triplet_bytes(tmp_path, "dp")
