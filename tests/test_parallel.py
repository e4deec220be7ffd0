"""Sharded data-parallel pipeline tests on the 8-device CPU mesh
(SURVEY.md §5: multi-host-style testing without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalce_tpu.models import entropy
from scalce_tpu.parallel import mesh as pmesh
from scalce_tpu.streams import qualities


def _make_blocks(D, B, L, seed=0):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, size=(D, B, L), dtype=np.uint8)
    qual = rng.integers(35, 70, size=(D, B, L), dtype=np.uint8)
    lengths = np.full((D, B), L, np.int32)
    n_reads = np.full((D,), B, np.int32)
    exc = np.zeros((D, B, L), bool)
    return seq, qual, lengths, n_reads, exc


def test_sharded_stage1_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    D, B, L = 8, 64, 48
    seq, qual, lengths, n_reads, exc = _make_blocks(D, B, L)
    m = pmesh.local_mesh(8)
    stage1 = pmesh.make_sharded_stage1(m, k=8, seed=7, order=1)
    qm = jnp.arange(256, dtype=jnp.uint8)
    sent = jnp.zeros(1, jnp.uint32)
    perm, delta, len_s, sym, ctx, counts = stage1(
        jnp.asarray(seq), jnp.asarray(qual), jnp.asarray(lengths),
        jnp.asarray(n_reads), jnp.asarray(exc), qm, sent)

    # reference: run each block through the unsharded path
    for d in range(D):
        p_ref, d_ref, ls_ref, sym_ref, ctx_ref, cnt_ref = \
            pmesh._block_stage1(jnp.asarray(seq[d]), jnp.asarray(qual[d]),
                                jnp.asarray(lengths[d]),
                                jnp.int32(n_reads[d]), jnp.asarray(exc[d]),
                                qm, sent, k=8, seed=7, order=1)
        np.testing.assert_array_equal(np.asarray(perm)[d], np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(delta["mask_bits"])[d],
                                      np.asarray(d_ref["mask_bits"]))
        np.testing.assert_array_equal(np.asarray(delta["lit_packed"])[d],
                                      np.asarray(d_ref["lit_packed"]))
        np.testing.assert_array_equal(np.asarray(counts)[d],
                                      np.asarray(cnt_ref))


def test_sharded_qual_encode_roundtrips():
    D, B, L = 8, 32, 32
    seq, qual, lengths, n_reads, exc = _make_blocks(D, B, L, seed=1)
    m = pmesh.local_mesh(8)
    stage1 = pmesh.make_sharded_stage1(m, k=8, seed=7, order=1)
    qm = jnp.arange(256, dtype=jnp.uint8)
    _, _, len_s, sym, ctx, counts = stage1(
        jnp.asarray(seq), jnp.asarray(qual), jnp.asarray(lengths),
        jnp.asarray(n_reads), jnp.asarray(exc), qm,
        jnp.zeros(1, jnp.uint32))

    T = qualities.pick_T(B, L)
    C = qualities.n_contexts(1)
    enc = pmesh.make_sharded_qual_encode(m, C, qualities.N_SYMS, T)
    freqs, states, packed_w, wcounts = enc(sym, ctx, counts)
    # device tables are valid (rows sum to M, nonzero counts kept >= 1)
    fr = np.asarray(freqs)
    assert (fr.sum(axis=2) == 4096).all()
    cnts = np.asarray(counts).reshape(D, C, qualities.N_SYMS)
    assert (fr[cnts > 0] >= 1).all()
    # decode every block with the single-device path and compare
    for d in range(D):
        eq = qualities.EncodedQuals(
            freq=fr[d],
            states=np.asarray(states)[d],
            counts=np.asarray(wcounts)[d],
            words=_flatten(np.asarray(packed_w)[d], np.asarray(wcounts)[d]),
            B=B, L=L, T=T, order=1)
        got = qualities.decode(eq, np.asarray(len_s)[d])
        # expected: remapped-sorted qual grid; recompute via sym grid
        exp = np.where(np.asarray(sym)[d] > 0,
                       np.asarray(sym)[d] + qualities.QUAL_OFFSET,
                       np.asarray(sym)[d] + qualities.QUAL_OFFSET)
        exp = (np.asarray(sym)[d] + qualities.QUAL_OFFSET).astype(np.uint8)
        valid = np.arange(L)[None, :] < np.asarray(len_s)[d][:, None]
        exp = np.where(valid, exp, 0).astype(np.uint8)
        np.testing.assert_array_equal(got, exp)


def _flatten(packed, counts):
    return np.concatenate([packed[n, :c] for n, c in enumerate(counts)]) \
        if counts.sum() else np.empty(0, np.uint16)


def test_lossy_hist_allreduce_matches_global():
    D, B, L = 8, 16, 32
    _, qual, lengths, _, _ = _make_blocks(D, B, L, seed=2)
    m = pmesh.local_mesh(8)
    hist_fn = pmesh.make_lossy_hist_allreduce(m, qualities.N_SYMS)
    h = np.asarray(hist_fn(jnp.asarray(qual), jnp.asarray(lengths)))
    sym = np.clip(qual.astype(np.int64) - qualities.QUAL_OFFSET, 0,
                  qualities.N_SYMS - 1)
    ref = np.bincount(sym.reshape(-1), minlength=qualities.N_SYMS)
    np.testing.assert_array_equal(h, ref)


def test_data_parallel_driver_byte_identical(tmp_path):
    """--data-parallel over the 8-device CPU mesh produces the same
    bytes as the single-device path (config 4 determinism)."""
    from scalce_tpu.config import Config
    from scalce_tpu.pipeline import driver
    from scalce_tpu.utils.synth import synth_fastq
    payload = synth_fastq(10000, 100, seed=60, var_len=True, n_rate=0.003)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    base = dict(mode="compress", inputs=(str(inp),), block_reads=1 << 10)
    driver.compress(Config(output=str(tmp_path / "one"), **base))
    driver.compress(Config(output=str(tmp_path / "dp"), data_parallel=True,
                           **base))
    for ext in (".scalcen", ".scalcer", ".scalceq"):
        a = (tmp_path / f"one.00{ext}").read_bytes()
        b = (tmp_path / f"dp.00{ext}").read_bytes()
        assert a == b, f"{ext} differs under data-parallel"


def test_distributed_single_process_helpers():
    from scalce_tpu.parallel import distributed as dist
    topo = dist.init_multihost()
    assert topo.host_id == 0 and topo.n_hosts == 1
    assert topo.n_local_devices >= 1
    dist.barrier(tag=3)              # must not deadlock single-process
    h = np.arange(94, dtype=np.int64)
    np.testing.assert_array_equal(dist.global_quality_histogram(h), h)


def test_grouped_encoder_byte_identical(tmp_path):
    """group>1 (several blocks vmapped per device) must not change
    output bytes either."""
    from scalce_tpu.config import Config
    from scalce_tpu.io import fastq
    from scalce_tpu.models import lossy
    from scalce_tpu.pipeline.encode import BlockEncoder
    from scalce_tpu.utils.synth import synth_fastq
    payload = synth_fastq(4096, 100, seed=61, var_len=True)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    cfg = Config(mode="compress", inputs=(str(inp),),
                 output="unused", block_reads=1 << 10)
    blocks = list(fastq.iter_blocks(str(inp), cfg.block_reads,
                                    cfg.max_read_len))
    ref = [BlockEncoder(cfg, lossy.identity_map()).encode_block(b)
           for b in blocks]
    m = pmesh.local_mesh(2)
    senc = pmesh.ShardedEncoder(cfg, lossy.identity_map(), mesh=m, group=2)
    assert senc.D == 4
    got = senc.encode_blocks(blocks[:4])
    for r, g in zip(ref, got):
        assert r.payloads == g.payloads


def test_paired_data_parallel_byte_identical(tmp_path):
    """paired + --data-parallel (VERDICT r1 item 6): byte-identical to
    the threaded paired path, including the mate-2 permutation-follow."""
    from scalce_tpu.config import Config
    from scalce_tpu.pipeline import driver
    from scalce_tpu.utils.synth import synth_fastq
    p1 = synth_fastq(6000, 100, seed=70, var_len=True, n_rate=0.003,
                     mate=1)
    p2 = synth_fastq(6000, 100, seed=70, var_len=True, n_rate=0.003,
                     mate=2)
    in1, in2 = tmp_path / "in_1.fastq", tmp_path / "in_2.fastq"
    in1.write_bytes(p1)
    in2.write_bytes(p2)
    base = dict(mode="compress", inputs=(str(in1), str(in2)), paired=True,
                block_reads=1 << 10)
    driver.compress(Config(output=str(tmp_path / "thr"), **base))
    driver.compress(Config(output=str(tmp_path / "dp"), data_parallel=True,
                           **base))
    for mate in (1, 2):
        for ext in (".scalcen", ".scalcer", ".scalceq"):
            a = (tmp_path / f"thr.00_{mate}{ext}").read_bytes()
            b = (tmp_path / f"dp.00_{mate}{ext}").read_bytes()
            assert a == b, f"mate {mate} {ext} differs under paired DP"
