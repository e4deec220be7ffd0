"""rANS coder unit tests: exact division, raw coder round-trip,
quality-stream codec round-trip (CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scalce_tpu.models import entropy
from scalce_tpu.ops import rans
from scalce_tpu.streams import qualities


def test_udiv_exact_exhaustive_edges():
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.integers(0, 1 << 32, size=20000, dtype=np.uint64),
        np.array([0, 1, 0xFFFFFFFF, 0x80000000, 0xFFFF0000, 4095, 4096]),
    ]).astype(np.uint32)
    fs = np.concatenate([
        rng.integers(1, 4097, size=xs.size - 7, dtype=np.uint64),
        np.array([1, 4096, 3, 4095, 2, 7, 4096]),
    ]).astype(np.uint32)
    q, r = rans.udiv_u32_small(jnp.asarray(xs), jnp.asarray(fs))
    q, r = np.asarray(q).astype(np.uint64), np.asarray(r).astype(np.uint64)
    x64, f64 = xs.astype(np.uint64), fs.astype(np.uint64)
    np.testing.assert_array_equal(q, x64 // f64)
    np.testing.assert_array_equal(r, x64 % f64)


def test_normalize_freqs_properties():
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 1000, size=(50, 16))
    counts[3] = 0                       # empty context
    counts[4] = 0
    counts[4, 7] = 5                    # single-symbol context
    counts[5, :] = 1                    # flat tiny counts
    freq = entropy.normalize_freqs(counts, 16)
    assert (freq.sum(axis=1) == rans.M_TOTAL).all()
    assert (freq[counts > 0] >= 1).all()
    assert freq[4, 7] == rans.M_TOTAL
    # deterministic
    freq2 = entropy.normalize_freqs(counts, 16)
    np.testing.assert_array_equal(freq, freq2)


def _roundtrip_raw(sym_np, ctx_np, n_ctx, n_syms, T):
    counts = np.zeros((n_ctx, n_syms), np.int64)
    np.add.at(counts, (ctx_np, sym_np), 1)
    freq, cum, lut = entropy.tables_from_counts(counts, n_ctx, n_syms)
    states, words, emits = rans.rans_encode(
        jnp.asarray(sym_np, jnp.uint32), jnp.asarray(ctx_np, jnp.uint32),
        jnp.asarray(freq.reshape(-1)), jnp.asarray(cum.reshape(-1)),
        n_syms, T)
    packed, wcounts = rans.compact_emissions(words, emits)

    # decode with the true ctx sequence supplied as aux (context known)
    N = sym_np.size // T
    aux = jnp.asarray(ctx_np.reshape(N, T).T.astype(np.uint32))

    def ctx_fn(aux_t, prev1, prev2):
        return aux_t

    out = rans.rans_decode(states, packed, jnp.asarray(lut), ctx_fn,
                           aux, T)
    got = np.asarray(out).T.reshape(-1)
    return got, np.asarray(wcounts).sum() * 2 + N * 4


def test_rans_roundtrip_uniform_and_skewed():
    rng = np.random.default_rng(2)
    T, N, n_ctx, n_syms = 64, 32, 4, 10
    S = T * N
    sym = rng.integers(0, n_syms, size=S)
    ctx = rng.integers(0, n_ctx, size=S)
    got, _ = _roundtrip_raw(sym, ctx, n_ctx, n_syms, T)
    np.testing.assert_array_equal(got, sym)

    # heavily skewed: mostly symbol 3
    sym2 = np.where(rng.random(S) < 0.95, 3, rng.integers(0, n_syms, size=S))
    got2, nbytes = _roundtrip_raw(sym2, ctx, n_ctx, n_syms, T)
    np.testing.assert_array_equal(got2, sym2)
    # skewed stream must compress well below 1 byte/symbol
    assert nbytes < S


def test_rans_single_symbol_stream_costs_nothing():
    T, N = 32, 8
    S = T * N
    sym = np.zeros(S, np.int64)
    ctx = np.zeros(S, np.int64)
    got, nbytes = _roundtrip_raw(sym, ctx, 1, 4, T)
    np.testing.assert_array_equal(got, sym)
    assert nbytes == N * 4  # only the flushed states


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("qual_model", ["illumina", "uniform", "const"])
def test_quality_codec_roundtrip(order, qual_model):
    rng = np.random.default_rng(3)
    B, L = 64, 96
    lengths = rng.integers(40, L + 1, size=B).astype(np.int32)
    if qual_model == "const":
        qual = np.full((B, L), ord("I"), np.uint8)
    elif qual_model == "uniform":
        qual = rng.integers(33, 127, size=(B, L)).astype(np.uint8)
    else:
        base = 70 - (np.arange(L) // 8)
        qual = (base[None, :]
                + rng.integers(-3, 4, size=(B, L))).astype(np.uint8)
    mask = np.arange(L)[None, :] < lengths[:, None]
    qual = np.where(mask, qual, 0).astype(np.uint8)

    enc = qualities.encode(qual, lengths, order=order, T_target=256)
    dec = qualities.decode(enc, lengths)
    np.testing.assert_array_equal(dec, qual)


def test_quality_codec_beats_zlib_on_structured():
    import zlib
    rng = np.random.default_rng(4)
    B, L = 512, 100
    lengths = np.full(B, L, np.int32)
    base = 70 - (np.arange(L) // 8)
    qual = (base[None, :] + rng.integers(-2, 3, size=(B, L))).astype(np.uint8)
    enc = qualities.encode(qual, lengths, order=1)
    rans_bytes = enc.payload_bytes()
    z = len(zlib.compress(qual.tobytes(), 6))
    assert rans_bytes < z, (rans_bytes, z)


def test_binned_quals_collapse(tmp_path):
    """Modern Illumina emits ~4 distinct quality values; the context
    coder must get well under 1 bit/symbol there (the reference's
    adaptive AC does too — parity on the realistic case)."""
    from scalce_tpu.config import Config
    from scalce_tpu.pipeline import driver
    from scalce_tpu.utils.synth import synth_fastq
    payload = synth_fastq(8192, 100, seed=96, qual_model="binned")
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    cfg = Config(mode="compress", inputs=(str(inp),),
                 output=str(tmp_path / "o"), block_reads=1 << 13)
    st = driver.compress(cfg)
    bits_per_q = st.stream_bytes["q"] * 8 / (8192 * 100)
    assert bits_per_q < 1.0, bits_per_q
    dcfg = Config(mode="decompress", inputs=(str(tmp_path / "o.00.scalcer"),),
                  output=str(tmp_path / "d"), block_reads=1 << 13,
                  keep_order=True)
    driver.decompress(dcfg)
    assert (tmp_path / "d.fastq").read_bytes() == payload


def test_pallas_encode_matches_xla_scan():
    """The Pallas rANS encode kernel must be bit-identical to the
    lax.scan path (interpret mode on CPU; compiled on TPU)."""
    from scalce_tpu.ops import rans_pallas
    if not rans_pallas.PALLAS_OK:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(7)
    T, N = 512, 256
    n_ctx, n_syms = 8, 16
    S = T * N
    sym = rng.integers(0, n_syms, size=S)
    ctx = rng.integers(0, n_ctx, size=S)
    counts = np.zeros((n_ctx, n_syms), np.int64)
    np.add.at(counts, (ctx, sym), 1)
    freq, cum, _ = entropy.tables_from_counts(counts, n_ctx, n_syms,
                                              build_lut=False)
    flut = jnp.asarray(freq.reshape(-1))
    clut = jnp.asarray(cum.reshape(-1))
    sym_j = jnp.asarray(sym, jnp.uint32)
    ctx_j = jnp.asarray(ctx, jnp.uint32)

    states_ref, words_ref, emits_ref = rans.rans_encode(
        sym_j, ctx_j, flut, clut, n_syms, T)

    idx = ctx_j * jnp.uint32(n_syms) + sym_j
    f_all = flut[idx].reshape(N, T).T
    c_all = clut[idx].reshape(N, T).T
    # override tile sizes for the small test shapes
    old_nt, old_tt = rans_pallas._NT, rans_pallas._TT
    rans_pallas._NT, rans_pallas._TT = 128, 64
    try:
        states, words, emits = rans_pallas.encode_scan_pallas(
            f_all, c_all, interpret=True)
    finally:
        rans_pallas._NT, rans_pallas._TT = old_nt, old_tt
    np.testing.assert_array_equal(np.asarray(states), np.asarray(states_ref))
    np.testing.assert_array_equal(np.asarray(emits), np.asarray(emits_ref))
    # words only meaningful where emitted
    e = np.asarray(emits_ref)
    np.testing.assert_array_equal(np.asarray(words)[e],
                                  np.asarray(words_ref)[e])


def test_contexts_win_on_correlated_quals():
    """Previous-symbol contexts must exploit serial correlation (the
    regime where the reference's higher-order adaptive AC earns its
    keep): the same values shuffled within each read must cost far more
    than the correlated original, and the auto-selected order must not
    lose to either fixed order."""
    rng = np.random.default_rng(11)
    B, L = 4096, 100
    lengths = np.full(B, L, np.int32)
    # AR(1)-style: quality walks slowly -> prev symbol is highly
    # informative
    steps = rng.integers(-1, 2, size=(B, L))
    q = np.clip(35 + np.cumsum(steps, axis=1), 2, 60)
    qual = (q + 33).astype(np.uint8)
    shuf = qual.copy()
    rng.permuted(shuf, axis=1, out=shuf)
    sizes = {}
    for order in (1, 2):
        enc = qualities.encode(qual, lengths, order=order)
        sizes[order] = enc.payload_bytes()
        dec = qualities.decode(enc, lengths)
        np.testing.assert_array_equal(dec, qual)
    sz_shuf = qualities.encode(shuf, lengths, order=1).payload_bytes()
    assert min(sizes.values()) < 0.6 * sz_shuf, (sizes, sz_shuf)
    # host auto-selection (order=0) must match the better fixed order
    enc_auto = qualities.encode_host(qual, lengths, order=0)
    assert enc_auto.payload_bytes() <= min(sizes.values()) * 1.01, \
        (enc_auto.payload_bytes(), sizes)
    np.testing.assert_array_equal(
        qualities.decode_host(enc_auto, lengths), qual)


@pytest.mark.parametrize("order", [1, 2])
def test_host_codec_bit_identical_to_device(order):
    """The host quality codec must emit EXACTLY the device path's bytes
    (same tables, same states, same word streams) — this is what makes
    Config.qual_on_device a pure placement choice, not a format fork."""
    rng = np.random.default_rng(99)
    B, L = 64, 48
    qual = (rng.integers(33, 74, size=(B, L))).astype(np.uint8)
    lengths = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None], qual, 0).astype(np.uint8)

    dev = qualities.encode(qual, lengths, order=order)
    host = qualities.encode_host(qual, lengths, order=order)
    np.testing.assert_array_equal(host.freq, dev.freq)
    np.testing.assert_array_equal(host.states, dev.states)
    np.testing.assert_array_equal(host.counts, dev.counts)
    np.testing.assert_array_equal(host.words, dev.words)
    assert (host.B, host.L, host.T, host.order) == \
        (dev.B, dev.L, dev.T, dev.order)

    # and both decoders invert it
    np.testing.assert_array_equal(qualities.decode_host(dev, lengths), qual)
    np.testing.assert_array_equal(qualities.decode(host, lengths), qual)


def test_host_codec_with_lossy_map():
    from scalce_tpu.models import lossy
    rng = np.random.default_rng(7)
    B, L = 32, 32
    qual = (rng.integers(35, 70, size=(B, L))).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    hist = lossy.sample_histogram(qual, lengths, B)
    qmap = lossy.build_quant_map(hist, 30)
    dev = qualities.encode(qmap[qual], lengths, order=1)
    host = qualities.encode_host(qual, lengths, order=1, qual_map=qmap)
    np.testing.assert_array_equal(host.words, dev.words)
    np.testing.assert_array_equal(host.states, dev.states)
    got = qualities.decode_host(host, lengths)
    np.testing.assert_array_equal(got, qmap[qual])


def test_order_auto_selection():
    """order=0 picks the cheaper model per block: correlated qualities
    should choose order 2, position-only noise order 1 — and both must
    round-trip through the host decoder."""
    rng = np.random.default_rng(123)
    B, L = 256, 64
    lengths = np.full(B, L, np.int32)
    # strongly prev-correlated walk
    steps = rng.integers(-1, 2, size=(B, L)).cumsum(axis=1)
    corr = np.clip(40 + steps, 33, 104).astype(np.uint8)
    enc_c = qualities.encode_host(corr, lengths, order=0)
    np.testing.assert_array_equal(qualities.decode_host(enc_c, lengths),
                                  corr)
    # iid noise: order-2 table buys nothing
    iid = rng.integers(35, 70, size=(B, L)).astype(np.uint8)
    enc_i = qualities.encode_host(iid, lengths, order=0)
    assert enc_i.order == 1
    np.testing.assert_array_equal(qualities.decode_host(enc_i, lengths),
                                  iid)
    # the auto pick for correlated data must not LOSE to the fixed orders
    sizes = {o: qualities.encode_host(corr, lengths, order=o).payload_bytes()
             for o in (1, 2)}
    assert enc_c.payload_bytes() <= max(sizes.values())


def test_native_qual_codec_matches_numpy():
    """The C kernels and the NumPy reference implementation must agree
    exactly (the NumPy path is the executable spec)."""
    if not qualities._NATIVE_Q:
        pytest.skip("native lib unavailable")
    from scalce_tpu.models import entropy
    rng = np.random.default_rng(5)
    B, L = 128, 32
    qual = rng.integers(33, 90, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(2, L + 1, size=B).astype(np.int64)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None], qual, 0).astype(np.uint8)
    for order in (1, 2):
        C = qualities.n_contexts(order)
        sym_n, ctx_n, counts_n = qualities._native.qual_sym_ctx_hist(
            qual, lengths, L, order, C)
        sym_p, ctx_p, _ = qualities._sym_ctx_np(qual, lengths, order)
        np.testing.assert_array_equal(sym_n, sym_p.reshape(-1))
        np.testing.assert_array_equal(ctx_n, ctx_p.reshape(-1))
        idx = ctx_p.reshape(-1).astype(np.int64) * qualities.N_SYMS + \
            sym_p.reshape(-1)
        np.testing.assert_array_equal(
            counts_n, np.bincount(idx, minlength=C * qualities.N_SYMS))
        freq, cum = entropy.host_normalize(counts_n, C, qualities.N_SYMS)
        T = qualities.pick_T(B, L)
        st_n, wc_n, w_n = qualities._native.rans_encode_lanes(
            sym_n, ctx_n, freq, cum, B * L // T, T)
        st_p, words_p, emits_p = qualities._host_rans_encode(idx, freq,
                                                             cum, T)
        np.testing.assert_array_equal(st_n, st_p)
        np.testing.assert_array_equal(wc_n, emits_p.T.sum(axis=1))
        np.testing.assert_array_equal(w_n, words_p.T[emits_p.T])
        lut = entropy.build_decode_lut(freq, entropy.freq_to_cum(freq))
        got = qualities._native.rans_decode_lanes(
            st_n, w_n, wc_n, lut, lengths, B, L, T, order)
        np.testing.assert_array_equal(
            got, np.where(col < lengths[:, None], qual, 0))


def test_grid_direct_encoder_matches_grid_path():
    """The grid-direct native encoder (inline contexts + reciprocal
    divide + lane interleave, native.rans_encode_qual) must emit the
    exact bytes of the grid-based native path for every order,
    including ragged lengths and the dual-order histogram."""
    if not qualities._NATIVE_Q or not hasattr(qualities._native,
                                              "rans_encode_qual"):
        pytest.skip("native lib unavailable")
    from scalce_tpu.models import entropy
    native = qualities._native
    rng = np.random.default_rng(11)
    B, L = 256, 64
    qual = rng.integers(33, 120, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(1, L + 1, size=B).astype(np.int64)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None], qual, 0).astype(np.uint8)
    c1, c2, c3 = native.qual_hist3(qual, lengths, L)
    T = qualities.pick_T(B, L)
    for order, counts in ((1, c1), (2, c2), (3, c3)):
        C = qualities.n_contexts(order)
        sym, ctx, counts_ref = native.qual_sym_ctx_hist(qual, lengths, L,
                                                        order, C)
        np.testing.assert_array_equal(counts, counts_ref)
        freq, cum = entropy.host_normalize(counts, C, qualities.N_SYMS)
        st_g, wc_g, w_g = native.rans_encode_lanes(sym, ctx, freq, cum,
                                                   B * L // T, T)
        st_d, wc_d, w_d = native.rans_encode_qual(qual, lengths, freq,
                                                  cum, T, order)
        np.testing.assert_array_equal(st_d, st_g)
        np.testing.assert_array_equal(wc_d, wc_g)
        np.testing.assert_array_equal(w_d, w_g)


def test_avx512_qual_encoder_bit_identical_to_scalar():
    """The AVX-512 16x2-lane encoder must produce byte-identical
    streams to the scalar C path for every (order, shape, raggedness)
    — including tail lane groups (N % 32 != 0)."""
    import numpy as np
    from scalce_tpu import native
    from scalce_tpu.models import entropy
    from scalce_tpu.streams import qualities

    if not (native.AVAILABLE
            and hasattr(native._lib, "rans_encode_qual_v")):
        import pytest
        pytest.skip("AVX-512 build not available on this host")
    rng = np.random.default_rng(11)
    for B, L in [(512, 96), (96, 48), (2048, 128)]:
        q = rng.integers(33, 127, size=(B, L)).astype(np.uint8)
        lens = rng.integers(0, L + 1, size=B).astype(np.int32)
        col = np.arange(L)[None, :]
        q = np.where(col < lens[:, None], q, 0).astype(np.uint8)
        for order in (1, 2):
            sym, ctx, _ = qualities._sym_ctx_np(q, lens, order)
            idx = (ctx.reshape(-1).astype(np.int64) * qualities.N_SYMS
                   + sym.reshape(-1))
            counts = np.bincount(
                idx, minlength=qualities.n_contexts(order)
                * qualities.N_SYMS)
            freq, cum = entropy.host_normalize(
                counts, qualities.n_contexts(order), qualities.N_SYMS)
            f32 = np.ascontiguousarray(
                freq.reshape(-1).astype(np.uint32))
            c32 = np.ascontiguousarray(cum.reshape(-1).astype(np.uint32))
            T = qualities.pick_T(B, L, 1024)
            N = B * L // T
            q8 = np.ascontiguousarray(q).reshape(-1)
            l64 = lens.astype(np.int64)
            tab = np.empty(f32.shape[0] * 16, np.uint8)
            native._lib.build_enc_table(f32, c32, f32.shape[0], tab)
            sts = np.empty(N, np.uint32)
            wcs = np.empty(N, np.int64)
            wcats = np.empty(N * T, np.uint16)
            stv = np.empty(N, np.uint32)
            wcv = np.empty(N, np.int64)
            wcatv = np.empty(N * T, np.uint16)
            p64 = native._perm_or_ident(None, B)
            m8 = native._qmap_or_ident(None)
            ts = native._lib.rans_encode_qual(q8, l64, p64, m8, tab, B,
                                              L, T, order, sts, wcs,
                                              wcats)
            tv = native._lib.rans_encode_qual_v(q8, l64, p64, m8, f32,
                                                c32, B, L, T, order,
                                                stv, wcv, wcatv)
            assert ts == tv
            assert np.array_equal(sts, stv)
            assert np.array_equal(wcs, wcv)
            assert np.array_equal(wcats[:ts], wcatv[:tv])


def test_avx512_qual_decoder_matches_scalar():
    """rans_decode_lanes_v (flat-LUT AVX-512) must reproduce exactly
    what the scalar two-level decoder produces — including ragged rows,
    tail lane groups, and both orders."""
    import numpy as np
    from scalce_tpu import native
    from scalce_tpu.models import entropy
    from scalce_tpu.streams import qualities

    if not (native.AVAILABLE
            and hasattr(native._lib, "rans_decode_lanes_v")):
        import pytest
        pytest.skip("AVX-512 build not available on this host")
    rng = np.random.default_rng(21)
    for B, L in [(512, 96), (96, 48)]:
        q = rng.integers(33, 127, size=(B, L)).astype(np.uint8)
        lens = rng.integers(0, L + 1, size=B).astype(np.int32)
        col = np.arange(L)[None, :]
        q = np.where(col < lens[:, None], q, 0).astype(np.uint8)
        for order in (1, 2):
            enc = qualities.encode_host(q, lens, order=order)
            cum = entropy.freq_to_cum(enc.freq)
            C = qualities.n_contexts(order)
            f16 = np.ascontiguousarray(
                enc.freq.reshape(C, qualities.N_SYMS).astype(np.uint16)
            ).reshape(-1)
            c16 = np.ascontiguousarray(
                cum.reshape(C, qualities.N_SYMS).astype(np.uint16)
            ).reshape(-1)
            sym8 = np.empty(C * 256, np.uint8)
            native._lib.build_sym8(c16, C, qualities.N_SYMS, sym8)
            qual_s = np.empty(B * L, np.uint8)
            native._lib.rans_decode_lanes2(
                np.ascontiguousarray(enc.states.astype(np.uint32)),
                np.ascontiguousarray(enc.words),
                np.ascontiguousarray(enc.counts.astype(np.int64)),
                sym8, f16, c16,
                np.ascontiguousarray(lens.astype(np.int64)),
                B, L, enc.T, order, qual_s)
            wpad = np.empty(enc.words.shape[0] + 1, np.uint16)
            wpad[:-1] = enc.words
            wpad[-1] = 0
            qual_v = np.empty(B * L, np.uint8)
            rc = native._lib.rans_decode_lanes_v(
                np.ascontiguousarray(enc.states.astype(np.uint32)),
                wpad,
                np.ascontiguousarray(enc.counts.astype(np.int64)),
                f16, c16,
                np.ascontiguousarray(lens.astype(np.int64)),
                B, L, enc.T, order, C, qual_v)
            assert rc == 0
            assert np.array_equal(qual_s, qual_v)
            assert np.array_equal(qual_v.reshape(B, L), q)


def test_native_qual_hist3_matches_numpy():
    """qual_hist3 (fused triple-order histogram) must reproduce the
    numpy sym/ctx histogram exactly — it decides order auto-selection
    and the coder tables, i.e. output bytes."""
    import numpy as np
    from scalce_tpu import native
    from scalce_tpu.streams import qualities

    if not (native.AVAILABLE and hasattr(native, "qual_hist3")):
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(31)
    for B, L in [(515, 96), (7, 48), (33, 8)]:
        q = rng.integers(33, 127, size=(B, L)).astype(np.uint8)
        lens = rng.integers(0, L + 1, size=B).astype(np.int64)
        col = np.arange(L)[None, :]
        q = np.where(col < lens[:, None], q, 0).astype(np.uint8)
        c1, c2, c3 = native.qual_hist3(q, lens, L)
        for order, got in ((1, c1), (2, c2), (3, c3)):
            ref = np.zeros(qualities.n_contexts(order) * 94, np.int64)
            sym, ctx, _ = qualities._sym_ctx_np(q, lens.astype(np.int32),
                                                order)
            idx = (ctx.reshape(-1).astype(np.int64) * 94
                   + sym.reshape(-1))
            np.add.at(ref, idx, 1)
            assert np.array_equal(got, ref)


def test_mask_coder_paths_bit_identical():
    """The mask stream's AVX-512, scalar-C, and numpy coders must all
    emit/decode identical bytes — archives written by any host must
    match (the multi-host merge byte-identity depends on it)."""
    import numpy as np
    import pytest

    import scalce_tpu.streams.seqs as S
    from scalce_tpu import native
    from scalce_tpu.models import entropy

    rng = np.random.default_rng(41)
    nb = 200_000
    mb = np.full(nb, 255, np.uint8)
    noise = rng.random(nb) < 0.08
    mb[noise] = rng.integers(0, 256, size=int(noise.sum()),
                             dtype=np.uint8)
    enc = S._encode_mask_rans(mb, "gz")     # native (AVX if available)
    assert enc is not None
    nat = S._NATIVE
    S._NATIVE = False
    try:
        enc_np = S._encode_mask_rans(mb, "gz")
    finally:
        S._NATIVE = nat
    for a, b in zip(enc, enc_np):
        assert np.array_equal(a, b)
    if native.AVAILABLE and hasattr(native._lib, "rans_encode_mask_v"):
        # scalar C vs vector C directly
        N = (nb + S._T_MASK - 1) // S._T_MASK
        counts = native.mask_hist(mb, nb, N, S._T_MASK)
        freq, cum = entropy.host_normalize(counts, S._MASK_CTX, 256)
        f32 = np.ascontiguousarray(freq.reshape(-1).astype(np.uint32))
        c32 = np.ascontiguousarray(cum.reshape(-1).astype(np.uint32))
        rcp = np.empty(f32.shape[0], np.uint64)
        native._lib.build_rcp44(f32, f32.shape[0], rcp)
        sts = np.empty(N, np.uint32)
        wcs = np.empty(N, np.int64)
        wcats = np.empty(N * S._T_MASK, np.uint16)
        ts = native._lib.rans_encode_mask(mb, nb, N, S._T_MASK, f32,
                                          c32, rcp, sts, wcs, wcats)
        assert np.array_equal(sts, enc[1])
        assert np.array_equal(wcs.astype(np.uint16), enc[2])
        assert np.array_equal(wcats[:ts], enc[3])
        # decode: vector (via wrapper) vs scalar C vs numpy
        a = {"mask_freq": enc[0], "mask_states": enc[1],
             "mask_counts": enc[2], "mask_words": enc[3]}
        dec_v = S._decode_mask_rans(dict(a), nb)
        lut = native.build_flat_lut(freq.astype(np.uint32),
                                    cum.astype(np.uint32),
                                    S._MASK_CTX, 256)
        dec_s = np.zeros(nb, np.uint8)
        native._lib.rans_decode_mask(
            enc[1].astype(np.uint32), enc[3],
            enc[2].astype(np.int64), lut, nb, N, S._T_MASK, dec_s)
        assert np.array_equal(dec_v, dec_s)
        assert np.array_equal(dec_v, mb)
    S._NATIVE = False
    try:
        a = {"mask_freq": enc[0], "mask_states": enc[1],
             "mask_counts": enc[2], "mask_words": enc[3]}
        dec_np = S._decode_mask_rans(a, nb)
    finally:
        S._NATIVE = nat
    assert np.array_equal(dec_np, mb)


def test_encode_host_fused_perm_map_identity():
    """encode_host with perm= / qual_map= (fused into the native row
    walk) must emit exactly the bytes of materializing the permuted,
    remapped grid first — for both orders, auto, ragged rows, and the
    pure-numpy fallback."""
    import numpy as np
    from scalce_tpu.streams import qualities

    rng = np.random.default_rng(17)
    B, L = 1024, 96
    q = rng.integers(33, 74, size=(B, L)).astype(np.uint8)
    lens_o = rng.integers(1, L + 1, size=B).astype(np.int64)
    col = np.arange(L)[None, :]
    q = np.where(col < lens_o[:, None], q, 0).astype(np.uint8)
    perm = rng.permutation(B).astype(np.int64)
    lens = lens_o[perm]
    qmap = np.minimum(np.arange(256), 70).astype(np.uint8)  # lossy-ish

    def key(e):
        return (e.order, e.freq.tobytes(), e.states.tobytes(),
                np.asarray(e.counts).tobytes(), e.words.tobytes())

    for order in (0, 1, 2):
        for m in (None, qmap):
            ref_grid = q[perm] if m is None else m[q[perm]]
            ref = qualities.encode_host(ref_grid, lens, order=order)
            fused = qualities.encode_host(q, lens, order=order,
                                          qual_map=m, perm=perm)
            assert key(ref) == key(fused), (order, m is not None)
    # numpy fallback path must agree too (no native)
    nat = qualities._NATIVE_Q
    qualities._NATIVE_Q = False
    try:
        ref = qualities.encode_host(qmap[q[perm]], lens, order=0)
        fused = qualities.encode_host(q, lens, order=0, qual_map=qmap,
                                      perm=perm)
    finally:
        qualities._NATIVE_Q = nat
    assert key(ref) == key(fused)


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("T_factor", [4, 32])
def test_pallas_decode_matches_xla_scan(order, T_factor):
    """The Mosaic decode kernel (one-hot-matmul row select + compare
    searchsorted, VERDICT r2 #3) must be bit-identical to the XLA scan
    path through the full quality codec (interpret mode on CPU).
    T_factor=32 makes T=1024 > TT2=512, covering the MULTI-time-tile
    grid (scratch state carried across tiles, per-tile out spec) that
    production's T=2048 always uses."""
    from scalce_tpu.ops import rans_decode_pallas as rdp
    from scalce_tpu.streams import qualities as Q
    if not rdp.PALLAS_OK:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(11)
    B, L = (64, 32) if T_factor == 4 else (512, 32)   # keep N >= NT floor
    # serially-correlated quals so order-1/2 contexts are exercised,
    # plus var-len padding rows
    base = np.clip(np.cumsum(rng.integers(-2, 3, size=(B, L)), axis=1)
                   + 38, 2, 80).astype(np.uint8) + 33
    lengths = rng.integers(8, L + 1, size=B).astype(np.int32)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None], base, 0).astype(np.uint8)
    enc = Q.encode(qual, lengths, order=order, T_target=T_factor * L)
    N = enc.states.shape[0]
    # reference: XLA scan decode
    ref = Q.decode_host(enc, lengths)
    # pallas (interpret)
    W = max(128, int(enc.counts.max()) + 1)
    from scalce_tpu.io.fastq import ragged_scatter
    words_padded = np.zeros((N, W), dtype=np.uint16)
    ragged_scatter(words_padded.reshape(-1),
                   np.arange(N, dtype=np.int64) * W, enc.words,
                   enc.counts.astype(np.int64))
    old_nt = rdp._NT
    rdp._NT = 16
    try:
        syms = rdp.decode_scan_pallas(
            jnp.asarray(enc.states)[None], jnp.asarray(words_padded)[None],
            jnp.asarray(enc.freq)[None], jnp.asarray(lengths)[None],
            order, enc.T, enc.L, interpret=True)[0]
    finally:
        rdp._NT = old_nt
    got = np.asarray(Q._qual_from_syms(syms, jnp.asarray(lengths),
                                       enc.T, B, L))
    np.testing.assert_array_equal(got, ref)


def test_order3_cross_path_identity_and_roundtrip():
    """Order 3 (pos32 x full prev1) must round-trip and be bit-identical
    across the native, numpy, and device (XLA scan) coders — same
    contract the other orders carry."""
    rng = np.random.default_rng(17)
    B, L = 512, 64
    # strong fine-position structure: mean jumps every 4 columns
    means = (rng.integers(5, 70, size=(1, (L + 3) // 4))
             .repeat(4, axis=1)[:, :L])
    q = np.clip(means + rng.integers(-2, 3, size=(B, L)), 2, 80) + 33
    lengths = rng.integers(8, L + 1, size=B).astype(np.int32)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None], q, 0).astype(np.uint8)

    enc_h = qualities.encode_host(qual, lengths, order=3)
    assert enc_h.order == 3
    assert enc_h.freq.shape[0] == qualities.n_contexts(3) == 3041
    # device (XLA) encode must agree on every stored field
    enc_d = qualities.encode(qual, lengths, order=3)
    np.testing.assert_array_equal(enc_h.freq, enc_d.freq)
    np.testing.assert_array_equal(enc_h.states, enc_d.states)
    np.testing.assert_array_equal(enc_h.words, enc_d.words)
    # round-trip both decode paths
    np.testing.assert_array_equal(qualities.decode_host(enc_h, lengths),
                                  qual)
    np.testing.assert_array_equal(qualities.decode(enc_h, lengths), qual)


def test_auto_order_picks_3_on_fine_position_structure():
    """Auto order selection must pick the pos32 model exactly when fine
    position resolution pays for its 4x table — qualities that are a
    pure function of col/4 with full-range variation."""
    rng = np.random.default_rng(23)
    B, L = 8192, 64
    means = (rng.integers(2, 90, size=(1, L // 4)).repeat(4, axis=1))
    q = np.clip(means + rng.integers(-1, 2, size=(B, L)), 0, 93) + 33
    lengths = np.full(B, L, np.int32)
    enc = qualities.encode_host(q.astype(np.uint8), lengths, order=0)
    assert enc.order == 3
    np.testing.assert_array_equal(
        qualities.decode_host(enc, lengths), q.astype(np.uint8))
    # and smooth AR(1) data must NOT pay the 4x table
    walk = np.clip(np.cumsum(rng.integers(-2, 3, size=(B, L)), axis=1)
                   + 38, 2, 80).astype(np.uint8) + 33
    enc2 = qualities.encode_host(walk, lengths, order=0)
    assert enc2.order in (1, 2)


def test_pallas_histogram_matches_scatter_add():
    """The Mosaic one-hot-matmul histogram (VERDICT r3 #2) must be
    bit-identical to the XLA `.at[].add` fallback (interpret mode on
    CPU; compiled on TPU), including through the quality context model
    at every order."""
    from scalce_tpu.ops import hist_pallas
    if not hist_pallas.PALLAS_OK:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(3)
    # raw kernel vs bincount across awkward sizes (non-tile-multiple S,
    # cells not a multiple of the lane factor, cells < one lane row)
    for S, n_cells in [(10_000, 71_534), (16_384, 285_854), (777, 94),
                       (4096, 131_694), (1, 3)]:
        idx = rng.integers(0, n_cells, S).astype(np.int32)
        ref = np.bincount(idx, minlength=n_cells).astype(np.int32)
        got = np.asarray(hist_pallas.histogram_pallas(
            jnp.asarray(idx), n_cells, interpret=True))
        np.testing.assert_array_equal(got, ref)
    # through sym_ctx_hist: force the gate on (interpret via monkeypatch)
    B, L = 96, 64
    lengths = rng.integers(40, L + 1, B).astype(np.int32)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None],
                    rng.integers(33, 75, (B, L)), 0).astype(np.uint8)
    for order in (1, 2, 3):
        _, _, ref_counts = qualities.sym_ctx_hist(
            jnp.asarray(qual), jnp.asarray(lengths), order)
        n_cells = qualities.n_contexts(order) * qualities.N_SYMS
        idx_np = None
        sym, ctx, _ = qualities._sym_ctx_np(qual, lengths, order)
        idx_np = (ctx.reshape(-1).astype(np.int64) * qualities.N_SYMS
                  + sym.reshape(-1))
        got = np.asarray(hist_pallas.histogram_pallas(
            jnp.asarray(idx_np.astype(np.int32)), n_cells, interpret=True))
        np.testing.assert_array_equal(got, np.asarray(ref_counts))


def test_hist_pallas_eligibility_gate():
    """Off-TPU and tiny inputs stay on the scatter-add path; realistic
    quality-histogram shapes fit the VMEM budget."""
    from scalce_tpu.ops import hist_pallas
    if not hist_pallas.PALLAS_OK:
        pytest.skip("pallas unavailable")
    assert not hist_pallas.eligible(1 << 20, 71_534, "cpu")
    assert not hist_pallas.eligible(100, 71_534, "tpu")
    for order in (1, 2, 3):
        cells = qualities.n_contexts(order) * qualities.N_SYMS
        assert hist_pallas.eligible(131072 * 100, cells, "tpu")


def test_hiseq_profile_order3_wins_and_auto_picks_it():
    """VERDICT r3 #4: the order-3 machinery must have a demonstrated win
    on a realistic cycle-correlated profile (per-cycle systematic column
    anomalies + position-dependent variance — utils/synth.py 'hiseq'),
    and the auto-trial must find it.  Measured at round 4: o3 beats o1
    by ~6% on the quality stream there, while on the smooth 'illumina'
    AR(1) profile o1 stays the pick (no regression)."""
    import os
    import tempfile
    from scalce_tpu.io import fastq as fq
    from scalce_tpu.utils.synth import synth_fastq
    payload = synth_fastq(1 << 14, 100, seed=11, genome_len=200_000,
                          n_rate=0.001, qual_model="hiseq")
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "in.fastq")
    with open(path, "wb") as f:
        f.write(payload)
    block = next(fq.iter_blocks(path, 1 << 14, 128))
    qual, lengths = block.qual, block.lengths
    enc0 = qualities.encode_host(qual, lengths, order=0)
    assert enc0.order == 3
    np.testing.assert_array_equal(qualities.decode_host(enc0, lengths),
                                  qual)
    # the pick must be a real win, not a tie: forced o1 strictly larger
    enc1 = qualities.encode_host(qual, lengths, order=1)
    s0 = len(qualities.payload(enc0))
    s1 = len(qualities.payload(enc1))
    assert s0 < s1, (s0, s1)
    # ratio gate on the profile (measured 2.70x at 64k reads; generous
    # floor so smaller test blocks and table overhead keep headroom)
    raw = int(lengths.sum())
    assert raw / s0 > 2.3, raw / s0


def test_table_cost_probe_zlib_fallback_tracks_analytic(monkeypatch):
    """The env-gated zlib Z_RLE table-cost probe (ADVICE r4) must stay
    available and track the analytic model on realistic tables (gate at
    35% — measured 19-27% on this grid; the auto-trial's table-cost
    margins between orders are far wider than that, so availability +
    rough agreement is what matters, not the fitted constants)."""
    rng = np.random.default_rng(7)
    B, L = 8192, 100
    base = 38 - (np.arange(L) * 8 / L)          # bench-like profile
    q = np.clip(base[None, :] + rng.normal(0, 3, (B, L)), 2, 40)
    qual = (q + 33).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    for order in (1, 2, 3):
        C = qualities.n_contexts(order)
        sym, ctx, _ = qualities._sym_ctx_np(qual, lengths, order)
        idx = ctx.reshape(-1).astype(np.int64) * qualities.N_SYMS \
            + sym.reshape(-1)
        counts = np.bincount(idx, minlength=C * qualities.N_SYMS)
        freq, _ = entropy.host_normalize(counts, C, qualities.N_SYMS)
        analytic = qualities._table_cost_bytes(freq)
        monkeypatch.setattr(qualities, "_TABLE_PROBE_ZLIB", True)
        measured = qualities._table_cost_bytes(freq)
        monkeypatch.setattr(qualities, "_TABLE_PROBE_ZLIB", False)
        assert measured > 0 and analytic > 0
        assert abs(measured - analytic) / measured < 0.35, \
            (order, analytic, measured)


def test_slab_histogram_matches_scatter_add():
    """The round-5 slab-factored histogram (VERDICT r4 #2: each symbol
    matmuls into its position bucket's dense [prev, sym] slab — 8x less
    padded MXU work than the flat-factored kernel, measured 38.9 ->
    4.7 ms on v5e) must be bit-identical to the scatter-add through the
    quality context model at every order, on ragged lengths, and on
    both regroup paths (uniform 128-wide grid and the sliced general
    path, e.g. an auto-sized 160-wide grid)."""
    from scalce_tpu.ops import hist_pallas
    if not hist_pallas.PALLAS_OK:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(5)
    for B, L, lmin in ((96, 128, 40), (64, 160, 100), (128, 64, 17)):
        lengths = rng.integers(lmin, L + 1, B).astype(np.int32)
        col = np.arange(L)[None, :]
        qual = np.where(col < lengths[:, None],
                        rng.integers(33, 75, (B, L)), 0).astype(np.uint8)
        for order in (1, 2, 3):
            sym, ctx, ref_counts = qualities.sym_ctx_hist(
                jnp.asarray(qual), jnp.asarray(lengths), order)
            R, PB, cd = qualities._slab_spec(order)
            got = np.asarray(hist_pallas.hist_ctx_slab_pallas(
                sym, ctx, R, PB, cd, n_syms=qualities.N_SYMS,
                interpret=True))
            np.testing.assert_array_equal(got, np.asarray(ref_counts),
                                          err_msg=f"B={B} L={L} o={order}")
    # eligibility: tiny inputs and non-TPU backends stay on the exact
    # fallback paths
    assert not hist_pallas.slab_eligible(1 << 20, 95, "cpu")
    assert not hist_pallas.slab_eligible(100, 95, "tpu")
    for order in (1, 2, 3):
        R, _, _ = qualities._slab_spec(order)
        assert hist_pallas.slab_eligible(131072 * 128, R, "tpu")


def test_tbl_encode_kernel_matches_gather_path():
    """The round-5 table-resident Mosaic encode (slab-selected (f, cum)
    via one-hot matmul over three bf16-exact byte planes of
    v = f*4096 + cum) must be bit-identical to the pre-gathered-table
    path across orders and ragged lengths (interpret mode on CPU;
    compiled identity is covered by the TPU placement validation)."""
    from scalce_tpu.ops import rans_pallas
    if not rans_pallas.PALLAS_OK:
        pytest.skip("pallas unavailable")
    import jax
    rng = np.random.default_rng(11)
    B, L = 128, 64
    lengths = rng.integers(30, L + 1, B).astype(np.int32)
    col = np.arange(L)[None, :]
    qual = np.where(col < lengths[:, None],
                    rng.integers(33, 75, (B, L)), 0).astype(np.uint8)
    for order in (1, 2, 3):
        sym, ctx, counts = qualities.sym_ctx_hist(
            jnp.asarray(qual), jnp.asarray(lengths), order)
        freq_dev, cum_dev = qualities._normalize_pass(counts, order)
        T = qualities.pick_T(B, L, 256)
        # reference: gather path
        states_r, packed_r, wc_r = qualities._encode_pass(
            sym, ctx, freq_dev.reshape(-1), cum_dev.reshape(-1), T)
        # slab path, interpret-mode kernel
        R, PB, cd = qualities._slab_spec(order)
        colj = jnp.arange(L, dtype=jnp.int32)[None, :]
        pbc = jnp.minimum(colj // cd, PB - 1)
        ctx_i = ctx.astype(jnp.int32)
        pidx = jnp.where(ctx_i == 0, R, ctx_i - 1 - pbc * R)
        N = B * L // T
        sym_l = sym.astype(jnp.int32).reshape(N, T).T
        pidx_l = pidx.reshape(N, T).T
        tbl = rans_pallas.build_encode_slabs(
            freq_dev.reshape(-1, qualities.N_SYMS),
            cum_dev.reshape(-1, qualities.N_SYMS), R, PB)
        old_nt, old_tt = rans_pallas._NT, rans_pallas._TT
        rans_pallas._NT, rans_pallas._TT = 128, 64
        try:
            states, words, emits = rans_pallas.encode_scan_tbl_pallas(
                sym_l, pidx_l, tbl, T, L, cd, PB, interpret=True)
        finally:
            rans_pallas._NT, rans_pallas._TT = old_nt, old_tt
        packed, wc = rans.compact_emissions(words, emits)
        np.testing.assert_array_equal(np.asarray(states),
                                      np.asarray(states_r),
                                      err_msg=f"states o={order}")
        np.testing.assert_array_equal(np.asarray(wc), np.asarray(wc_r),
                                      err_msg=f"counts o={order}")
        np.testing.assert_array_equal(np.asarray(packed),
                                      np.asarray(packed_r),
                                      err_msg=f"packed o={order}")
