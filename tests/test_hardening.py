"""Regression tests for corrupt-container hardening (code-review r2):
targeted mutations of the fields the random byte-flip fuzz rarely hits
— quality-stream dims/counts, mask bits past read length, exception
positions in the padding region."""

import os

import numpy as np
import pytest

from scalce_tpu import container
from scalce_tpu.streams import qualities, seqs


def _legit_qual_payload(B=32, L=16):
    rng = np.random.default_rng(5)
    qual = (rng.integers(33, 74, size=(B, L))).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    enc = qualities.encode_host(qual, lengths, order=1)
    return qualities.payload(enc), qual, lengths


def _mutate_qual_payload(blob, **updates):
    a = container.unpack_arrays(blob)
    arrays = {k: v for k, v in a.items()}
    arrays.update(updates)
    return container.pack_arrays(arrays, deflate=(), level=1, backend="gz")


@pytest.mark.parametrize("dims", [
    [32, 16, 0, 1],        # T = 0: native decoder divides by T (SIGFPE)
    [32, 16, 16, 7],       # bad order indexes undersized tables
    [32, 0, 16, 1],        # L = 0
    [32, 16, 12, 1],       # T not a multiple of L
    [-1, 16, 16, 1],       # negative B
])
def test_corrupt_qual_dims_raise(dims):
    blob, _, _ = _legit_qual_payload()
    bad = _mutate_qual_payload(blob, dims=np.asarray(dims, np.int64))
    with pytest.raises(ValueError):
        qualities.parse(bad)


def test_corrupt_qual_counts_words_mismatch_raises():
    blob, _, lengths = _legit_qual_payload()
    a = container.unpack_arrays(blob)
    counts = a["counts"].copy()
    if counts.size == 0:
        pytest.skip("no lanes")
    counts[0] += 7            # sum(counts) now exceeds len(words)
    bad = _mutate_qual_payload(blob, counts=counts)
    with pytest.raises(ValueError):
        qualities.parse(bad)


def test_corrupt_qual_missing_field_raises():
    blob, _, _ = _legit_qual_payload()
    a = container.unpack_arrays(blob)
    for field in ("freq", "states", "counts", "words"):
        arrays = {k: v for k, v in a.items() if k != field}
        bad = container.pack_arrays(arrays, deflate=(), level=1,
                                    backend="gz")
        with pytest.raises(ValueError):
            qualities.parse(bad)


def test_corrupt_qual_truncated_states_raises():
    blob, _, _ = _legit_qual_payload()
    a = container.unpack_arrays(blob)
    bad = _mutate_qual_payload(blob, states=a["states"][:-1])
    with pytest.raises(ValueError):
        qualities.parse(bad)


def test_qual_lengths_b_mismatch_raises():
    blob, _, lengths = _legit_qual_payload()
    enc = qualities.parse(blob)
    with pytest.raises(ValueError):
        qualities.decode_host(enc, lengths[:-3])
    with pytest.raises(ValueError):
        qualities.decode(enc, lengths[:-3])


def _legit_seq_arrays(B=8, L=16):
    """A minimal valid seq payload: every read all-literal (no mask)."""
    n = B
    lens = np.full(n, L - 4, np.int64)      # partial rows exercise the
    n_lits = int(lens.sum())                # boundary-byte tail check
    rng = np.random.default_rng(9)
    lits = rng.integers(0, 4, size=n_lits).astype(np.uint8)
    delta = {
        "mask_bits": np.zeros((n, L // 8), np.uint8),
        "shifts": np.zeros(n, np.int16),
        "pred_k": np.zeros(n, np.uint8),
        "rc_bits": np.zeros((n + 7) // 8, np.uint8),
        "lits": lits,
        "n_lits": n_lits,
    }
    blob = seqs.payload(delta, lens.astype(np.int32), n,
                        np.zeros(0, np.uint64), np.zeros(0, np.uint8),
                        np.arange(n), backend="gz")
    return blob, n, L


def test_mask_past_read_length_rejected_native_and_numpy(monkeypatch):
    """Acceptance must not depend on whether the native library was
    available: a mask bit beyond lengths[i] is corrupt on BOTH paths."""
    blob, n, L = _legit_seq_arrays()
    a = container.unpack_arrays(blob)
    mb = a["mask_bits"].copy()
    mb[2, -1] |= 0x80         # bit at column L-1 >= lens[2] = L-4
    arrays = dict(a)
    arrays["mask_bits"] = mb
    bad = container.pack_arrays(arrays, deflate=(), level=1, backend="gz")
    with pytest.raises(ValueError):
        seqs.parse(bad, n, L)
    monkeypatch.setattr(seqs, "_NATIVE", False)
    with pytest.raises(ValueError):
        seqs.parse(bad, n, L)


def test_render_padding_exception_is_dropped():
    """exc_pos pointing into the padding region (col >= len) must not
    corrupt adjacent record bytes on the native render path — both
    paths drop it."""
    from scalce_tpu.io import fastq as fq
    n, L = 3, 8
    seq = np.zeros((n, L), np.uint8)
    qual = np.full((n, L), 40, np.uint8)
    lengths = np.array([6, 6, 6], np.int32)
    names = fq.Ragged(np.frombuffer(b"r0r1r2", np.uint8).copy(),
                      np.array([0, 2, 4, 6], np.int64))
    # one real exception (row 0 col 1) + one in padding (row 1 col 7)
    exc_pos = np.array([0 * L + 1, 1 * L + 7], np.int64)
    exc_byte = np.frombuffer(b"NX", np.uint8).copy()
    out = bytes(fq.render_fastq_records(seq, qual, lengths, n, exc_pos,
                                        exc_byte, names, None))
    recs = out.split(b"\n")
    assert recs[1] == b"ANAAAA"          # real exception applied
    assert recs[5] == b"AAAAAA"          # padding exception dropped
    assert b"X" not in out


def test_backend_validation_matches_availability():
    from scalce_tpu.config import Config
    from scalce_tpu.io import backend
    assert Config(mode="compress", inputs=("x",),
                  output="y").backend in backend.BACKENDS
    with pytest.raises(ValueError):
        Config(mode="compress", inputs=("x",), output="y",
               backend="lzma")


def test_corrupt_mask_rans_fields_raise():
    """mask_mode=1 blocks must validate lane/table sizes before the
    native mask decode walks them."""
    import numpy as np

    from scalce_tpu.streams import seqs

    rng = np.random.default_rng(3)
    nb = 262144
    mb = np.full(nb, 255, np.uint8)
    noise = rng.random(nb) < 0.08
    mb[noise] = rng.integers(0, 256, size=int(noise.sum()),
                             dtype=np.uint8)
    enc = seqs._encode_mask_rans(mb, "gz")
    assert enc is not None
    freq, states, wc, words = enc
    base = {"mask_freq": freq, "mask_states": states,
            "mask_counts": wc, "mask_words": words}
    assert np.array_equal(seqs._decode_mask_rans(dict(base), nb), mb)
    bad = dict(base)
    bad["mask_states"] = states[:-1]
    with pytest.raises(ValueError):
        seqs._decode_mask_rans(bad, nb)
    bad = dict(base)
    wc2 = wc.copy()
    wc2[0] += 5
    bad["mask_counts"] = wc2
    with pytest.raises(ValueError):
        seqs._decode_mask_rans(bad, nb)
    bad = dict(base)
    bad["mask_freq"] = freq[:-256]
    with pytest.raises(ValueError):
        seqs._decode_mask_rans(bad, nb)


def test_corrupt_name_columns_rejected():
    """Name payloads whose column lengths disagree with their cat sizes
    must raise, not read out of bounds in the native join."""
    import numpy as np
    import pytest
    from scalce_tpu import container
    from scalce_tpu.io.fastq import Ragged, lens_to_offsets
    from scalce_tpu.streams import names as names_stream

    cat = np.frombuffer(b"ab.1cd.2ef.3", np.uint8).copy()
    names = Ragged(cat, lens_to_offsets(np.asarray([4, 4, 4])))
    blob = names_stream.encode(names, 3)
    ok = names_stream.decode(blob)
    assert bytes(ok.cat) == b"ab.1cd.2ef.3"

    a = container.unpack_arrays(blob)
    raw_col = [k for k in a if k.endswith("_cat")]
    if raw_col:                       # shrink a raw column's cat
        k = raw_col[0]
        arrays = {key: v for key, v in a.items()}
        arrays[k] = arrays[k][:-1]
        bad = container.pack_arrays(arrays)
        with pytest.raises(ValueError):
            names_stream.decode(bad)
    # mode-0 raw blob with mismatched lens
    bad = container.pack_arrays({
        "n": np.asarray([2], np.int64),
        "mode": np.asarray([0], np.uint8),
        "raw_cat": np.frombuffer(b"abc", np.uint8),
        "raw_lens": np.asarray([2, 2], np.uint32),
    })
    with pytest.raises(ValueError):
        names_stream.decode(bad)


def test_native_permute_and_mask_helpers():
    import numpy as np
    from scalce_tpu import native
    if not native.AVAILABLE:
        import pytest
        pytest.skip("native unavailable")
    rng = np.random.default_rng(3)
    src = rng.integers(0, 255, size=(257, 36)).astype(np.uint8)
    perm = rng.permutation(257).astype(np.int64)
    assert np.array_equal(native.permute_rows_u8(src, perm), src[perm])
    # mask_tail_check: clean rows pass, a bit past len fails
    mb = np.zeros((5, 4), np.uint8)
    lens = np.asarray([32, 17, 8, 0, 25], np.int64)
    mb[0, :] = 0xFF
    mb[1, 2] = 0x01          # bit 16 < len 17: fine
    assert not native.mask_tail_check(mb, lens)
    mb[1, 2] = 0x02          # bit 17 >= len 17
    assert native.mask_tail_check(mb, lens)
    mb[1, 2] = 0x01
    mb[3, 0] = 1             # len 0 row with any bit
    assert native.mask_tail_check(mb, lens)


def test_format_doc_constants():
    """FORMAT.md and container.py must agree — a format doc that
    contradicts the reader is worse than none (VERDICT r2 weak #3).
    Pins the magic strings, version, readable-version policy, codec
    ids, and the quality context counts the doc documents."""
    import re

    assert container.MAGIC == b"SCLCTPU1"
    assert container.END_MAGIC == b"1UPTCLCS"
    assert container.VERSION == 7
    assert container._READABLE_VERSIONS == (4, 5, 6, 7)
    assert (container._CODEC_NONE, container._CODEC_ZLIB,
            container._CODEC_BZ2, container._CODEC_ZSTD) == (0, 1, 2, 3)
    assert container._CODEC_OF_BACKEND == {"no": 0, "gz": 1, "bz": 2,
                                           "zstd": 3}
    # context counts quoted in the doc
    assert qualities.n_contexts(1) == 761 == 1 + 8 * 95
    assert qualities.n_contexts(2) == 1401 == 1 + 8 * 25 * 7
    assert seqs._LIT_CTX == 17
    # the doc itself names the shipped version and codec ids
    doc = open(os.path.join(os.path.dirname(__file__), "..",
                            "FORMAT.md")).read()
    assert f"version {container.VERSION}" in doc
    assert re.search(r"version=7", doc)
    assert "0=raw, 1=zlib, 2=bzip2, 3=zstd" in doc
    assert "_READABLE_VERSIONS = (4, 5, 6, 7)" in doc


def test_corrupt_side_stream_rans_fields_raise(tmp_path):
    """shv/pkv-coded blocks must validate lane/table sizes before the
    native byte-rANS decode walks them (same contract as the mask
    fields)."""
    from scalce_tpu.config import Config
    from scalce_tpu.pipeline import driver
    from scalce_tpu.utils.synth import synth_fastq

    payload = synth_fastq(2048, 100, seed=31, genome_len=20_000)
    inp = tmp_path / "in.fastq"
    inp.write_bytes(payload)
    driver.compress(Config(mode="compress", inputs=(str(inp),),
                           output=str(tmp_path / "o"), block_reads=2048,
                           core_on_device=False))
    reader = container.TripletReader(str(tmp_path / "o.00.scalcen"))
    (bid, payloads), = list(reader.iter_blocks())
    a = container.unpack_arrays(payloads["r"])
    B = int(reader.meta["block_reads"])
    L = int(reader.meta["max_read_len"])
    seqs.parse(container.pack_arrays(a), B, L)      # sanity: clean parses
    assert "pkv_mode" in a
    if int(a["pkv_mode"][0]) == 1:
        for fld, cut in (("pkv_states", -1), ("pkv_counts", -1)):
            bad = dict(a)
            bad[fld] = a[fld][:cut]
            with pytest.raises(ValueError):
                seqs.parse(container.pack_arrays(bad), B, L)
        bad = dict(a)
        bad["pkv_freq"] = a["pkv_freq"][:-10]
        with pytest.raises(ValueError):
            seqs.parse(container.pack_arrays(bad), B, L)
    # shifts planes: short plane array must raise, not stride OOB
    if "shv_planes" in a:
        bad = dict(a)
        bad["shv_planes"] = a["shv_planes"][: 2 * 2048 - 7]
        with pytest.raises(ValueError):
            seqs.parse(container.pack_arrays(bad), B, L)


def test_corrupt_v7_nseg_fields_rejected():
    """v7 multi-anchor blocks: corrupt nseg / short shift planes /
    out-of-bounds segment shifts must raise, never crash or read out
    of bounds."""
    import numpy as np
    from scalce_tpu.streams import seqs

    rng = np.random.default_rng(6)
    n, L, nseg = 4, 64 * 16, 8
    codes = rng.integers(0, 4, (n, L)).astype(np.uint8)
    lens = np.full(n, L, np.int64)
    codes[1] = codes[0]
    match = np.zeros((n, L), bool)
    match[1, :64] = True
    lits = codes[(~match)]
    padded = np.zeros(((len(lits) + 15) // 16) * 16, np.uint8)
    padded[:len(lits)] = lits
    delta = {
        "mask_bits": np.packbits(match, axis=1, bitorder="little"),
        "shifts": np.zeros((n, nseg), np.int32),
        "nseg": nseg,
        "pred_k": np.zeros(n, np.uint8),
        "rc_bits": np.zeros((n + 7) // 8, np.uint8),
        "lit_packed": seqs._pack2bit_np(padded),
        "n_lits": len(lits),
    }
    blob = seqs.payload(delta, lens.astype(np.int32), n,
                        np.zeros(0, np.uint64), np.zeros(0, np.uint8),
                        np.arange(n, dtype=np.int64), backend="zstd")
    # sanity: intact blob decodes
    out_codes, _, _, _, _, _, _ = seqs.parse(blob, n, L)
    np.testing.assert_array_equal(out_codes, codes)

    from scalce_tpu import container

    def rewrite(mut):
        a = dict(container.unpack_arrays(blob))
        mut(a)
        return container.pack_arrays(a, backend="zstd")

    # nseg out of range
    for bad in (0, 100000):
        b2 = rewrite(lambda a, bad=bad: a.update(
            nseg=np.asarray([bad], np.int64)))
        with pytest.raises(ValueError):
            seqs.parse(b2, n, L)
    # truncated shift planes
    def trunc(a):
        key = "shv4_planes" if "shv4_planes" in a else None
        if key is None:
            # rANS-coded planes: corrupt the word count instead
            a["shv4_counts"] = a["shv4_counts"][:1]
        else:
            a[key] = a[key][: n]        # far short of 4*n*nseg
    with pytest.raises(ValueError):
        seqs.parse(rewrite(trunc), n, L)
    # out-of-bounds segment shift (copy source past row end)
    def oob(a):
        sh = np.zeros((n, nseg), np.int64)
        sh[1, 0] = L + 5                # |shift| >= L must be rejected
        zz = ((sh.reshape(-1) << 1) ^ (sh.reshape(-1) >> 63)) \
            & 0xFFFFFFFF
        planes = np.concatenate(
            [((zz >> (8 * p)) & 0xFF).astype(np.uint8) for p in range(4)])
        for k in ("shv4_mode", "shv4_freq", "shv4_states", "shv4_counts",
                  "shv4_words"):
            a.pop(k, None)
        a["shv4_planes"] = planes
    with pytest.raises(ValueError):
        seqs.parse(rewrite(oob), n, L)
