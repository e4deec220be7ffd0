"""Block encode pipeline — the compress driver.

The reference's ``compress()`` owns the per-read hot loop, the bucket
table, flush policy, and part splitting [REF: scalce compress.c —
UNVERIFIED; SURVEY.md §4.1].  Here the whole per-block device work is
ONE fused jit (tokenize → sort → reorder → pack → quality pass A); the
only host syncs per block are the tiny context histogram (to build rANS
tables) and the final payload download — exactly the boundary layout
promised in SURVEY.md §4 ("everything between stays on device").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scalce_tpu.config import Config
from scalce_tpu.io.fastq import ReadBlock
from scalce_tpu.ops import core_match, reorder
from scalce_tpu.ops.bitops import pack_bases_u32
from scalce_tpu.streams import names as names_stream
from scalce_tpu.streams import qualities, seqs


@partial(jax.jit, static_argnames=("k", "seed", "order"))
def _device_encode(seq, qual, lengths, n_reads, exc_pos, qual_map,
                   k: int, seed: int, order: int):
    """Fused per-block device stage.

    exc_pos: int32 [E_pad] flat positions of non-ACGT bases, padded with
    out-of-range sentinels (dropped by the scatter).
    qual_map: uint8 [256] quality remap LUT — identity when lossless,
    the lossy quantizer's merge table under ``-p`` (SURVEY.md §4.4:
    "mapping applied per quality byte inside hot loop #1").
    Returns (perm, packed seq, sorted lengths, qual sym/ctx grids,
    context histogram).
    """
    B, L = seq.shape
    exc = jnp.zeros(B * L, jnp.bool_).at[exc_pos].set(
        True, mode="drop").reshape(B, L)
    ck, cp = core_match.find_cores(seq, lengths, exc, k, seed)
    keys = core_match.build_sort_keys(seq, lengths, ck, cp, n_reads)
    perm = reorder.sort_permutation(keys)
    seq_s, qual_s, len_s = reorder.apply_permutation(perm, seq, qual, lengths)
    qual_s = qual_map[qual_s]
    packed = pack_bases_u32(seq_s, axis=1)
    sym, ctx, counts = qualities.sym_ctx_hist(qual_s, len_s, order)
    return perm, packed, len_s, sym, ctx, counts


@partial(jax.jit, static_argnames=("order",))
def _device_encode_mate2(seq, qual, lengths, perm, qual_map, order: int):
    """Mate-2 device stage: no core matching — mate 2 follows mate 1's
    permutation so pairs stay line-synchronized (SURVEY.md §2
    "Paired-end sync": "apply the SAME device permutation to both
    mates' tensors")."""
    seq_s, qual_s, len_s = reorder.apply_permutation(perm, seq, qual, lengths)
    qual_s = qual_map[qual_s]
    packed = pack_bases_u32(seq_s, axis=1)
    sym, ctx, counts = qualities.sym_ctx_hist(qual_s, len_s, order)
    return packed, len_s, sym, ctx, counts


def _pad_exc(exc_pos: np.ndarray, sentinel: int) -> np.ndarray:
    """Pad to a power-of-two length so jit recompiles stay bounded."""
    n = max(64, len(exc_pos))
    cap = 1 << (n - 1).bit_length()
    out = np.full(cap, sentinel, np.int32)
    out[: len(exc_pos)] = exc_pos
    return out


@dataclasses.dataclass
class EncodedBlock:
    block_id: int
    n_reads: int
    payloads: Dict[str, bytes]      # 'n' / 'r' / 'q'

    @property
    def total_bytes(self) -> int:
        return sum(len(p) for p in self.payloads.values())


class BlockEncoder:
    """Stateless per-block encoder (safe to drive from a host thread pool:
    jit functions are pure; numpy work is per-block local)."""

    def __init__(self, cfg: Config, qual_map: Optional[np.ndarray] = None):
        self.cfg = cfg
        if qual_map is None:
            from scalce_tpu.models import lossy
            qual_map = lossy.identity_map()
        self.qual_map = jnp.asarray(qual_map)

    # -- stage split: ``encode_device`` runs only device dispatches (kept
    # on the driver's main thread so device work pipelines in submission
    # order); ``assemble`` does D2H + tables + payload bytes and is safe
    # to run on a host worker thread (the reference's -T concurrency,
    # SURVEY.md §2 "Threading", moved to where the host time actually is)

    def encode_device(self, block: ReadBlock):
        cfg = self.cfg
        B, L = block.seq.shape
        return _device_encode(
            jnp.asarray(block.seq), jnp.asarray(block.qual),
            jnp.asarray(block.lengths), jnp.int32(block.n_reads),
            jnp.asarray(_pad_exc(block.exc_pos.astype(np.int32), B * L)),
            self.qual_map,
            cfg.core_k, cfg.dict_seed, cfg.qual_context_order)

    def assemble(self, block: ReadBlock, devout) -> EncodedBlock:
        perm, packed, len_s, sym, ctx, counts = devout
        return self._assemble(block, np.asarray(perm), packed, len_s,
                              sym, ctx, counts)

    def encode_block(self, block: ReadBlock) -> EncodedBlock:
        return self.assemble(block, self.encode_device(block))

    def encode_device_pair(self, b1: ReadBlock, b2: ReadBlock):
        cfg = self.cfg
        out1 = self.encode_device(b1)
        perm = out1[0]
        out2 = _device_encode_mate2(
            jnp.asarray(b2.seq), jnp.asarray(b2.qual),
            jnp.asarray(b2.lengths), perm.astype(jnp.int32),
            self.qual_map, cfg.qual_context_order)
        return out1, out2

    def assemble_pair(self, b1: ReadBlock, b2: ReadBlock, devout
                      ) -> Tuple[EncodedBlock, EncodedBlock]:
        out1, out2 = devout
        perm_np = np.asarray(out1[0])
        eb1 = self._assemble(b1, perm_np, *out1[1:])
        eb2 = self._assemble(b2, perm_np, *out2)
        return eb1, eb2

    def encode_block_pair(self, b1: ReadBlock, b2: ReadBlock
                          ) -> Tuple[EncodedBlock, EncodedBlock]:
        """Paired-end: mate 1 defines the permutation, mate 2 follows."""
        return self.assemble_pair(b1, b2, self.encode_device_pair(b1, b2))

    def _assemble(self, block: ReadBlock, perm_np: np.ndarray, packed,
                  len_s, sym, ctx, counts) -> EncodedBlock:
        cfg = self.cfg
        B, L = block.seq.shape
        # quality stream (pass B needs host-built tables)
        enc_q = qualities.encode_from_grids(sym, ctx, counts, B, L,
                                            cfg.qual_context_order)
        q_payload = qualities.payload(enc_q)

        # exceptions into the reordered frame (host; exceptions are rare)
        inv = np.empty(B, np.int64)
        inv[perm_np] = np.arange(B)
        if block.exc_pos.size:
            rows, cols = block.exc_pos // L, block.exc_pos % L
            new_pos = inv[rows] * L + cols
            order_idx = np.argsort(new_pos, kind="stable")
            exc_pos_s = new_pos[order_idx]
            exc_byte_s = block.exc_byte[order_idx]
        else:
            exc_pos_s = block.exc_pos
            exc_byte_s = block.exc_byte
        r_payload = seqs.payload(np.asarray(packed), np.asarray(len_s),
                                 block.n_reads, exc_pos_s, exc_byte_s,
                                 perm_np)

        # names stay in ORIGINAL order (numeric deltas are tiny there);
        # the stored permutation re-aligns them with reads at decode time
        n_payload = self._encode_names(block)

        return EncodedBlock(block.block_id, block.n_reads, {
            "n": n_payload, "r": r_payload, "q": q_payload})

    def _encode_names(self, block: ReadBlock) -> bytes:
        from scalce_tpu import container
        n = block.n_reads
        arrays = {"n": np.asarray([n], np.int64)}
        deflate = []
        if self.cfg.name_lib is not None:
            # template mode (-n): names discarded; decoder regenerates
            arrays["template"] = np.asarray([1], np.uint8)
        else:
            blob = names_stream.encode(block.names, n)
            arrays["names_blob"] = np.frombuffer(blob, np.uint8)
        if block.plus is not None:
            arrays["plus_cat"] = block.plus.cat
            arrays["plus_lens"] = block.plus.lens.astype(np.uint32)
            deflate += ["plus_cat", "plus_lens"]
        return container.pack_arrays(arrays, deflate=deflate)


def file_meta(cfg: Config) -> Dict:
    """Per-file metadata shared by every block (static pipeline shape)."""
    return {
        "block_reads": cfg.block_reads,
        "max_read_len": cfg.max_read_len,
        "core_k": cfg.core_k,
        "dict_seed": cfg.dict_seed,
        "qual_order": cfg.qual_context_order,
        "lossy_pct": cfg.lossy_pct,
        "name_lib": cfg.name_lib,
        "paired": cfg.paired,
    }
