"""Top-level compress/decompress drivers (the reference's ``compress()``
and ``decompress()`` entry points, SURVEY.md §4.1–4.2) plus run stats
(SURVEY.md §6 "Metrics / logging": structured stats instead of the
reference's stderr prints)."""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Dict, List, Optional

import numpy as np

from scalce_tpu import container
from scalce_tpu.config import Config
from scalce_tpu.io import fastq
from scalce_tpu.pipeline.decode import BlockDecoder
from scalce_tpu.pipeline.encode import BlockEncoder, file_meta


@dataclasses.dataclass
class RunStats:
    mode: str
    n_reads: int = 0
    n_blocks: int = 0
    input_bytes: int = 0
    output_bytes: int = 0
    stream_bytes: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"n": 0, "r": 0, "q": 0})
    wall_s: float = 0.0

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        if self.input_bytes and self.output_bytes:
            d["ratio"] = self.input_bytes / self.output_bytes
        if self.wall_s > 0:
            d["GBps"] = self.input_bytes / self.wall_s / 1e9
        return json.dumps(d, sort_keys=True)


def _lossy_preamble(cfg: Config, block_iter):
    """Sample the first ``-S`` reads for the lossy histogram, returning
    (qual_map, buffered_blocks, block_iter) — the reference's sampling
    pass (SURVEY.md §4.4) without re-reading the input: sampled blocks
    are buffered and encoded first.

    Multi-host note: when sharded, this histogram must be all-reduced
    across hosts before map construction so every host applies the same
    table (SURVEY.md §6 "Distributed communication backend").
    """
    from scalce_tpu.models import lossy
    if cfg.lossy_pct <= 0:
        return lossy.identity_map(), [], block_iter
    hist = np.zeros(0, np.int64)
    buffered = []
    sampled = 0
    for block in block_iter:
        b = block[0] if isinstance(block, tuple) else block
        h = lossy.sample_histogram(b.qual, b.lengths, b.n_reads)
        hist = h if hist.size == 0 else hist + h
        buffered.append(block)
        sampled += b.n_reads
        if sampled >= cfg.sample_size:
            break
    qual_map = lossy.build_quant_map(hist, cfg.lossy_pct) \
        if hist.size else lossy.identity_map()
    return qual_map, buffered, block_iter


def compress(cfg: Config) -> RunStats:
    t0 = time.monotonic()
    stats = RunStats(mode="compress")
    meta = file_meta(cfg)

    if cfg.paired:
        return _compress_paired(cfg, stats, meta, t0)

    (path,) = cfg.inputs
    block_iter = fastq.iter_blocks(path, cfg.block_reads, cfg.max_read_len)
    qual_map, buffered, block_iter = _lossy_preamble(cfg, block_iter)
    enc = BlockEncoder(cfg, qual_map)
    writer = container.TripletWriter(cfg.output, meta,
                                     part_size=cfg.part_size, mate=None)
    import itertools
    for block in itertools.chain(buffered, block_iter):
        eb = enc.encode_block(block)
        writer.add_block(eb.block_id, eb.payloads, eb.n_reads)
        stats.n_blocks += 1
        stats.n_reads += eb.n_reads
        for k, p in eb.payloads.items():
            stats.stream_bytes[k] += len(p)
    writer.close()
    stats.input_bytes = _file_size(path)
    stats.output_bytes = sum(stats.stream_bytes.values())
    stats.wall_s = time.monotonic() - t0
    return stats


def _compress_paired(cfg: Config, stats: RunStats, meta: Dict,
                     t0: float) -> RunStats:
    raise NotImplementedError("paired-end lands with the name-sync milestone")


def decompress(cfg: Config) -> RunStats:
    t0 = time.monotonic()
    stats = RunStats(mode="decompress")
    (path,) = cfg.inputs
    reader = container.TripletReader(path)
    meta = reader.meta
    if meta.get("paired"):
        raise NotImplementedError("paired-end decode lands with name-sync")
    dec = BlockDecoder(meta, keep_order=cfg.keep_order)
    out_path = cfg.output if cfg.output.endswith(".fastq") \
        else cfg.output + ".fastq"
    with open(out_path, "wb") as out:
        for bid, payloads in reader.iter_blocks():
            b = dec.decode_block(payloads)
            fastq.write_fastq_records(out, b.seq, b.qual, b.lengths,
                                      b.n_reads, b.exc_pos, b.exc_byte,
                                      b.names, b.plus)
            stats.n_blocks += 1
            stats.n_reads += b.n_reads
    stats.output_bytes = _file_size(out_path)
    stats.wall_s = time.monotonic() - t0
    return stats


def _file_size(path: str) -> int:
    import os
    try:
        return os.path.getsize(path)
    except OSError:
        return 0
