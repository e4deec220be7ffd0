"""Data-parallel execution over a device mesh and multi-host merge.

The reference's only concurrency is a pthread pool over compression
chunks [REF: scalce compress.c -T path — UNVERIFIED; SURVEY.md §3
"Parallelism strategies"].  Here data parallelism is first-class:
blocks are independent by construction, sharded over a ``('data',)``
mesh axis with ``shard_map``.  TP/PP/SP/EP/CP/ring-attention are
intentionally N/A for this workload (no model, no activations —
SURVEY.md §3) and documented as such.
"""
