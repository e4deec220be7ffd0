"""Multi-host compression launcher (BASELINE.json config 5).

On every host of the job:

    python scripts/multihost_compress.py input.fastq -o out \
        --coordinator HOST0:1234 --num-processes N --process-id RANK

Each host initializes jax.distributed, encodes its strided share of
blocks, synchronizes, and rank 0 merges the per-host triplets into the
final output — byte-identical to a single-host run (see
tests/test_multihost.py for the determinism proof on simulated hosts).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-r", "--paired", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (rank 0's)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--block-reads", type=int, default=1 << 17)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard this host's blocks over its LOCAL devices "
                        "(mesh.local_mesh) on top of the cross-host "
                        "strided split — config 5's full topology")
    p.add_argument("-p", "--lossy", type=int, default=0,
                   help="lossy quality percentage (every host samples "
                        "the same input prefix, so the quantization map "
                        "is identical across hosts by construction)")
    args = p.parse_args()

    from scalce_tpu.parallel.distributed import init_multihost, barrier
    topo = init_multihost(args.coordinator, args.num_processes,
                          args.process_id)
    print(f"[multihost] host {topo.host_id}/{topo.n_hosts}, "
          f"{topo.n_local_devices} local devices", file=sys.stderr)

    from scalce_tpu.config import Config
    from scalce_tpu.pipeline import driver
    cfg = Config(mode="compress", inputs=tuple(args.inputs),
                 output=args.output, paired=args.paired,
                 block_reads=args.block_reads, lossy_pct=args.lossy,
                 data_parallel=args.data_parallel,
                 n_hosts=topo.n_hosts, host_id=topo.host_id)
    stats = driver.compress(cfg)
    print(f"[multihost] host {topo.host_id}: {stats.n_blocks} blocks, "
          f"{stats.n_reads} reads", file=sys.stderr)

    if topo.n_hosts > 1:
        barrier()
    if topo.host_id == 0 and topo.n_hosts > 1:
        n = driver.merge_hosts(cfg)
        print(f"[multihost] merged {n} blocks", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
