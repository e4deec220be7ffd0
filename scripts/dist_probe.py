"""Multi-process ``jax.distributed`` probes for tests/test_distributed.py
(VERDICT r3 #5b: exercise the coordination surface — barrier ordering,
global histogram — beyond the single end-to-end merge test).

Run one process per rank:

    python scripts/dist_probe.py barrier|hist --coordinator host:port \
        --num-processes N --process-id RANK --workdir DIR

``barrier``: every rank writes ``pre_RANK`` BEFORE the barrier (rank>0
after a deliberate sleep), then after the barrier each rank records
which ``pre_*`` files it can see.  If the barrier actually blocks,
every rank must see every other rank's pre-file.

``hist``: each rank builds a DIFFERENT local histogram and calls
``global_quality_histogram``; every rank writes the reduced result,
which must equal the sum of all locals on every rank.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("probe", choices=("barrier", "hist"))
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--workdir", required=True)
    args = p.parse_args()

    from scalce_tpu.parallel.distributed import (
        init_multihost, barrier, global_quality_histogram)
    topo = init_multihost(args.coordinator, args.num_processes,
                          args.process_id)
    rank, n = topo.host_id, topo.n_hosts
    wd = args.workdir

    if args.probe == "barrier":
        if rank > 0:
            time.sleep(1.5)            # make rank 0 reach the barrier first
        with open(os.path.join(wd, f"pre_{rank}"), "w") as f:
            f.write(str(rank))
        barrier(tag=7)
        seen = sorted(name for name in os.listdir(wd)
                      if name.startswith("pre_"))
        with open(os.path.join(wd, f"post_{rank}"), "w") as f:
            f.write(",".join(seen))
        # a second barrier with a different tag must also not deadlock
        barrier(tag=8)
        return 0

    # hist: rank r contributes hist[i] = (r+1)*(i+1)
    local = np.arange(1, 65, dtype=np.int64) * (rank + 1)
    out = global_quality_histogram(local)
    np.save(os.path.join(wd, f"hist_{rank}.npy"), np.asarray(out))
    barrier(tag=9)
    return 0


if __name__ == "__main__":
    sys.exit(main())
