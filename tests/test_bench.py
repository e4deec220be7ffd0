"""bench.py contract test: the driver parses exactly one JSON line with
the documented keys, so a bench regression must fail CI, not the round."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "BENCH_READS": "4096",
        "BENCH_BLOCK_READS": "1024",
        "BENCH_TIME_BUDGET": "600",
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "encode_throughput"
    assert rec["unit"] == "GB/s"
    assert rec["value"] > 0
