"""Benchmark harness: end-to-end FASTQ encode throughput on the local
device (the driver runs this on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (measured, not assumed — BASELINE.md): the reference SCALCE is
a single-node C tool whose backend is zlib and whose paper claims it is
FASTER than plain gzip (reordering makes deflate cheaper).  The honest
per-host proxy is therefore measured at bench time: single-thread
zlib-6 over a slice of the same FASTQ, scaled by 1.5x for the paper's
"faster than gzip" claim.  vs_baseline = our GB/s / that proxy.
"""

import json
import os
import sys
import tempfile
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: paper-claimed speed advantage of reference SCALCE over plain gzip
#: (qualitative "faster than gzip"; 1.5x is a generous reading)
REFERENCE_SPEEDUP_VS_GZIP = 1.5


def _measure_reference_proxy(payload: bytes) -> float:
    """Single-thread zlib-6 GB/s over a slice of the bench input."""
    slice_bytes = payload[: 16 << 20]
    t0 = time.monotonic()
    zlib.compress(slice_bytes, 6)
    dt = time.monotonic() - t0
    return len(slice_bytes) / dt / 1e9


def _enable_compile_cache() -> None:
    """Persist XLA compiles across bench runs (first axon compile of the
    full pipeline is minutes; cached reruns are seconds)."""
    try:
        import jax
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)


def main() -> None:
    _enable_compile_cache()
    # 16 blocks: enough for the 3-stage pipeline (parse thread / device
    # dispatch / worker assembly) to reach steady state — at 8 blocks
    # the first block's parse+fill latency still costs ~15% of the wall
    # (measured 0.41 vs 0.47 GB/s at 8 vs 16 blocks)
    n_reads = int(os.environ.get("BENCH_READS", 1 << 21))
    block_reads = int(os.environ.get("BENCH_BLOCK_READS", 1 << 17))
    # placement: EXPLICIT host by default.  AUTO resolves to host on
    # this tunnel anyway (link << 200 MB/s), but AUTO's probe initializes
    # the axon backend whose connection threads then compete for the 4
    # host cores at an unpredictable point in the timed window (observed
    # 0.07-0.27 GB/s scatter run-to-run).  BENCH_PLACEMENT=auto|device
    # restores the probing/device paths for fast-link hardware.
    placement = os.environ.get("BENCH_PLACEMENT", "host")
    if placement not in ("host", "auto", "device"):
        raise SystemExit(f"BENCH_PLACEMENT={placement!r}: "
                         "want host|auto|device")
    place_kw = {}
    if placement == "host":
        place_kw["core_on_device"] = False
    elif placement == "device":
        place_kw["core_on_device"] = True

    from scalce_tpu.config import Config
    from scalce_tpu.pipeline import driver
    from scalce_tpu.utils.synth import synth_fastq

    # tmpfs when available: this VM writes disk at ~33 MB/s, and the
    # decode leg writes the full 505MB FASTQ back out — on /tmp the
    # PREVIOUS run's dirty-page writeback throttles the next run
    # (observed decode 0.26-0.94 GB/s on identical code).  The bench
    # measures the codec; BASELINE.md documents the disk wall
    # separately (1 GB sustained run).
    # the working set is ~4x the input (FASTQ + compressed triplet +
    # decoded FASTQ + slack); tmpfs is RAM-backed, so fall back to the
    # default tmp dir when /dev/shm can't hold it
    tmp_root = None
    need = 4 * n_reads * 241          # ~241 B per synthetic record
    if os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize > need:
                tmp_root = "/dev/shm"
        except OSError:
            pass
    # a disk-throttled run must be distinguishable from a codec
    # regression in the artifact (ADVICE r4): record which working-set
    # location was used, and the machine load, in the JSON line
    workdir_kind = "tmpfs" if tmp_root else "disk"
    if not tmp_root:
        print("[bench] WARNING: /dev/shm unavailable or too small - "
              "working set on disk (~33 MB/s on this VM); walls will "
              "include writeback stalls", file=sys.stderr, flush=True)
    tmp = tempfile.mkdtemp(prefix="scalce_bench_", dir=tmp_root)
    # tmpfs is RAM: leaked ~1.5GB working sets accumulate across runs
    import atexit
    import shutil
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    path = os.path.join(tmp, "bench.fastq")
    print(f"[bench] generating {n_reads} reads ...", file=sys.stderr,
          flush=True)
    payload = synth_fastq(n_reads, 100, seed=42, genome_len=1_000_000,
                          n_rate=0.001)
    with open(path, "wb") as f:
        f.write(payload)
    input_bytes = len(payload)

    def log(msg):
        print(f"[bench +{time.monotonic() - t_start:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    t_start = time.monotonic()

    def run(in_path: str, out_name: str):
        cfg = Config(mode="compress", inputs=(in_path,),
                     output=os.path.join(tmp, out_name),
                     block_reads=block_reads, **place_kw)
        t0 = time.monotonic()
        stats = driver.compress(cfg)
        return time.monotonic() - t0, stats

    # warm-up on a SMALL file: compiles every jit (the dominant cost —
    # the compile service is remote and can take minutes on fresh HLO)
    # without paying a full-size run
    warm_path = os.path.join(tmp, "warm.fastq")
    with open(warm_path, "wb") as f:
        f.write(synth_fastq(block_reads, 100, seed=7,
                            genome_len=500_000, n_rate=0.001))
    log("warm-up encode (compiles on cold cache)")
    run(warm_path, "warm")
    log("warm-up slice-width variants")
    from scalce_tpu.pipeline.encode import warm_slice_variants
    warm_slice_variants(Config(mode="compress", inputs=(warm_path,),
                               block_reads=block_reads, **place_kw))
    # best-of-N timed runs: this host is a shared VM and neighbor load
    # only ever SLOWS a run (observed 0.27-0.40 GB/s scatter within
    # minutes on identical code), so the minimum wall is the honest
    # capability estimate; the spread goes to stderr
    n_runs = int(os.environ.get("BENCH_RUNS", 3))
    # when the wall spread exceeds ~10% the shared VM is visibly noisy
    # and best-of-3 under-samples the clean-machine capability (round 4
    # recorded 0.435 GB/s where quiet-machine runs pin 0.59-0.61):
    # keep running, up to BENCH_MAX_RUNS, until the spread settles or
    # the cap is hit (VERDICT r4 #3)
    max_runs = int(os.environ.get("BENCH_MAX_RUNS", max(6, n_runs)))
    spread_tol = float(os.environ.get("BENCH_SPREAD_TOL", 0.10))
    walls = []

    def settled():
        # convergence of the MINIMUM estimate: stop when the three
        # fastest walls agree within tol.  (The overall max/min spread
        # is monotonically non-decreasing, so it could never re-settle
        # once a noisy run landed.)
        if len(walls) < n_runs:
            return False
        best3 = sorted(walls)[:3]
        return (best3[-1] - best3[0]) / best3[0] <= spread_tol

    for i in range(max_runs):
        if settled():
            break
        log(f"timed encode {i + 1}/{max_runs} (min {n_runs})")
        w, stats = run(path, "bench")
        walls.append(w)
    wall = min(walls)
    wall_median = sorted(walls)[len(walls) // 2]
    log(f"encode walls: {[round(w, 3) for w in walls]}")

    budget = float(os.environ.get("BENCH_TIME_BUDGET", 480))
    dec_wall = 0.0
    if time.monotonic() - t_start < budget:
        # decode throughput (stderr detail; JSON line stays encode-only)
        log("warm-up decode")
        dcfg = Config(mode="decompress",
                      inputs=(os.path.join(tmp, "bench.00.scalcen"),),
                      output=os.path.join(tmp, "dec"),
                      block_reads=block_reads)
        driver.decompress(dcfg)          # warm decode jits
        dec_walls = []
        for i in range(n_runs):
            log(f"timed decode {i + 1}/{n_runs}")
            t0 = time.monotonic()
            driver.decompress(dcfg)
            dec_walls.append(time.monotonic() - t0)
        dec_wall = min(dec_walls)
        log(f"decode walls: {[round(w, 3) for w in dec_walls]}")
    else:
        log("over time budget - skipping decode timing")

    # paired-end leg (VERDICT r4 #4): the north-star workload is paired
    # (BASELINE.json configs 2-5) — pin the number in the artifact, not
    # in BASELINE.md prose.  Same host placement as the main leg.
    paired_gbps = 0.0
    paired_walls = []
    if os.environ.get("BENCH_PAIRED", "1") != "0" \
            and time.monotonic() - t_start < budget:
        from scalce_tpu.utils.synth import synth_pair
        # default scales with the main leg so the CI-size bench stays
        # CI-sized (full runs use 2 x 1M mates = the BASELINE config)
        pr = int(os.environ.get("BENCH_PAIRED_READS",
                                min(1 << 20, n_reads)))
        log(f"paired leg: generating 2 x {pr} mates")
        m1, m2 = synth_pair(pr, 100, seed=42, genome_len=1_000_000,
                            n_rate=0.001)
        p1 = os.path.join(tmp, "mate_1.fastq")
        p2 = os.path.join(tmp, "mate_2.fastq")
        with open(p1, "wb") as f:
            f.write(m1)
        with open(p2, "wb") as f:
            f.write(m2)
        paired_bytes = len(m1) + len(m2)

        def run_paired():
            cfg = Config(mode="compress", inputs=(p1, p2), paired=True,
                         output=os.path.join(tmp, "paired"),
                         block_reads=block_reads, **place_kw)
            t0 = time.monotonic()
            driver.compress(cfg)
            return time.monotonic() - t0

        log("paired warm-up")
        run_paired()                      # mate-2 jits / pool warm
        for i in range(n_runs):
            log(f"timed paired encode {i + 1}/{n_runs}")
            paired_walls.append(run_paired())
        paired_gbps = paired_bytes / min(paired_walls) / 1e9
        log(f"paired walls: {[round(w, 3) for w in paired_walls]} "
            f"-> {paired_gbps:.4f} GB/s")

    # device-placement leg (VERDICT r2 #1: the round artifact must pin
    # a TPU number, not just the host placement).  Runs AFTER the host
    # timing legs and in a SUBPROCESS: initializing the axon backend
    # in-process spawns connection threads that compete for the 4 host
    # cores during timed windows (observed 31-64s decode walls vs 2.5s
    # clean — the exact contamination CLAUDE.md's bench contract
    # forbids).  Own budget; off switch BENCH_DEVICE=0.
    dev_gbps = 0.0
    dev_walls = []
    if placement == "host" and os.environ.get("BENCH_DEVICE", "1") != "0":
        import subprocess
        dev_budget = float(os.environ.get("BENCH_DEVICE_BUDGET", 1500))
        # 8 blocks: the 3-stage pipeline needs >= 8 blocks in flight to
        # reach steady state (same reason as the host leg's 16)
        dev_reads = int(os.environ.get("BENCH_DEVICE_READS",
                                       8 * block_reads))
        dev_path = os.path.join(tmp, "dev.fastq")
        if dev_reads == n_reads:
            dev_payload = payload
        else:
            dev_payload = synth_fastq(dev_reads, 100, seed=42,
                                      genome_len=1_000_000, n_rate=0.001)
        with open(dev_path, "wb") as f:
            f.write(dev_payload)
        child = f"""
import json, sys, time
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver
walls = []
t_all = time.monotonic()
for i in range(4):    # 1 warm-up + 3 timed: the tunnel swings 2-4x
    cfg = Config(mode="compress", inputs=({dev_path!r},),
                 output={os.path.join(tmp, "devout")!r},
                 block_reads={block_reads}, core_on_device=True)
    t0 = time.monotonic()
    driver.compress(cfg)
    walls.append(time.monotonic() - t0)
    if time.monotonic() - t_all > {dev_budget}:
        break
print(json.dumps(walls[1:] or walls))
"""
        try:
            log("device-placement leg (subprocess; remote compile can "
                "be minutes cold)")
            r = subprocess.run([sys.executable, "-c", child],
                               capture_output=True, text=True,
                               timeout=dev_budget + 300)
            if r.returncode == 0:
                dev_walls = json.loads(r.stdout.strip().splitlines()[-1])
                dev_gbps = len(dev_payload) / min(dev_walls) / 1e9
                log(f"device walls: {[round(w, 3) for w in dev_walls]} "
                    f"-> {dev_gbps:.4f} GB/s")
            else:
                log(f"device leg failed: {r.stderr[-500:]}")
        except Exception as e:      # no device / dead tunnel: the host
            log(f"device leg unavailable: {e}")     # number still stands

    # device-placement DECODE leg (VERDICT r4 #4): the Mosaic quality
    # decode kernel path (--qual-device), end-to-end from the container
    # the host leg wrote.  Subprocess for the same contamination reason
    # as the encode leg.  Null if skipped/unavailable.
    dev_dec_gbps = 0.0
    dev_dec_walls = []
    if placement == "host" and dec_wall \
            and os.environ.get("BENCH_DEVICE", "1") != "0" \
            and os.environ.get("BENCH_DEVICE_DECODE", "1") != "0":
        import subprocess
        dd_budget = float(os.environ.get("BENCH_DEVICE_DECODE_BUDGET",
                                         1200))
        child = f"""
import json, sys, time
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from scalce_tpu.config import Config
from scalce_tpu.pipeline import driver
walls = []
t_all = time.monotonic()
for i in range(4):    # 1 warm-up + up to 3 timed
    cfg = Config(mode="decompress",
                 inputs=({os.path.join(tmp, "bench.00.scalcen")!r},),
                 output={os.path.join(tmp, "devdec")!r},
                 block_reads={block_reads}, qual_on_device=True)
    t0 = time.monotonic()
    driver.decompress(cfg)
    walls.append(time.monotonic() - t0)
    if time.monotonic() - t_all > {dd_budget}:
        break
print(json.dumps(walls[1:] or walls))
"""
        try:
            log("device-placement decode leg (subprocess; Mosaic "
                "compile is seconds, tunnel D2H dominates)")
            r = subprocess.run([sys.executable, "-c", child],
                               capture_output=True, text=True,
                               timeout=dd_budget + 300)
            if r.returncode == 0:
                dev_dec_walls = json.loads(
                    r.stdout.strip().splitlines()[-1])
                dev_dec_gbps = input_bytes / min(dev_dec_walls) / 1e9
                log(f"device decode walls: "
                    f"{[round(w, 3) for w in dev_dec_walls]} "
                    f"-> {dev_dec_gbps:.4f} GB/s")
            else:
                log(f"device decode leg failed: {r.stderr[-500:]}")
        except Exception as e:
            log(f"device decode leg unavailable: {e}")

    # kernel-only device leg (VERDICT r3 #1): per-stage throughput with
    # data RESIDENT on the chip — the falsifiable "fast on
    # locally-attached hardware" numbers (scripts/bench_kernels.py).
    # Subprocess for the same reason as the device leg; its own budget.
    kernels = None
    if os.environ.get("BENCH_KERNELS", "1") != "0":
        import subprocess
        kb = float(os.environ.get("BENCH_KERNELS_BUDGET", 900))
        try:
            log("kernel-only device leg (subprocess)")
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_kernels.py")],
                capture_output=True, text=True,
                env={**os.environ, "BENCH_KERNEL_BUDGET": str(kb)},
                timeout=kb + 300)
            if r.returncode == 0:
                kernels = json.loads(r.stdout.strip().splitlines()[-1])
                log(f"kernel stages: {kernels['stages']}")
            else:
                log(f"kernel leg failed: {r.stderr[-500:]}")
        except Exception as e:
            log(f"kernel leg unavailable: {e}")
    log("done")

    log("measuring gzip-class reference proxy")
    gzip_gbps = _measure_reference_proxy(payload)
    ref_gbps = gzip_gbps * REFERENCE_SPEEDUP_VS_GZIP

    gbps = input_bytes / wall / 1e9
    result = {
        "metric": "encode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / ref_gbps, 2),
        # run-to-run spread on this shared VM is real signal (VERDICT
        # r2 weak #6): all walls, not just the best; median alongside
        # best so a noisy artifact is self-describing (VERDICT r4 #3)
        "encode_walls_s": [round(w, 3) for w in walls],
        "encode_median_gbps": round(input_bytes / wall_median / 1e9, 4),
        # provenance of the measurement environment (ADVICE r4): which
        # working-set location, and how loaded the VM was
        "workdir": workdir_kind,
        "loadavg": list(os.getloadavg()),
        "decode_gbps": round(input_bytes / dec_wall / 1e9, 4)
        if dec_wall else None,
        "paired_encode_gbps": round(paired_gbps, 4)
        if paired_gbps else None,
        "paired_encode_walls_s": [round(w, 3) for w in paired_walls],
        "device_decode_gbps": round(dev_dec_gbps, 4)
        if dev_dec_gbps else None,
        "device_decode_walls_s": [round(w, 3) for w in dev_dec_walls],
        "ratio": round(stats.input_bytes / stats.output_bytes, 3),
        # the TPU-placement number (VERDICT r2 #1); null if the leg was
        # skipped/unavailable
        "device_encode_gbps": round(dev_gbps, 4) if dev_gbps else None,
        "device_encode_walls_s": [round(w, 3) for w in dev_walls],
        "device_vs_baseline": round(dev_gbps / ref_gbps, 2)
        if dev_gbps else None,
        # ONE device-resident full-pipeline number (VERDICT r4 #1):
        # stage A -> delta -> histogram -> normalize -> rANS encode
        # chained on-chip, FASTQ bytes / wall
        "device_pipeline_gbps": (((kernels or {}).get("stages") or {})
                                 .get("device_pipeline") or {}
                                 ).get("gbps_payload"),
        # per-stage device-resident kernel throughput + roofline %
        # (VERDICT r3 #1); null if the leg was skipped/unavailable
        "device_kernels": (kernels or {}).get("stages") or None,
        "device_kernel_roofline": ({
            "hbm_gbps": kernels["hbm_roofline_gbps"],
            "mxu_tflops": kernels["mxu_roofline_tflops"],
        } if kernels else None),
    }
    print(json.dumps(result))
    # secondary detail on stderr for humans
    dec_str = (f"decode {input_bytes/dec_wall/1e9:.4f} GB/s; "
               if dec_wall else "decode skipped; ")
    print(f"[bench] {n_reads} reads, {input_bytes/1e6:.1f} MB in "
          f"{wall:.2f}s; ratio {stats.input_bytes/stats.output_bytes:.2f}x; "
          f"{dec_str}"
          f"host zlib-6 {gzip_gbps:.4f} GB/s -> ref proxy {ref_gbps:.4f}; "
          f"stages {stats.stage_s}; streams {stats.stream_bytes}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
