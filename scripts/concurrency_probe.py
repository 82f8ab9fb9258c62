#!/usr/bin/env python
"""Attribute the pinned 8→32 scaling gap: engine bottleneck or host?

A single 32-core replay scales poorly past 8 cores on this box
(BENCH/BASELINE.md). Two hypotheses:

  (a) the ENGINE serializes (driver bookkeeping, commit path, a global
      lock) — then four INDEPENDENT 8-core replays run concurrently on
      disjoint CPU sets would also fail to reach ~4× one 8-core run;
  (b) the HOST saturates (memory bandwidth, page cache, steal) — then
      the four independent replays hit the same wall, and the gap is
      not the engine's plan.

If instead 4×8 concurrent ≈ 4× one-8 aggregate while a single 32-core
job is slower, the residual is intra-job (barrier sync / task skew at
32-way parallelism), still not a serial-code bottleneck.

Each worker runs ``bench.py --replay-only`` pinned via taskset to its
own 8-CPU block, replaying the SAME pre-generated read-only segment
dir into its own table. Prints one JSON line with all throughputs and
the aggregate ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/spark-bench")


def _run(cmd: list[str]) -> dict:
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def _replay_cmd(cpu_list: str, cores: int, events_dir: str, n_events: int, batches: int) -> list[str]:
    return [
        "taskset", "-c", cpu_list,
        sys.executable, os.path.join(REPO, "bench.py"),
        "--replay-only", f"--cores={cores}", f"--events={n_events}",
        f"--batches={batches}", f"--events-dir={events_dir}",
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=16_000_000)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--cores-per-worker", type=int, default=8)
    ap.add_argument("--events-dir", default=None, help="reuse pre-generated segments")
    args = ap.parse_args()

    os.makedirs(BENCH_TMP, exist_ok=True)
    events_dir = args.events_dir
    if events_dir is None:
        from bench import _bench_spark, gen_events  # noqa: E402

        shared = tempfile.mkdtemp(prefix="conc_ev_", dir=BENCH_TMP)
        events_dir = os.path.join(shared, "events")
        spark = _bench_spark(32, "conc-gen")
        n_repos = max(2_000, args.events // 800)
        gen_events(spark, events_dir, args.events, args.batches, n_repos, 200)
        spark.stop()

    cpw = args.cores_per_worker
    # baseline: one pinned 8-core replay (warm JIT: run twice, take 2nd)
    base_cmd = _replay_cmd(f"0-{cpw - 1}", cpw, events_dir, args.events, args.batches)
    _run(base_cmd)
    single8 = _run(base_cmd)

    # one pinned 32-core replay
    all_cores = args.workers * cpw
    cmd32 = _replay_cmd(f"0-{all_cores - 1}", all_cores, events_dir, args.events, args.batches)
    _run(cmd32)
    single_all = _run(cmd32)

    # N concurrent pinned 8-core replays on DISJOINT cpu blocks
    t0 = time.monotonic()
    procs = []
    for w in range(args.workers):
        lo, hi = w * cpw, (w + 1) * cpw - 1
        procs.append(
            subprocess.Popen(
                _replay_cmd(f"{lo}-{hi}", cpw, events_dir, args.events, args.batches),
                stdout=subprocess.PIPE, text=True,
            )
        )
    results = []
    for p in procs:
        out, _ = p.communicate()
        last = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(last))
    wall = time.monotonic() - t0
    agg_eps = args.workers * args.events / wall

    print(json.dumps({
        "single8_eps": single8["events_per_sec"],
        "single32_eps": single_all["events_per_sec"],
        "concurrent_workers": args.workers,
        "concurrent_wall": round(wall, 2),
        "concurrent_aggregate_eps": round(agg_eps, 1),
        "per_worker_eps": [r["events_per_sec"] for r in results],
        "agg_vs_4x_single8": round(agg_eps / (args.workers * single8["events_per_sec"]), 3),
        "single32_vs_4x_single8": round(
            single_all["events_per_sec"] / (args.workers * single8["events_per_sec"]), 3
        ),
    }))


if __name__ == "__main__":
    main()
