#!/usr/bin/env python
"""Measure coordinator-free parallel ingest into ONE shared lake table.

`scripts/concurrency_probe.py` measured independent tables (host
attribution). This probe measures the thing the optimistic-concurrency
commit protocol exists for: K separate driver PROCESSES writing the
SAME table concurrently, each owning a disjoint bucket subset via
``ReplayEngine.replay(buckets=...)``. Their commits interleave on the
ledger, CAS losers rebase, and the converged state must equal the
single-writer state.

Modes (same total CPU budget, pinned via taskset so the comparison is
engine protocol cost, not scheduler luck):

  1x8 — one writer, local[8], all buckets         (baseline)
  2x4 — two writers, local[4], bucket halves      (shared-table OCC)
  4x2 — four writers, local[2], bucket quarters   (heavier contention)

Each writer replays the SAME seq ranges over the same pre-generated
events; per-writer batch ids are bucket-tagged so the ledgers stay
disjoint. Prints one JSON line: wall seconds + events/s per mode, the
ledger's commit-attempt telemetry (total publish attempts vs commits —
the OCC retry cost), and a sha256 equality check of every mode's final
state against the 1x8 state.

Run AFTER the test suite / other load is quiet — this is a wall-clock
probe. Results land in BENCH/parallel_ingest.json via --out.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/spark-parallel")

_GEN = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from mex_extractors_spark.session import get_spark
    from mex_extractors_spark import synth
    spark = get_spark(app_name="gen", cores=8, shuffle_partitions=8)
    synth.events(spark, {n}).write.parquet({events!r})
    spark.stop()
    """
)

_WRITER = textwrap.dedent(
    """
    import json, sys, time
    sys.path.insert(0, {repo!r})
    from mex_extractors_spark.session import get_spark
    from mex_extractors_spark.lake.table import LakeTable
    from mex_extractors_spark.streaming.replay import ReplayEngine

    spark = get_spark(
        app_name="w{tag}", cores={cores}, shuffle_partitions={cores}
    )
    table = LakeTable({lake!r}, num_buckets={num_buckets})
    t0 = time.monotonic()
    stats = ReplayEngine(table).replay(
        spark,
        spark.read.parquet({events!r}),
        1,
        {n},
        batch_size={batch_size},
        buckets={buckets!r},
    )
    wall = time.monotonic() - t0
    applied = [s for s in stats if s.applied]
    # commit latency = the batch's non-compute residual: total seconds
    # minus the measured stats/write/checksum phases ~= manifest
    # assembly + claim CAS + rebase retries
    lat = sorted(
        max(0.0, s.seconds - s.t_stats - s.t_write - s.t_checksum)
        for s in applied
    )
    print("RESULT " + json.dumps({{
        "wall": wall,
        "applied": len(applied),
        "attempts": sum(s.commit_attempts for s in applied),
        "max_attempts_one_commit": max(
            (s.commit_attempts for s in applied), default=0),
        "commit_latency_p50": round(lat[len(lat) // 2], 3) if lat else None,
        "commit_latency_max": round(lat[-1], 3) if lat else None,
    }}))
    spark.stop()
    """
)

_HASH = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from mex_extractors_spark.session import get_spark
    from mex_extractors_spark.lake.table import LakeTable
    from pyspark.sql import functions as F
    spark = get_spark(app_name="hash", cores=8, shuffle_partitions=8)
    t = LakeTable({lake!r})
    rows = sorted(
        map(tuple, t.read(spark).select(
            "repo", "path", F.sha2("content", 256)).collect())
    )
    import hashlib
    h = hashlib.sha256(repr(rows).encode()).hexdigest()
    print("STATEHASH", h, len(rows))
    spark.stop()
    """
)


def _pinned(cmd_script: str, cpu_lo: int, cpu_hi: int) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", f"{cpu_lo}-{cpu_hi}", sys.executable, "-c", cmd_script],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _run_mode(tag: str, events: str, n: int, num_buckets: int,
              batch_size: int, writers: list[tuple[list[int], int, int]]) -> dict:
    lake = os.path.join(SCRATCH, f"lake_{tag}")
    shutil.rmtree(lake, ignore_errors=True)
    t0 = time.monotonic()
    procs = []
    for i, (buckets, lo, hi) in enumerate(writers):
        cores = hi - lo + 1
        script = _WRITER.format(
            repo=REPO, tag=f"{tag}{i}", lake=lake, events=events, n=n,
            num_buckets=num_buckets, batch_size=batch_size,
            cores=cores, buckets=buckets,
        )
        procs.append(_pinned(script, lo, hi))
    outs = [p.communicate()[0] for p in procs]
    wall = time.monotonic() - t0
    per_writer = []
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"writer failed:\n{out[-4000:]}")
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        per_writer.append(json.loads(line[len("RESULT "):]))
    # final state hash (unpinned, after the clock stops)
    hp = subprocess.run(
        [sys.executable, "-c", _HASH.format(repo=REPO, lake=lake)],
        capture_output=True, text=True,
    )
    sh = [ln for ln in hp.stdout.splitlines() if ln.startswith("STATEHASH")][-1]
    _, state_hash, rows = sh.split()
    commits = sum(w["applied"] for w in per_writer)
    attempts = sum(w["attempts"] for w in per_writer)
    return {
        "mode": tag,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(n / wall, 0),
        "writers": per_writer,
        "commits": commits,
        "publish_attempts": attempts,
        "occ_retries": attempts - commits,
        "state_hash": state_hash,
        "state_rows": int(rows),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=100_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.makedirs(SCRATCH, exist_ok=True)
    events = os.path.join(SCRATCH, "events")
    if not os.path.isdir(events):
        subprocess.run(
            [sys.executable, "-c",
             _GEN.format(repo=REPO, n=args.events, events=events)],
            check=True, capture_output=True, text=True,
        )

    nb = args.num_buckets
    half = nb // 2
    quarter = nb // 4
    modes = [
        ("1x8", [(list(range(nb)), 0, 7)]),
        ("2x4", [(list(range(half)), 0, 3),
                 (list(range(half, nb)), 4, 7)]),
        ("4x2", [(list(range(i * quarter, (i + 1) * quarter)), i * 2, i * 2 + 1)
                 for i in range(4)]),
        # 8 writers, 1 core each — the round-5 contention stress: all
        # eight race the head CAS on every one of the same seq ranges.
        # Buckets are dealt round-robin so every bucket is owned by
        # exactly one writer for ANY nb >= 8 (a contiguous nb//8 split
        # would orphan the remainder buckets when 8 does not divide nb)
        ("8x1", [([b for b in range(nb) if b % 8 == i], i, i)
                 for i in range(8)]),
    ]
    if nb < 8:
        modes = modes[:-1]  # fewer buckets than writers: skip 8x1
    results = []
    for tag, writers in modes:
        results.append(
            _run_mode(tag, events, args.events, nb, args.batch_size, writers)
        )
        print(json.dumps(results[-1]), flush=True)

    base = results[0]
    summary = {
        "events": args.events,
        "num_buckets": nb,
        "batch_size": args.batch_size,
        "modes": results,
        "state_converges": len({r["state_hash"] for r in results}) == 1,
        "throughput_ratio_2x4_vs_1x8": round(
            results[1]["events_per_sec"] / base["events_per_sec"], 3
        ),
        "throughput_ratio_4x2_vs_1x8": round(
            results[2]["events_per_sec"] / base["events_per_sec"], 3
        ),
        "throughput_ratio_8x1_vs_1x8": (
            round(results[3]["events_per_sec"] / base["events_per_sec"], 3)
            if len(results) > 3
            else None
        ),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    main()
