#!/usr/bin/env python
"""Benchmark harness.

Default mode prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- headline: CDC replay of a deterministic synthetic change stream
  (n scaled by sf) into a copy-on-write lake table, end-to-end
  (normalize → fence → LWW merge → commit → sha-manifest), reported as
  wall seconds (+ events/sec extra key);
- queries: wall seconds per headline operator query at $SPARK_GRAFT_SF_DIR.

``--scaling`` runs the identical replay at local[8] and local[32]
(stand-ins for N and 4N executors) in separate processes and writes
BENCH/BASELINE.md with both throughputs + scaling efficiency
(north rule: efficiency >= 0.8).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "cdc_converged_state",
    "w1_lww_latest_event",
    "a1_pricing_summary",
    "j1_broadcast_dim_join",
    "w6_rank_topn_per_group",
    "d1_exact_duplicates",
    "d2_ngram_jaccard",
    "d3_minhash_lsh_neardup",
    "sim1_cosine_topk",
    "t2_quality_scores",
    "t4_fingerprint",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def replay_bench(cores: int, n_events: int, batches: int = 8) -> dict:
    """End-to-end replay throughput at the given parallelism."""
    from mex_extractors_spark import synth
    from mex_extractors_spark.lake.table import LakeTable
    from mex_extractors_spark.session import get_spark
    from mex_extractors_spark.streaming.replay import ReplayEngine

    spark = get_spark(
        app_name=f"bench-replay-{cores}",
        cores=cores,
        shuffle_partitions=max(cores, 8),
        # many small event files per seq-range batch: keep scan splits
        # fine-grained so a batch's scan parallelizes across all cores
        # (identical input layout at every parallelism level)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            # commit task outputs directly (no serial driver-side rename
            # pass) and skip _SUCCESS markers: the bucket-file commit cost
            # is pure constant overhead per micro-batch
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
            # shuffle blocks on tmpfs: on a real cluster shuffle I/O
            # scales out with executors; a single box's disk does not —
            # without this the bench measures the disk, not the engine
            "spark.local.dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        },
    )
    tmp = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        # binlog-segment layout: one directory of closed files per batch
        # (offset-style tailing; also keeps every batch's physical plan
        # identical so codegen compiles once for the whole replay)
        from pyspark.sql import functions as F

        events_path = os.path.join(tmp, "events")
        batch_size = (n_events + batches - 1) // batches
        ev = synth.events(
            spark, n_events, n_repos=2000, paths_per_repo=100, num_partitions=batches * 64
        )
        (
            ev.withColumn(
                "_segment", ((F.col("seq") - 1) / F.lit(batch_size)).cast("int")
            )
            .repartitionByRange(batches * 64, "_segment", "seq")
            .write.partitionBy("_segment")
            .parquet(events_path)
        )
        # layout constant across cluster sizes: identical input AND
        # identical table (the scaling knob is executors, nothing else)
        table = LakeTable(os.path.join(tmp, "lake"), num_buckets=32)
        engine = ReplayEngine(table)
        schema = synth.events(spark, 1).schema
        file_batches = [
            (
                f"segment:{b}",
                [os.path.join(events_path, f"_segment={b}")],
            )
            for b in range(batches)
        ]
        t0 = time.monotonic()
        stats = engine.replay_files(spark, file_batches, schema=schema)
        dt = time.monotonic() - t0
        rows = table.current_snapshot()["total_rows"]
        return {
            "cores": cores,
            "events": n_events,
            "batches": len(stats),
            "seconds": round(dt, 3),
            "events_per_sec": round(n_events / dt, 1),
            "final_rows": rows,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def query_bench(spark, sf_dir: str) -> dict[str, float]:
    from mex_extractors_spark.plans.queries import REGISTRY

    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qd = REGISTRY.get(name)
        if qd is None:
            continue
        t0 = time.monotonic()
        df = qd.fn(spark, sf_dir)
        n = df.count()
        out[name] = round(time.monotonic() - t0, 3)
        _ = n
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="write BENCH/BASELINE.md")
    ap.add_argument("--replay-only", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--events", type=int, default=None)
    args = ap.parse_args()

    sf = _sf_from_dir(SF_DIR)
    n_events = args.events or max(100_000, int(10_000_000 * sf))

    if args.replay_only:
        res = replay_bench(args.cores or CPUS, n_events)
        print(json.dumps(res))
        return

    if args.scaling:
        results = []
        for cores in (8, 32):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--replay-only",
                    f"--cores={cores}",
                    f"--events={n_events}",
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results.append(json.loads(line))
        t8, t32 = results
        eff = (t32["events_per_sec"] / t8["events_per_sec"]) / (32 / 8)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
            fh.write(
                "# BENCH baseline — CDC replay scaling evidence\n\n"
                "Same job (deterministic synthetic change stream → converged\n"
                "copy-on-write lake table, exactly-once commits, sha-manifest)\n"
                "run at two parallelism levels on identical input — the sandbox\n"
                "stand-in for N vs 4N executors (north rule: efficiency ≥ 0.8).\n\n"
                f"- events: {n_events:,} (sf={sf})\n"
                f"- local[8]:  {t8['seconds']} s → {t8['events_per_sec']:,} events/s\n"
                f"- local[32]: {t32['seconds']} s → {t32['events_per_sec']:,} events/s\n"
                f"- speedup 8→32 cores: {t32['events_per_sec']/t8['events_per_sec']:.2f}x"
                f" (ideal 4x)\n"
                f"- **scaling efficiency: {eff:.2f}**\n\n"
                f"final table rows: {t32['final_rows']:,} (identical at both sizes)\n"
            )
        print(json.dumps({"scaling_efficiency": round(eff, 3), "r8": t8, "r32": t32}))
        return

    from mex_extractors_spark.session import get_spark

    replay = replay_bench(args.cores or CPUS, n_events)
    spark = get_spark(app_name="bench-queries", cores=args.cores or CPUS)
    qtimes = query_bench(spark, SF_DIR)
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "cdc_replay_end_to_end",
                "value": replay["seconds"],
                "unit": "sec",
                "events": replay["events"],
                "events_per_sec": replay["events_per_sec"],
                "final_rows": replay["final_rows"],
                "queries": qtimes,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
