#!/usr/bin/env python
"""Cluster job entrypoint: replay a change-event stream into a lake table.

The same artifact runs locally and on a real multi-executor cluster —
all engine code is plain ``pyspark.sql`` with no custom jars:

    zip -r mex_extractors_spark.zip mex_extractors_spark
    spark-submit \
      --py-files mex_extractors_spark.zip \
      --conf spark.sql.shuffle.partitions=<num-buckets> \
      scripts/replay_job.py \
      --events-dir hdfs:///streams/repo-changes \
      --table-dir  /shared/lake/repo_files \
      --num-buckets 4096

Reads segment directories (``_segment=N``) produced by a binlog/WAL
tailer (see ``bench.gen_events`` for the layout), applies each as one
exactly-once micro-batch, and prints per-batch lineage metrics. Re-running
after a crash resumes from the snapshot ledger automatically.

For the sandbox scaling evidence the same job is driven by ``bench.py
--scaling`` at several ``local[N]`` parallelism levels; on a real cluster
the N-vs-4N comparison is executor count via ``--num-executors``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-dir", required=True, help="dir of _segment=N subdirs")
    ap.add_argument("--table-dir", required=True)
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--metrics", default=None, help="metrics jsonl path")
    ap.add_argument(
        "--no-normalize", action="store_true",
        help="skip the normalize stage (events already in the common schema)",
    )
    ap.add_argument(
        "--fixed-schema", action="store_true",
        help="read every segment with segment 0's schema: identical plans "
        "=> whole-stage codegen compiles once for the whole replay. Only "
        "safe when the stream schema is fixed — columns added in later "
        "segments would be dropped at scan time. Default: infer per "
        "segment so schema evolution flows through.",
    )
    ap.add_argument(
        "--merge-mode", default="cow", choices=("cow", "mor", "auto"),
        help="write strategy: cow rewrites touched buckets per batch; "
        "mor appends delta files (trickle-ingest regime — pair with "
        "--compact-every); auto picks per batch",
    )
    ap.add_argument(
        "--compact-every", type=int, default=0, metavar="N",
        help="run table.compact() after every N applied segments "
        "(0 = never; mor deltas also fold on the max_deltas_per_bucket "
        "escalation regardless)",
    )
    ap.add_argument(
        "--stats-cols", default=None, metavar="COL,COL",
        help="comma-separated columns to track file-level manifest "
        "stats for (min/max/null counts + capped value sets) — enables "
        "data-skipping reads via table.read(where=...)",
    )
    ap.add_argument(
        "--audit-state", action="store_true",
        help="route every batch through write-audit-publish: staged on "
        "an audit branch, post-commit state checked (non-empty, unique "
        "keys), fast-forwarded to main only on pass — readers never "
        "observe a state that failed its audit",
    )
    ap.add_argument(
        "--maintain-every", type=int, default=0, metavar="N",
        help="run table.maintenance() (compact + snapshot expiry + "
        "orphan vacuum) after every N applied segments (0 = never)",
    )
    args = ap.parse_args()

    # configuration comes from spark-submit; only engine invariants here
    spark = (
        SparkSession.builder.appName("mex-cdc-replay")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from mex_extractors_spark.lake.table import LakeTable
    from mex_extractors_spark.sources.normalize import normalize_change_events
    from mex_extractors_spark.streaming.metrics import MetricsLog
    from mex_extractors_spark.streaming.replay import ReplayEngine

    segments = sorted(
        (int(d.split("=", 1)[1]), os.path.join(args.events_dir, d))
        for d in os.listdir(args.events_dir)
        if d.startswith("_segment=")
    )
    if not segments:
        raise SystemExit(f"no _segment=N dirs under {args.events_dir}")

    from pyspark.sql import functions as F

    table = LakeTable(
        args.table_dir,
        num_buckets=args.num_buckets,
        merge_mode=args.merge_mode,
        stats_cols=args.stats_cols.split(",") if args.stats_cols else None,
    )
    audits = None
    if args.audit_state:
        def _unique_keys(state):
            n, k = state.agg(
                F.count(F.lit(1)), F.count_distinct(*[F.col(c) for c in table.key_cols])
            ).first()
            if n == 0:
                return "published state would be empty"
            if n != k:
                return f"duplicate keys in state ({n} rows, {k} keys)"
            return None

        audits = [_unique_keys]
    engine = ReplayEngine(
        table,
        metrics=MetricsLog(args.metrics) if args.metrics else None,
        normalize=None if args.no_normalize else normalize_change_events,
        state_audits=audits,
    )
    schema = spark.read.parquet(segments[0][1]).schema if args.fixed_schema else None
    t0 = time.monotonic()
    if args.compact_every > 0 or args.maintain_every > 0:
        stats = []
        for n, (i, p) in enumerate(segments, start=1):
            stats.extend(
                engine.replay_files(spark, [(f"segment:{i}", [p])], schema=schema)
            )
            if args.compact_every and n % args.compact_every == 0:
                table.compact(spark)
            if args.maintain_every and n % args.maintain_every == 0:
                table.maintenance(spark)
    else:
        stats = engine.replay_files(
            spark, [(f"segment:{i}", [p]) for i, p in segments], schema=schema
        )
    wall = time.monotonic() - t0
    applied = [s for s in stats if s.applied]
    print(
        json.dumps(
            {
                "segments": len(stats),
                "applied": len(applied),
                "resumed_skips": len(stats) - len(applied),
                "events": sum(s.events_in for s in applied),
                "seconds": round(wall, 2),
                "final_rows": (table.current_snapshot() or {}).get("total_rows", 0),
                "batch_seconds": [round(s.seconds, 2) for s in applied],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
