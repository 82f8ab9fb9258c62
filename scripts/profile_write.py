#!/usr/bin/env python
"""Phase-decomposition profiler for the merge/write path.

Runs the SAME pre-generated event segment at several core counts and
times, separately:
  A. scan+normalize only            (noop sink)
  B. A + LWW merge agg              (noop sink)
  C. B + parquet encode+write       (real files, partitionBy bucket)
  D. read-back checksum agg         (collect)

Usage: python scripts/profile_write.py [--events 4000000] [--cores 2,8]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/spark-bench")


def run_one(cores: int, events_dir: str, num_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from bench import _bench_spark
    from mex_extractors_spark import synth
    from mex_extractors_spark.operators.lww import apply_deletes, lww_latest
    from mex_extractors_spark.sources.normalize import normalize_change_events

    spark = _bench_spark(cores, f"profile-{cores}", aqe=False)
    spark.conf.set("spark.sql.shuffle.partitions", str(num_buckets))
    schema = synth.events(spark, 1).schema
    out: dict[str, float] = {"cores": cores}

    def batch():
        return normalize_change_events(spark.read.schema(schema).parquet(events_dir))

    def merged():
        df = batch().withColumn(
            "_bucket", F.pmod(F.hash("repo", "path"), F.lit(num_buckets))
        )
        m = apply_deletes(
            lww_latest(df.drop("_bucket"), key_cols=["repo", "path"], seq_col="seq"),
            op_col="op",
        ).drop("op")
        return m.withColumn("_bucket", F.pmod(F.hash("repo", "path"), F.lit(num_buckets)))

    # warm-up (JIT) on a 200k-row slice
    batch().where(F.col("seq") % 40 == 0).write.format("noop").mode("overwrite").save()
    merged_warm = merged()
    merged_warm.where(F.col("seq") % 40 == 0).write.format("noop").mode("overwrite").save()

    def best_of(n, fn):
        times = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        return round(min(times), 2)

    out["A_scan_normalize"] = best_of(
        2, lambda: batch().write.format("noop").mode("overwrite").save()
    )
    out["B_plus_merge"] = best_of(
        2, lambda: merged().write.format("noop").mode("overwrite").save()
    )

    tmp = tempfile.mkdtemp(prefix="profile_out_", dir=BENCH_TMP)
    try:
        # profile the SHIPPED write path (bucketBy/saveAsTable via
        # LakeTable._write_bucketed), not the legacy partitionBy write —
        # phase C must measure what apply_batch actually does
        from mex_extractors_spark.lake.table import LakeTable

        prof_table = LakeTable(tmp, num_buckets=num_buckets)
        bucketed_out = os.path.join(tmp, "data_phase_c")

        def _write_shipped():
            prof_table._write_bucketed(spark, merged().drop("_bucket"), bucketed_out)

        out["C_plus_parquet_write"] = best_of(2, _write_shipped)

        def readback():
            w = spark.read.parquet(bucketed_out).withColumn(
                "_bucket", F.pmod(F.hash("repo", "path"), F.lit(num_buckets))
            )
            canonical = F.to_json(
                F.struct(*sorted(c for c in w.columns if c != "_bucket"))
            )
            w.groupBy("_bucket").agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.xxhash64(canonical).cast("decimal(38,0)")).alias("checksum"),
            ).collect()

        out["D_readback_checksum"] = best_of(2, readback)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--events-dir", default=None)
    ap.add_argument("--one-core-count", type=int, default=None)
    args = ap.parse_args()

    if args.one_core_count is not None:
        print(json.dumps(run_one(args.one_core_count, args.events_dir, args.buckets)))
        return

    from bench import _bench_spark, gen_events

    os.makedirs(BENCH_TMP, exist_ok=True)
    shared = tempfile.mkdtemp(prefix="profile_ev_", dir=BENCH_TMP)
    try:
        spark = _bench_spark(32, "profile-gen")
        n_repos = max(2_000, args.events // 800)
        gen_events(spark, os.path.join(shared, "ev"), args.events, 1, n_repos, 200)
        spark.stop()
        seg = os.path.join(shared, "ev", "_segment=0")
        for cores in (int(c) for c in args.cores.split(",")):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--one-core-count={cores}", f"--events-dir={seg}",
                 f"--buckets={args.buckets}"],
                capture_output=True, text=True, cwd=REPO)
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not lines:
                sys.stderr.write(r.stdout + "\n" + r.stderr)
                raise SystemExit(f"profile at {cores} failed")
            print(lines[-1], flush=True)
    finally:
        shutil.rmtree(shared, ignore_errors=True)


if __name__ == "__main__":
    main()
