#!/usr/bin/env python
"""Measure the predicate-DML scale claims (BENCH/DML.md).

Claims under test, on a 32-bucket lake at ~600k converged rows (tmpfs):

1. A key-point DELETE rewrites exactly ONE bucket — wall time and bytes
   written shrink by ~num_buckets vs a predicate that touches every
   bucket (the rewrite cost is proportional to TOUCHED data, not table
   size).
2. A zero-match DELETE (stats-proven absent value) commits a pure
   bookkeeping snapshot — no scan-sized job, no bytes.
3. MERGE INTO cost tracks the touched-bucket count: a small source that
   happens to hash into k buckets rewrites k buckets, not the table.

Protocol: pre-built table reused across probes via rollback_to (each
probe rolls its commit back, so every measurement sees the identical
base snapshot); best-of-3 wall times; bytes = sum of manifest file
sizes written by the commit's version dir.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mex_extractors_spark import synth  # noqa: E402
from mex_extractors_spark.lake.table import LakeTable  # noqa: E402
from mex_extractors_spark.session import get_spark  # noqa: E402
from mex_extractors_spark.sources.normalize import normalize_change_events  # noqa: E402

BASE = os.environ.get("DML_PROBE_DIR", "/dev/shm/dml_probe")
N_EVENTS = int(os.environ.get("DML_PROBE_EVENTS", "2000000"))
BUCKETS = 32
REPEATS = 3


def dir_bytes(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def version_dir(table: LakeTable, version: int) -> str | None:
    snap = table.snapshot_at(version)
    if not snap:
        return None
    dirs = set()
    for meta in snap["buckets"].values():
        for rel in meta["files"]:
            dirs.add(os.path.dirname(rel))
    # files written BY this commit live in dirs named v{version:08d}-*
    mine = [d for d in dirs if os.path.basename(d).startswith(f"v{version:08d}-")]
    return os.path.join(table.path, mine[0]) if mine else None


def timed(fn, after=None):
    """Best-of-REPEATS wall time of ``fn`` ALONE — ``after`` (bytes
    measurement, base-snapshot rollback) runs between repeats with the
    clock stopped, so probe bookkeeping never pads the published number."""
    best = None
    out = None
    for _ in range(REPEATS):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
        if after is not None:
            after(out)
    return best, out


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE, exist_ok=True)
    spark = get_spark(
        app_name="dml-probe",
        cores=8,
        shuffle_partitions=BUCKETS,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    table = LakeTable(
        os.path.join(BASE, "lake"),
        num_buckets=BUCKETS,
        key_cols=["repo", "path"],
        stats_cols=["lang"],
    )
    # high key cardinality (~n_repos*50 paths) so the converged state is
    # rewrite-sized — the probe contrasts touched-bucket cost vs table
    # size, which a toy state would hide behind fixed job costs
    ev = normalize_change_events(
        synth.events(spark, N_EVENTS, n_repos=int(os.environ.get("DML_PROBE_REPOS", "20000")))
    )
    table.apply_batch(spark, ev, "base")
    base_v = table.current_snapshot()["version"]
    state_rows = table.read(spark).count()
    table_bytes = dir_bytes(table.data_dir)
    one_key = table.read(spark).select("repo", "path").first()
    results: dict = {
        "events": N_EVENTS,
        "state_rows": state_rows,
        "num_buckets": BUCKETS,
        "table_bytes": table_bytes,
        "repeats_min_of": REPEATS,
    }

    # --- 1a. key-point delete: one bucket
    def probe(tag, fn):
        stats_box = {"n": 0, "bytes": 0}

        def run():
            stats_box["n"] += 1
            return fn(tag + str(stats_box["n"]))

        def cleanup(st):
            # clock is stopped here: bytes walk + base rollback are
            # probe bookkeeping, not part of the DML being measured
            if st.applied and st.buckets_rewritten:
                vd = version_dir(table, st.version)
                stats_box["bytes"] = dir_bytes(vd) if vd else 0
            table.rollback_to(base_v)

        secs, st = timed(run, after=cleanup)
        return {
            "seconds": round(secs, 3),
            "matched": st.matched,
            "buckets_rewritten": st.buckets_rewritten,
            "bytes_written": stats_box["bytes"],
        }

    results["delete_point_key"] = probe(
        "dp",
        lambda cid: table.delete_where(
            spark,
            [("repo", "=", one_key["repo"]), ("path", "=", one_key["path"])],
            cid,
        ),
    )
    # --- 1b. every-bucket delete (lang spreads across all key hashes)
    results["delete_all_buckets"] = probe(
        "da", lambda cid: table.delete_where(spark, [("lang", "=", "go")], cid)
    )
    # --- 2. zero-match delete: stats prove the value absent everywhere
    results["delete_zero_match"] = probe(
        "dz",
        lambda cid: table.delete_where(
            spark, [("lang", "=", "cobol-2090")], cid
        ),
    )

    # --- 3. merge sources of increasing key counts
    state = table.read(spark)
    for n_src in (4, 400, 40000):
        src = (
            state.orderBy("repo", "path")
            .limit(n_src)
            .select("repo", "path", "seq", F.lit("merged").alias("lang"))
        )
        src.cache().count()
        results[f"merge_src_{n_src}"] = probe(
            f"m{n_src}-",
            lambda cid: table.merge_into(
                spark,
                src,
                cid,
                when_matched_update={"lang": F.col("s.lang")},
            ),
        )
        src.unpersist()

    out_path = os.path.join(REPO, "BENCH", "dml_probe.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))
    spark.stop()
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
