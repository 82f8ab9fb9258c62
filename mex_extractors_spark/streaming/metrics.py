"""Per-batch lineage + throughput metrics (north rule: "per-partition
lineage + metrics" emitted each micro-batch).

The reference logs progress every N items (mex/extractors/logging.py:35-57)
and evaluates count-based quality rules against materialization history
(mex/extractors/pipeline/checks/main.py:152-215). Here each batch appends
one JSON line to a metrics ledger next to the table; historical checks
query this file back as a DataFrame.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from mex_extractors_spark.lake.table import ApplyStats


class MetricsLog:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, stats: ApplyStats, extra: dict | None = None) -> None:
        rec = {
            "batch_id": stats.batch_id,
            "applied": stats.applied,
            "events_in": stats.events_in,
            "events_invalid": stats.events_invalid,
            "events_fenced": stats.events_fenced,
            "upserts": stats.upserts,
            "deletes": stats.deletes,
            "buckets_touched": stats.buckets_touched,
            "rows_after": stats.rows_after,
            "seconds": round(stats.seconds, 4),
            "events_per_sec": round(stats.events_in / stats.seconds, 2)
            if stats.seconds > 0
            else None,
        }
        rec.update(extra or {})
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec, sort_keys=True) + "\n")

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.path)

    def history(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
