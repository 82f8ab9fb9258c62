"""Copy-on-write snapshot table with exactly-once, idempotent commits.

Modeled on the reference's S3 sink commit contract
(mex/extractors/sinks/s3.py:52-133: canonical serialization → sha256
checksum → versioned prefix → metadata document) generalized to Iceberg
snapshot semantics:

- data lives in immutable parquet files, hash-bucketed by the merge key
  ``(repo, path)`` so a batch rewrites ONLY the buckets it touches
  (copy-on-write at bucket granularity — at 100 TB a micro-batch touching
  5% of key-space rewrites 5% of files, not the table);
- each commit publishes a snapshot JSON listing every live file, the
  schema (with full schema history for evolved reads), per-bucket
  high-watermarks (max applied ``seq``), the set of applied batch ids,
  and an order-independent integrity checksum;
- publish is atomic: snapshot JSON written via tmp+rename, then the
  ``CURRENT`` pointer swapped with ``os.replace``. A crash after data
  files are written but before publish leaves orphan files that no
  snapshot references — a resume simply re-applies the batch
  (idempotent: same batch id, same content);
- re-applying an already-committed batch id is a no-op
  (reference run_key idempotency: mex/extractors/pipeline/base.py:101-104);
- events at-or-below a bucket's high-watermark are fenced out before the
  merge (redelivery safety).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from mex_extractors_spark.lake.schema_evolution import align_to_schema, merge_schemas
from mex_extractors_spark.operators.lww import apply_deletes, lww_latest

_BUCKET = "_bucket"


class CommitAborted(RuntimeError):
    """Raised by the crash-injection hook after data-file write, before
    snapshot publish — simulates a kill for exactly-once chaos tests."""


@dataclass
class ApplyStats:
    batch_id: str
    applied: bool
    events_in: int = 0
    events_fenced: int = 0
    upserts: int = 0  # non-fenced I/U events in the batch
    deletes: int = 0  # non-fenced D events in the batch
    buckets_touched: int = 0
    rows_after: int = 0
    seconds: float = 0.0
    # phase breakdown (lineage metric + perf triage)
    t_stats: float = 0.0
    t_write: float = 0.0
    t_checksum: float = 0.0


class LakeTable:
    """A single converged lake table keyed on ``key_cols`` with LWW by
    ``seq_col``. One writer per table (the replay driver), many readers.
    """

    def __init__(
        self,
        path: str,
        key_cols: Sequence[str] = ("repo", "path"),
        seq_col: str = "seq",
        op_col: str = "op",
        num_buckets: int = 16,
    ) -> None:
        self.path = path
        self.key_cols = list(key_cols)
        self.seq_col = seq_col
        self.op_col = op_col
        self.num_buckets = num_buckets
        self.ledger_dir = os.path.join(path, "_ledger")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.ledger_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------- ledger

    def current_snapshot(self) -> dict | None:
        cur = os.path.join(self.ledger_dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as fh:
            version = int(fh.read().strip())
        with open(os.path.join(self.ledger_dir, f"v{version:08d}.json")) as fh:
            return json.load(fh)

    def _publish(self, snapshot: dict) -> None:
        """Atomic two-step publish: snapshot file, then pointer swap."""
        version = snapshot["version"]
        snap_path = os.path.join(self.ledger_dir, f"v{version:08d}.json")
        tmp = snap_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(snapshot, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, snap_path)
        cur = os.path.join(self.ledger_dir, "CURRENT")
        tmp = cur + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, cur)

    def watermarks(self) -> dict[int, int]:
        snap = self.current_snapshot()
        if snap is None:
            return {}
        return {int(k): int(v) for k, v in snap["watermarks"].items()}

    def applied_batches(self) -> set[str]:
        snap = self.current_snapshot()
        return set(snap["applied_batches"]) if snap else set()

    def current_schema(self) -> StructType | None:
        snap = self.current_snapshot()
        if snap is None or not snap.get("schema_version"):
            return None
        return StructType.fromJson(snap["schemas"][str(snap["schema_version"])])

    # --------------------------------------------------------------- read

    def _bucket_expr(self) -> Column:
        """Bucket id = ``pmod(murmur3(key), num_buckets)`` — the EXACT
        expression Spark's ``hashpartitioning`` uses to place rows of a
        ``groupBy(key)`` shuffle. With the merge aggregation's shuffle
        set to ``num_buckets`` partitions, reduce partition i therefore
        holds exactly bucket i, so the merged output can be written
        ``partitionBy(_bucket)`` with NO extra repartition exchange and
        still land one file per bucket (AQE may coalesce whole
        partitions or split a skewed one — either keeps bucket dirs
        intact). One payload shuffle per micro-batch, total."""
        return F.pmod(F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.num_buckets))

    def read(self, spark: SparkSession, buckets: Sequence[int] | None = None) -> DataFrame:
        """Current table state. ``buckets`` prunes the scan to the named
        key-space partitions (the copy-on-write read path)."""
        snap = self.current_snapshot()
        schema = self.current_schema()
        if snap is None or schema is None or not snap["buckets"]:
            return spark.createDataFrame([], schema or StructType([]))
        wanted = set(buckets) if buckets is not None else None
        by_schema: dict[int, list[str]] = {}
        for b, meta in snap["buckets"].items():
            if wanted is not None and int(b) not in wanted:
                continue
            by_schema.setdefault(int(meta["schema_version"]), []).extend(
                os.path.join(self.path, f) for f in meta["files"]
            )
        parts: list[DataFrame] = []
        for sv, files in sorted(by_schema.items()):
            if not files:
                continue
            file_schema = StructType.fromJson(snap["schemas"][str(sv)])
            df = spark.read.schema(file_schema).parquet(*files)
            parts.append(align_to_schema(df, schema))
        if not parts:
            return spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -------------------------------------------------------------- write

    def apply_batch(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: str,
        crash_after_data: bool = False,
    ) -> ApplyStats:
        """MERGE a change-event batch into the table, exactly once.

        ``batch_df`` must contain ``key_cols + [seq_col, op_col]`` plus
        any payload columns. Payload schema may differ from the table's —
        the schema-merge step runs first (SURVEY.md §7 Phase 4).
        """
        t0 = time.monotonic()
        snap = self.current_snapshot()
        if snap is not None and batch_id in snap["applied_batches"]:
            return ApplyStats(batch_id=batch_id, applied=False)

        # --- fence redelivered events at/below each bucket's watermark
        obs = Observation()
        events = batch_df.observe(obs, F.count(F.lit(1)).alias("n")).withColumn(
            _BUCKET, self._bucket_expr()
        )
        watermarks = self.watermarks()
        if watermarks:
            # watermarks flow in as DATA (broadcast join), not as literal
            # expressions: literals are inlined into generated code, which
            # would force a fresh Janino compile of the whole scan+merge
            # stage on every micro-batch (a large constant cost per batch)
            wm_df = spark.createDataFrame(
                [(int(b), int(w)) for b, w in watermarks.items()],
                schema=f"{_BUCKET} long, _wm long",
            )
            fenced = (
                events.join(F.broadcast(wm_df), on=_BUCKET, how="left")
                .where(F.col(self.seq_col) > F.coalesce(F.col("_wm"), F.lit(-1)))
                .drop("_wm")
            )
        else:
            fenced = events

        # --- narrow pre-pass: per-bucket watermark + event counts.
        #     Column-pruned to (key, seq, op) — the parquet scan never
        #     touches payload columns, and the shuffle after map-side
        #     partial aggregation is ~num_buckets rows per input split.
        t_phase = time.monotonic()
        op_is_del = F.col(self.op_col) == "D"
        stats_rows = (
            fenced.groupBy(_BUCKET)
            .agg(
                F.max(self.seq_col).alias("wm"),
                F.sum(F.when(~op_is_del, 1).otherwise(0)).alias("ups"),
                F.sum(F.when(op_is_del, 1).otherwise(0)).alias("dels"),
                F.count(F.lit(1)).alias("kept"),
            )
            .collect()
        )
        try:
            events_in = int(obs.get["n"])
        except Exception:
            # Observation row can be schemaless when the observed job ends
            # empty (Spark edge case) — fall back to a direct count
            events_in = batch_df.count()
        touched = [int(r[_BUCKET]) for r in stats_rows]
        kept = sum(int(r["kept"]) for r in stats_rows)
        upserts = sum(int(r["ups"]) for r in stats_rows)
        deletes = sum(int(r["dels"]) for r in stats_rows)
        new_wm = {int(r[_BUCKET]): int(r["wm"]) for r in stats_rows}
        t_stats = time.monotonic() - t_phase

        if not touched:
            # still record the batch id so replay bookkeeping stays exact
            self._commit_noop(snap, batch_id)
            return ApplyStats(
                batch_id=batch_id,
                applied=True,
                events_in=events_in,
                events_fenced=events_in,
                seconds=time.monotonic() - t0,
            )

        # --- schema evolution before apply
        payload_schema = StructType(
            [f for f in fenced.schema.fields if f.name not in (_BUCKET, self.op_col)]
        )
        if snap is None or not snap.get("schema_version"):
            schemas = dict(snap["schemas"]) if snap else {}
            table_schema = payload_schema
            schema_version = 1
            schemas["1"] = table_schema.jsonValue()
        else:
            schemas = dict(snap["schemas"])
            old = StructType.fromJson(schemas[str(snap["schema_version"])])
            table_schema = merge_schemas(old, payload_schema)
            if table_schema.jsonValue() == old.jsonValue():
                schema_version = snap["schema_version"]
            else:
                schema_version = snap["schema_version"] + 1
                schemas[str(schema_version)] = table_schema.jsonValue()

        # --- copy-on-write merge of touched buckets only: ONE payload
        #     shuffle. The LWW aggregation over (current ∪ batch) is a
        #     max_by with map-side partial combine (hot keys pre-reduce on
        #     every input split), its exchange is hashpartitioning on the
        #     key with num_buckets partitions, and — because _bucket is
        #     the same murmur3-pmod (see _bucket_expr) — the aggregated
        #     partitions are already bucket-aligned, so partitionBy write
        #     needs no further repartition.
        schema_with_op = StructType([*table_schema.fields, fenced.schema[self.op_col]])
        batch_aligned = align_to_schema(fenced.drop(_BUCKET), schema_with_op)
        current = self.read(spark, buckets=touched)
        if len(current.columns) > 0:
            cur_aligned = align_to_schema(
                current.withColumn(self.op_col, F.lit("I")), schema_with_op
            )
            merged_in = cur_aligned.unionByName(batch_aligned)
        else:
            merged_in = batch_aligned
        merged = apply_deletes(
            lww_latest(merged_in, key_cols=self.key_cols, seq_col=self.seq_col),
            op_col=self.op_col,
        ).drop(self.op_col)
        merged = merged.withColumn(_BUCKET, self._bucket_expr())

        version = (snap["version"] + 1) if snap else 1
        rel_out = os.path.join("data", f"v{version:08d}")
        out_dir = os.path.join(self.path, rel_out)
        t_phase = time.monotonic()
        shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            # bucket-aligned exchange (single writer; restored right after)
            spark.conf.set("spark.sql.shuffle.partitions", str(self.num_buckets))
            merged.write.mode("overwrite").partitionBy(_BUCKET).parquet(out_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)
        t_write = time.monotonic() - t_phase

        if crash_after_data:
            raise CommitAborted(
                f"batch {batch_id}: data files written to {out_dir}, snapshot NOT published"
            )

        # --- per-bucket rows + order-independent integrity checksum,
        #     recomputed by READING BACK the files just written — the
        #     manifest certifies the bytes on storage, not the in-memory
        #     result (sha256-after-serialize contract, sinks/s3.py:106-109;
        #     cf. verify_bucket_checksums for the on-demand re-audit)
        t_phase = time.monotonic()
        written = spark.read.schema(
            StructType([*table_schema.fields, StructField(_BUCKET, IntegerType())])
        ).parquet(out_dir)
        canonical = F.to_json(F.struct(*sorted(table_schema.fieldNames())))
        bucket_stats = {
            int(r[_BUCKET]): (int(r["rows"]), str(r["checksum"]))
            for r in written.groupBy(_BUCKET)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(
                    F.sum(F.xxhash64(canonical).cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias("checksum"),
            )
            .collect()
        }
        t_checksum = time.monotonic() - t_phase

        # --- assemble + publish snapshot
        buckets_meta = dict(snap["buckets"]) if snap else {}
        for b in touched:
            bdir = os.path.join(out_dir, f"{_BUCKET}={b}")
            files = (
                sorted(
                    os.path.join(rel_out, f"{_BUCKET}={b}", f)
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                )
                if os.path.isdir(bdir)
                else []
            )
            rows, checksum = bucket_stats.get(b, (0, "0"))
            buckets_meta[str(b)] = {
                "files": files,
                "schema_version": schema_version,
                "rows": rows,
                "checksum": checksum,
            }
        old_wm = {int(k): int(v) for k, v in (snap["watermarks"] if snap else {}).items()}
        for b, wm in new_wm.items():
            old_wm[b] = max(old_wm.get(b, -1), wm)
        snapshot = {
            "version": version,
            "parent": snap["version"] if snap else None,
            "schema_version": schema_version,
            "schemas": schemas,
            "buckets": buckets_meta,
            "watermarks": {str(k): v for k, v in old_wm.items()},
            "applied_batches": sorted({*(snap["applied_batches"] if snap else []), batch_id}),
            "num_buckets": self.num_buckets,
            "key_cols": self.key_cols,
            "seq_col": self.seq_col,
            "total_rows": sum(m["rows"] for m in buckets_meta.values()),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._publish(snapshot)
        return ApplyStats(
            batch_id=batch_id,
            applied=True,
            events_in=events_in,
            events_fenced=events_in - kept,
            upserts=upserts,
            deletes=deletes,
            buckets_touched=len(touched),
            rows_after=snapshot["total_rows"],
            seconds=time.monotonic() - t0,
            t_stats=round(t_stats, 3),
            t_write=round(t_write, 3),
            t_checksum=round(t_checksum, 3),
        )

    def _commit_noop(self, snap: dict | None, batch_id: str) -> None:
        """Record a batch id whose events were all fenced (pure redelivery)."""
        if snap is None:
            snapshot = {
                "version": 1,
                "parent": None,
                "schema_version": 0,
                "schemas": {},
                "buckets": {},
                "watermarks": {},
                "applied_batches": [batch_id],
                "num_buckets": self.num_buckets,
                "key_cols": self.key_cols,
                "seq_col": self.seq_col,
                "total_rows": 0,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        else:
            snapshot = dict(snap)
            snapshot["version"] = snap["version"] + 1
            snapshot["parent"] = snap["version"]
            snapshot["applied_batches"] = sorted({*snap["applied_batches"], batch_id})
            snapshot["committed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        self._publish(snapshot)

    # ------------------------------------------------------------ utility

    def verify_bucket_checksums(self, spark: SparkSession) -> list[int]:
        """Read-back audit: recompute each bucket's row count and
        order-independent checksum from the files on disk and compare to
        the snapshot manifest. Returns the list of mismatching buckets
        (empty = table verified) — the sha256-after-serialize contract
        (sinks/s3.py:106-133) as an on-demand integrity scan."""
        snap = self.current_snapshot()
        if snap is None or not snap["buckets"]:
            return []
        schema = self.current_schema()
        df = self.read(spark).withColumn(_BUCKET, self._bucket_expr())
        canonical = F.to_json(F.struct(*sorted(schema.fieldNames())))
        actual = {
            int(r[_BUCKET]): (int(r["rows"]), str(r["checksum"]))
            for r in df.groupBy(_BUCKET)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(
                    F.sum(F.xxhash64(canonical).cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias("checksum"),
            )
            .collect()
        }
        bad = []
        for b, meta in snap["buckets"].items():
            got = actual.get(int(b), (0, "0"))
            if meta["rows"] and (got[0] != meta["rows"] or got[1] != str(meta["checksum"])):
                bad.append(int(b))
        return sorted(bad)

    def vacuum_orphans(self) -> int:
        """Delete data files not referenced by the current snapshot
        (crash leftovers). Returns count removed."""
        snap = self.current_snapshot()
        live: set[str] = set()
        if snap:
            for meta in snap["buckets"].values():
                live.update(meta["files"])
        removed = 0
        for root, _dirs, files in os.walk(self.data_dir):
            for f in files:
                full = os.path.join(root, f)
                rel = os.path.relpath(full, self.path)
                if f.endswith(".parquet") and rel not in live:
                    os.remove(full)
                    removed += 1
        for d in sorted(os.listdir(self.data_dir)):
            vd = os.path.join(self.data_dir, d)
            if os.path.isdir(vd) and not any(files for _r, _dd, files in os.walk(vd)):
                shutil.rmtree(vd)
        return removed
