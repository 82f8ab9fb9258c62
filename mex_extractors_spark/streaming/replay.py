"""Micro-batch replay driver: change stream → converged lake table.

The reference's incremental behavior is orchestration-level — a sensor
that triggers the publisher with an idempotent ``run_key`` once upstream
extractors finish (mex/extractors/pipeline/base.py:46-104). Here the same
contract is a deterministic micro-batch loop with the exactly-once
guarantees pushed into the table commit:

- the event stream is partitioned into batches by ``seq`` range, so
  every event belongs to exactly one batch no matter how the physical
  files are ordered or duplicated (out-of-order / at-least-once safe);
- batch id = the seq range (the ``run_key`` analog): a re-run of an
  already-committed batch is a no-op; a crashed batch (data written,
  snapshot unpublished) is re-applied from scratch and converges to the
  identical snapshot;
- resume = read the ledger, skip committed batches, continue.

A Structured Streaming ``foreachBatch`` front-end wraps the same apply
path for file-source streams (``trigger(availableNow=True)`` is the
scheduled-cron analog, SURVEY.md §2.9 T1).
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mex_extractors_spark.lake.table import ApplyStats, CommitAborted, LakeTable
from mex_extractors_spark.streaming.metrics import MetricsLog


class CheckFailed(RuntimeError):
    """A blocking pre-commit check failed; the batch was not committed
    (reference blocking asset checks: mex/extractors/pipeline/base.py:113)."""


def batch_id_for_range(lo: int, hi: int) -> str:
    return f"seq:{lo}-{hi}"


def _local_ckpt_path(checkpoint_dir: str) -> str | None:
    """Filesystem path of a checkpoint location, or None when it lives
    on a remote scheme (hdfs://, s3a://, ...) this process cannot stat.
    Spark accepts both bare paths and file: URIs for the same dir — the
    two spellings must resolve identically or the stream namespace (and
    the era marker below) would silently fork."""
    if "://" not in checkpoint_dir and not checkpoint_dir.startswith("file:"):
        return os.path.abspath(checkpoint_dir)
    from urllib.parse import urlparse

    parsed = urlparse(checkpoint_dir)
    if parsed.scheme in ("", "file"):
        return os.path.abspath(parsed.path)
    return None


_NS_MARKER = "_mex_stream_ns"


def _legacy_stream_acks(
    table: LakeTable, checkpoint_dir: str, ns: str
) -> set[str]:
    """Ledger continuity across the stream-id format change, scoped to
    the only case where it is safe: RESUMING a pre-namespacing
    checkpoint. Tables written by the old bare ``stream:{N}`` format
    hold acks the new ``stream:{ns}:{N}`` ids no longer match, so
    Spark's restart redelivery of the last in-flight batch would
    re-apply once (masked by LWW idempotence, but counts/provenance
    drift). The legacy acks are honored ONLY when

    - the checkpoint is local (a remote checkpointLocation cannot be
      statted from here — grace off, the safe default: worst case is
      the one idempotent re-apply the old code always did), and
    - it has prior progress (a non-empty ``offsets`` log — a FRESH
      checkpoint is a new stream whose batch numbering coincidentally
      restarts at 0; skipping ITS batches against another stream's
      legacy acks is exactly the lost-update bug the namespacing
      fixed), and
    - it carries NO era marker (``stream_from_files`` drops
      ``_mex_stream_ns`` into every checkpoint it starts under the new
      format, BEFORE the query runs — so a post-change checkpoint that
      crashed between Spark's offsets write and its first table commit
      is still recognized as post-change and gets no grace), and
    - this checkpoint's namespace has no committed ids yet (after the
      first namespaced commit the upgrade grace window is over — any
      later bare-id match would belong to some other pre-change
      stream, not this one).
    """
    local = _local_ckpt_path(checkpoint_dir)
    if local is None:
        return set()
    if os.path.exists(os.path.join(local, _NS_MARKER)):
        return set()
    try:
        resuming = bool(os.listdir(os.path.join(local, "offsets")))
    except OSError:
        resuming = False
    if not resuming:
        return set()
    applied = table.applied_batches()
    if any(b.startswith(f"stream:{ns}:") for b in applied):
        return set()
    return {b for b in applied if re.fullmatch(r"stream:\d+", b)}


class ReplayEngine:
    def __init__(
        self,
        table: LakeTable,
        metrics: MetricsLog | None = None,
        normalize: Callable[[DataFrame], DataFrame] | None = None,
        pre_commit_checks: list[Callable[[DataFrame], str | None]] | None = None,
        state_audits: list[Callable[[DataFrame], str | None]] | None = None,
    ) -> None:
        """``normalize`` maps raw heterogeneous batches to the common
        schema (SURVEY.md §7 Phase 2); ``pre_commit_checks`` run on each
        normalized batch and abort the commit by returning an error
        string (blocking checks, SURVEY.md §2.5 A6 / §2.9 T4).

        ``state_audits`` check the POST-commit table state — invariants
        a batch-level check cannot express (key uniqueness after the
        merge, total row-count bounds vs history). When set, every
        batch goes through the write-audit-publish path: staged on a
        throwaway branch, audited, and only then fast-forwarded to
        main, so readers never observe a state that failed its audit.
        """
        self.table = table
        self.metrics = metrics
        self.normalize = normalize
        self.pre_commit_checks = pre_commit_checks or []
        self.state_audits = state_audits or []

    def _apply_one(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: str,
        crash_after_data: bool = False,
    ) -> ApplyStats:
        if self.normalize is not None:
            batch = self.normalize(batch)
        for check in self.pre_commit_checks:
            err = check(batch)
            if err:
                raise CheckFailed(f"batch {batch_id}: {err}")
        if self.state_audits and not crash_after_data:

            def _audit(state: DataFrame) -> str | None:
                for audit in self.state_audits:
                    err = audit(state)
                    if err:
                        return err
                return None

            stats = self.table.write_audit_publish(
                spark, batch, batch_id, _audit
            )
        else:
            stats = self.table.apply_batch(
                spark, batch, batch_id, crash_after_data=crash_after_data
            )
        if self.metrics is not None:
            self.metrics.append(stats)
        return stats

    def replay(
        self,
        spark: SparkSession,
        events: DataFrame,
        seq_min: int,
        seq_max: int,
        batch_size: int,
        seq_col: str | None = None,
        crash_on_batch: str | None = None,
        buckets: "list[int] | None" = None,
    ) -> list[ApplyStats]:
        """Replay ``events`` into the table in ``seq``-range micro-batches.

        ``events`` may contain duplicates and arbitrary physical order;
        range predicates (pushed down to the parquet scan) slice it into
        deterministic batches. ``crash_on_batch`` injects a kill after
        that batch's data files are written (chaos testing).

        ``buckets`` partitions the WRITERS: this replay applies only the
        events whose key hashes into the given buckets, so K separate
        driver processes can ingest one table in parallel, each owning a
        disjoint bucket subset — their commits never touch the same
        bucket, and the table's optimistic-concurrency protocol rebases
        their interleaved commits instead of failing them. Batch ids are
        suffixed with the owned bucket set, keeping each writer's
        idempotency ledger entries distinct. Every writer must replay
        the same seq ranges over the same stream for the table to
        converge to the full state.
        """
        seq_col = seq_col or self.table.seq_col
        done = self.table.applied_batches()
        owned = sorted(set(buckets)) if buckets is not None else None
        suffix = ""
        if owned is not None:
            if self.state_audits:
                # WAP audits validate the GLOBAL post-commit state and
                # publish via fast_forward, which has no rebase path —
                # a concurrent writer's main commit would abort the
                # audit. State audits require a single writer.
                raise ValueError(
                    "state_audits cannot be combined with bucket-"
                    "partitioned parallel ingest (buckets=...) — audits "
                    "validate global state and need a single writer"
                )
            if not owned or not all(
                0 <= b < self.table.num_buckets for b in owned
            ):
                raise ValueError(
                    f"buckets must be within 0..{self.table.num_buckets - 1}"
                )
            if self.normalize is not None:
                # the ownership filter below hashes table.key_cols on
                # the RAW frame; a normalize hook that renames or
                # rewrites key columns would break it (missing column)
                # or — worse — route events by pre-normalized values so
                # every writer silently drops them. Parallel ingest
                # takes pre-normalized streams only.
                raise ValueError(
                    "bucket-partitioned parallel ingest (buckets=...) "
                    "cannot be combined with a normalize hook — the "
                    "writer-ownership filter hashes the table key "
                    "columns on the raw stream. Normalize the events "
                    "first, then replay the normalized frame."
                )
            ids = ",".join(map(str, owned))
            if len(ids) > 32:  # wide ownership sets: fixed-width digest
                ids = "h" + hashlib.sha1(ids.encode()).hexdigest()[:12]
            suffix = f"@b{ids}"
            events = events.withColumn(
                "__wb", self.table._bucket_expr()
            ).where(F.col("__wb").isin(owned)).drop("__wb")
        # watermark floor: once EVERY owned bucket's fence is >= hi, a
        # batch is provably pure redelivery without any Spark job — this
        # keeps a full-history restart O(1) per old batch even after its
        # id has rotated out of the table's bounded idempotency window
        wm = self.table.watermarks()
        scope = owned if owned is not None else range(self.table.num_buckets)
        wm_floor = (
            min(wm.get(b, -1) for b in scope) if len(wm) else -1
        )
        out: list[ApplyStats] = []
        n_batches = max(1, math.ceil((seq_max - seq_min + 1) / batch_size))
        for i in range(n_batches):
            lo = seq_min + i * batch_size
            hi = min(seq_max, lo + batch_size - 1)
            base_bid = batch_id_for_range(lo, hi)
            bid = base_bid + suffix
            if bid in done or hi <= wm_floor:
                out.append(ApplyStats(batch_id=bid, applied=False))
                continue
            batch = events.where((F.col(seq_col) >= lo) & (F.col(seq_col) <= hi))
            # chaos hooks may name the bare seq-range id; match it with
            # or without the writer's bucket-ownership suffix
            stats = self._apply_one(
                spark,
                batch,
                bid,
                crash_after_data=crash_on_batch in (bid, base_bid),
            )
            out.append(stats)
        return out

    def replay_files(
        self,
        spark: SparkSession,
        batches: list[tuple[str, list[str]]],
        schema=None,
        crash_on_batch: str | None = None,
    ) -> list[ApplyStats]:
        """Replay from explicit per-batch file lists — binlog/offset-style
        tailing (each batch = a set of closed segment files), the way a
        WAL/Kafka source actually delivers data.

        Besides fidelity, this keeps every batch's physical plan
        byte-identical (file lists are scan parameters, not expression
        literals), so whole-stage codegen compiles ONCE for the whole
        replay instead of once per batch — at micro-batch cadence the
        per-batch JIT constant otherwise dominates wall time.
        """
        done = self.table.applied_batches()
        out: list[ApplyStats] = []
        for bid, paths in batches:
            if bid in done:
                out.append(ApplyStats(batch_id=bid, applied=False))
                continue
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            batch = reader.parquet(*paths)
            stats = self._apply_one(
                spark, batch, bid, crash_after_data=(bid == crash_on_batch)
            )
            out.append(stats)
        return out

    # ----------------------------------------------- structured streaming

    def stream_from_files(
        self,
        spark: SparkSession,
        source_dir: str,
        schema,
        checkpoint_dir: str,
        available_now: bool = True,
        file_format: str = "parquet",
    ):
        """Structured Streaming front-end: tail a directory of event files
        and upsert each micro-batch through the same exactly-once apply.

        Spark's checkpoint gives at-least-once batch delivery across
        restarts; the table's batch-id ledger + per-bucket watermark
        fencing upgrade it to exactly-once table state.
        """
        stream = (
            spark.readStream.format(file_format).schema(schema).load(source_dir)
        )
        # ledger ids are namespaced by the CHECKPOINT: Spark's batch ids
        # restart at 0 for every fresh checkpoint, so a bare
        # "stream:{id}" from a second stream (new source dir, reset
        # checkpoint) would collide with the first stream's applied ids
        # and silently no-op its first micro-batches. Same checkpoint →
        # same namespace → restarts stay exactly-once.
        local_ckpt = _local_ckpt_path(checkpoint_dir)
        ns = hashlib.sha1(
            (local_ckpt or checkpoint_dir).rstrip("/").encode()
        ).hexdigest()[:10]
        # evaluate the upgrade grace BEFORE branding the checkpoint:
        # a genuinely pre-change checkpoint is recognized exactly once
        legacy_applied = _legacy_stream_acks(self.table, checkpoint_dir, ns)
        if local_ckpt is not None:
            # era marker: written before the query starts, so even a
            # crash inside the very first micro-batch leaves proof this
            # checkpoint was created under the namespaced format
            os.makedirs(local_ckpt, exist_ok=True)
            marker = os.path.join(local_ckpt, _NS_MARKER)
            if not os.path.exists(marker):
                with open(marker, "w") as fh:
                    fh.write(ns)

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            if f"stream:{batch_id}" in legacy_applied:
                return
            self._apply_one(spark, batch_df, f"stream:{ns}:{batch_id}")

        writer = stream.writeStream.foreachBatch(_sink).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
