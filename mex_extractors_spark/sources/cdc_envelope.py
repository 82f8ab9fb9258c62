"""Debezium/Maxwell-style CDC envelope normalization (binlog/WAL tail).

Production change streams do not arrive as flat typed rows: a binlog /
WAL tailer (Debezium, Maxwell, DMS) publishes JSON *envelopes* —
``{before, after, source{lsn,file,pos,ts_ms,...}, op, ts_ms,
transaction{id,total_order}}`` — optionally nested one level under
``payload`` (Kafka JsonConverter with schemas enabled), with deletes
followed by a null-value *tombstone* record for log compaction. The
replay kernel (`streaming/replay.py`) wants flat change rows
``(key..., payload..., op I/U/D, seq)``. This module is that boundary,
kept entirely in Catalyst expressions (`from_json` + conditionals — no
Python in the hot path, so the decode fuses into the scan stage):

- **op mapping**: Debezium ``op: c``/``r`` (create / snapshot read) →
  I, ``u`` → U, ``d`` → D; Maxwell's ``type: insert``/``update``/
  ``delete`` (+ ``bootstrap-insert``) likewise. Unknown ops (e.g.
  ``t`` truncate, ``m`` message) quarantine instead of corrupting
  state.
- **image selection**: Debezium's row image is ``after`` for I/U and
  ``before`` for D (with minimal replica identity the delete's before
  image carries only the key columns — non-key columns land NULL,
  which is exactly the engine's delete-event shape). Maxwell carries
  the row — including the deleted row — in ``data``, so the decode
  coalesces ``before``/``after`` with ``data`` per op.
- **wrapped or flat**: both the schema-less flat envelope and the
  ``{"schema":..., "payload": {...}}`` wrapped form parse through one
  ``from_json`` schema; per-field ``coalesce`` unifies them, so one
  stream may even mix both.
- **monotone seq**: derived from the source position —
  ``source.lsn`` (Postgres), else ``source.pos`` (MySQL binlog
  offset), else Maxwell's ``xid * 2^16 + xoffset``, else
  ``timestamp_millis * 1000 + transaction.total_order % 1000``
  (Debezium ``ts_ms`` or Maxwell ``ts`` seconds, with
  intra-transaction order as tiebreak). Callers with a different
  ordering contract pass ``seq_expr``.
- **tombstones**: a NULL value record after a delete is compaction
  metadata, not a change — Debezium always emits the ``d`` envelope
  first, so the default drops tombstones. ``tombstones="delete"``
  synthesizes a D from the record *key* JSON instead (for
  Maxwell-style feeds that skip the delete envelope), taking its seq
  from ``tombstone_seq`` (e.g. the Kafka offset column);
  ``tombstones="error"`` quarantines them.
- **total split**: every input record lands exactly once — in the
  normalized change output or in the quarantine with a first-failed
  reason (``malformed-json`` / ``op:<raw>`` / ``seq:null`` /
  ``key-null:<col>`` / ``tombstone``), the same lineage philosophy as
  `readers.quarantine_split`.

The reference has no log tail (it re-extracts sources wholesale each
run, e.g. seq_repo/extract.py); the envelope contract here follows the
public Debezium message format, and the downstream exactly-once /
LWW-merge semantics are the engine's own (`lake/table.py`).

Scale shape: pure per-row expressions — no shuffle, no state; the
parse runs where the scan runs and whole-stage codegen keeps it
JVM-side. At 10^10 events the only cost is the JSON decode itself,
which is the irreducible price of the wire format.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Debezium source block (connector-specific fields beyond these are
# ignored by from_json — extra JSON keys are dropped, absent ones null)
_SOURCE_DDL = (
    "connector string, ts_ms bigint, snapshot string, "
    "db string, file string, pos bigint, lsn bigint"
)
_TXN_DDL = "id string, total_order bigint, data_collection_order bigint"

_OP_INSERT = ("c", "r", "insert", "bootstrap-insert")
_OP_UPDATE = ("u", "update")
_OP_DELETE = ("d", "delete")


def envelope_ddl(row_ddl: str) -> str:
    """Full envelope schema (flat fields + one ``payload`` nesting
    level) for a given row-image DDL, as a from_json DDL string.

    Carries BOTH dialects: Debezium's ``before``/``after``/``op``/
    ``source``/``ts_ms`` and Maxwell's ``data``/``old``/``type``/
    ``ts`` (seconds)/``xid``/``xoffset`` — absent fields parse to NULL
    and the decode coalesces per dialect."""
    env = (
        f"before struct<{row_ddl}>, after struct<{row_ddl}>, "
        f"data struct<{row_ddl}>, old struct<{row_ddl}>, "
        f"source struct<{_SOURCE_DDL}>, op string, type string, "
        f"ts_ms bigint, ts bigint, xid bigint, xoffset bigint, "
        f"transaction struct<{_TXN_DDL}>"
    )
    return f"{env}, payload struct<{env}>"


def default_seq_expr(env: Column) -> Column:
    """lsn → binlog pos → Maxwell xid·2^16+xoffset → timestamp·1000 +
    total_order (mod 1000); the timestamp is Debezium ``ts_ms`` or
    Maxwell ``ts`` (seconds) scaled to millis."""
    xid_order = F.when(
        env["xid"].isNotNull(),
        env["xid"] * F.lit(65536) + F.coalesce(env["xoffset"], F.lit(0)),
    )
    ts_millis = F.coalesce(env["ts_ms"], env["ts"] * F.lit(1000))
    ts_fallback = ts_millis * F.lit(1000) + F.pmod(
        F.coalesce(env["transaction"]["total_order"], F.lit(0)), F.lit(1000)
    )
    return F.coalesce(
        env["source"]["lsn"], env["source"]["pos"], xid_order, ts_fallback
    ).cast("long")


def parse_cdc_envelope(
    df: DataFrame,
    row_ddl: str,
    key_cols: Sequence[str],
    value_col: str = "value",
    key_col: str | None = None,
    seq_expr: Column | None = None,
    tombstones: str = "drop",
    tombstone_seq: Column | None = None,
    op_out: str = "op",
    seq_out: str = "seq",
) -> tuple[DataFrame, DataFrame]:
    """Normalize a CDC envelope stream into flat change rows.

    Returns ``(changes, quarantine)``: changes has the ``row_ddl``
    columns plus ``op`` (I/U/D) and ``seq`` (bigint); quarantine keeps
    the raw input row plus ``_invalid_reason``. Feed ``changes``
    straight to ``ReplayEngine.replay`` (seq_col=``seq``).
    """
    if tombstones not in ("drop", "delete", "error"):
        raise ValueError(f"tombstones must be drop|delete|error, got {tombstones!r}")
    if tombstones == "delete" and (key_col is None or tombstone_seq is None):
        raise ValueError(
            "tombstones='delete' needs key_col (record-key JSON) and "
            "tombstone_seq (ordering expression, e.g. the log offset)"
        )
    row_fields = StructType.fromDDL(row_ddl).fieldNames()
    missing = [k for k in key_cols if k not in row_fields]
    if missing:
        raise ValueError(f"key_cols {missing} not in row_ddl fields {row_fields}")
    for reserved in (op_out, seq_out):
        if reserved in row_fields:
            raise ValueError(f"row_ddl field {reserved!r} collides with output column")

    raw = F.col(value_col)
    # ONE from_json evaluation per row. A plain projection is not
    # enough: the downstream validity FILTER references the parsed
    # struct ~10 times, and predicate pushdown substitutes the parse
    # into the pushed condition (measured: 32 from_json instances in
    # the optimized plan, ~15x slower). explode(array(parse)) is a
    # 1:1 Generate that neither CollapseProject nor PushDownPredicates
    # rewrites through, so the parse stays single and everything after
    # it is cheap struct-field extraction. Malformed input parses to
    # NULL, and array(NULL) still yields its one row — the total-split
    # contract survives the Generate.
    df = df.select(
        "*",
        F.explode(F.array(F.from_json(raw, envelope_ddl(row_ddl)))).alias("_p"),
    )
    parsed = F.col("_p")

    # unify wrapped and flat: the wrapped form has payload non-null and
    # flat fields null; per-field coalesce makes one logical envelope
    def _env(field: str) -> Column:
        return F.coalesce(parsed["payload"][field], parsed[field])

    env = F.struct(
        *[
            _env(f).alias(f)
            for f in (
                "before", "after", "data", "old", "source", "op", "type",
                "ts_ms", "ts", "xid", "xoffset", "transaction",
            )
        ]
    )
    # Debezium puts the op in `op`, Maxwell in `type`
    raw_op = F.lower(F.coalesce(env["op"], env["type"]))
    op = (
        F.when(raw_op.isin(*_OP_INSERT), "I")
        .when(raw_op.isin(*_OP_UPDATE), "U")
        .when(raw_op.isin(*_OP_DELETE), "D")
    )
    seq = (seq_expr if seq_expr is not None else default_seq_expr(env)).cast("long")
    # Debezium images live in before/after; Maxwell carries the row
    # (including the deleted row) in `data`, with `old` holding only
    # the changed columns' pre-images on update
    image = F.when(
        op == "D", F.coalesce(env["before"], env["data"])
    ).otherwise(F.coalesce(env["after"], env["data"]))

    is_tomb = raw.isNull()
    # malformed JSON => from_json yields NULL (PERMISSIVE mode gives a
    # null struct for undecodable input with this nested schema)
    reason = (
        F.when(is_tomb, F.lit("tombstone"))
        .when(
            parsed.isNull()
            | (
                raw_op.isNull()
                & env["after"].isNull()
                & env["before"].isNull()
                & env["data"].isNull()
            ),
            F.lit("malformed-json"),
        )
        .when(op.isNull(), F.concat(F.lit("op:"), F.coalesce(raw_op, F.lit("null"))))
        .when(seq.isNull(), F.lit("seq:null"))
    )
    for k in key_cols:
        reason = reason.when(image[k].isNull(), F.lit(f"key-null:{k}"))

    tagged = df.withColumn("_invalid_reason", reason)
    good = tagged.where(F.col("_invalid_reason").isNull())
    changes = good.select(
        *[image[f].alias(f) for f in row_fields],
        op.alias(op_out),
        seq.alias(seq_out),
    )
    bad = tagged.where(F.col("_invalid_reason").isNotNull()).drop("_p")

    if tombstones == "drop":
        bad = bad.where(F.col("_invalid_reason") != "tombstone")
    elif tombstones == "delete":
        fields = StructType.fromDDL(row_ddl).fields
        key_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in fields
            if f.name in key_cols
        )
        tseq = tombstone_seq.cast("long")
        # same single-parse Generate barrier as the main path, and the
        # same validity contract: a tombstone whose record-key JSON is
        # NULL/unparseable or whose ordering expression is NULL must
        # NOT become a NULL-keyed delete in `changes` — it quarantines
        # with a first-failed reason like every other record
        tomb_tagged = tagged.where(
            F.col("_invalid_reason") == "tombstone"
        ).select(
            "*",
            F.explode(F.array(F.from_json(F.col(key_col), key_ddl))).alias("_k"),
        )
        treason = F.when(tseq.isNull(), F.lit("tombstone-seq:null"))
        for k in key_cols:
            treason = treason.when(
                F.col("_k")[k].isNull(), F.lit(f"tombstone-key-null:{k}")
            )
        tomb_tagged = tomb_tagged.withColumn("_treason", treason)
        tomb_good = tomb_tagged.where(F.col("_treason").isNull()).select(
            *[
                (F.col("_k")[f.name] if f.name in key_cols else F.lit(None))
                .cast(f.dataType)
                .alias(f.name)
                for f in fields
            ],
            F.lit("D").alias(op_out),
            tseq.alias(seq_out),
        )
        tomb_bad = (
            tomb_tagged.where(F.col("_treason").isNotNull())
            .withColumn("_invalid_reason", F.col("_treason"))
            .drop("_p", "_k", "_treason")
        )
        changes = changes.unionByName(tomb_good)
        bad = bad.where(F.col("_invalid_reason") != "tombstone").unionByName(
            tomb_bad
        )
    # tombstones == "error": they stay in the quarantine

    return changes, bad


def build_kafka_options(
    bootstrap_servers: str,
    topics: str | Sequence[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")`` tailing a
    Debezium/Maxwell topic — pure + testable without a broker (the
    ``build_jdbc_options`` pattern, `sources/db_scan.py`).

    ``max_offsets_per_trigger`` is the micro-batch sizing knob: at
    10^10 events it bounds each exactly-once apply to a digestible
    batch instead of the whole backlog on first start.
    ``starting_offsets`` accepts ``earliest`` / ``latest`` or a JSON
    per-partition offset map (the resume-from-external-checkpoint
    form); Spark's own checkpoint supersedes it after the first run.
    """
    if isinstance(topics, str):
        topics = [topics]
    if not topics:
        raise ValueError("at least one topic required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if extra:
        opts |= extra
    return opts


def kafka_record_envelopes(records: DataFrame) -> DataFrame:
    """Project a Kafka source frame (binary key/value + topic/partition/
    offset) to the columns ``parse_cdc_envelope`` consumes: ``value`` /
    ``key`` as strings plus ``kafka_offset`` for tombstone ordering.
    Works on any frame with Kafka's source schema — batch or streaming."""
    return records.select(
        F.col("value").cast("string").alias("value"),
        F.col("key").cast("string").alias("key"),
        F.col("offset").alias("kafka_offset"),
    )
