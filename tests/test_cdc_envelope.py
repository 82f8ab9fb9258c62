"""Debezium/Maxwell CDC envelope normalization (sources/cdc_envelope.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.sources.cdc_envelope import (
    default_seq_expr,
    envelope_ddl,
    parse_cdc_envelope,
)

ROW_DDL = "repo string, path string, commit string, lang string, content string"
KEYS = ["repo", "path"]


def _env(
    op="c",
    after=None,
    before=None,
    lsn=None,
    pos=None,
    ts_ms=None,
    total_order=None,
    wrap=False,
):
    e = {
        "op": op,
        "before": before,
        "after": after,
        "source": {"connector": "postgresql", "lsn": lsn, "pos": pos},
        "ts_ms": ts_ms,
        "transaction": (
            {"total_order": total_order} if total_order is not None else None
        ),
    }
    return json.dumps({"payload": e} if wrap else e)


def _row(repo="r1", path="a.py", commit="c1", lang="py", content="x"):
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def _parse(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "value string")
    return parse_cdc_envelope(df, ROW_DDL, KEYS, **kw)


def test_insert_update_snapshot_map_to_I_U_with_after_image(spark):
    values = [
        _env(op="c", after=_row(content="created"), lsn=10),
        _env(op="u", before=_row(content="old"), after=_row(content="new"), lsn=11),
        _env(op="r", after=_row(path="b.py", content="snap"), lsn=12),
        _env(op="insert", after=_row(path="c.py"), lsn=13),  # Maxwell
    ]
    changes, bad = _parse(spark, values)
    rows = {(r["seq"]): r for r in changes.collect()}
    assert bad.count() == 0
    assert rows[10]["op"] == "I" and rows[10]["content"] == "created"
    assert rows[11]["op"] == "U" and rows[11]["content"] == "new"  # after wins
    assert rows[12]["op"] == "I"  # snapshot read is an upsert
    assert rows[13]["op"] == "I"


def test_delete_takes_before_image_even_minimal_identity(spark):
    minimal = {"repo": "r1", "path": "a.py"}  # replica identity: keys only
    values = [
        _env(op="d", before=_row(content="tolose"), lsn=20),
        _env(op="d", before=minimal, lsn=21),
    ]
    changes, bad = _parse(spark, values)
    rows = {r["seq"]: r for r in changes.collect()}
    assert bad.count() == 0
    assert rows[20]["op"] == "D" and rows[20]["content"] == "tolose"
    assert rows[21]["op"] == "D" and rows[21]["content"] is None
    assert rows[21]["repo"] == "r1" and rows[21]["path"] == "a.py"


def test_wrapped_and_flat_forms_parse_identically(spark):
    flat = _env(op="c", after=_row(), lsn=30)
    wrapped = _env(op="c", after=_row(), lsn=30, wrap=True)
    c1, _ = _parse(spark, [flat])
    c2, _ = _parse(spark, [wrapped])
    assert c1.collect() == c2.collect()


def test_seq_derivation_lsn_then_pos_then_ts_fallback(spark):
    values = [
        _env(op="c", after=_row(), lsn=100, pos=7, ts_ms=5),  # lsn wins
        _env(op="c", after=_row(path="b.py"), pos=7, ts_ms=5),  # pos next
        _env(op="c", after=_row(path="c.py"), ts_ms=5, total_order=3),
        _env(op="c", after=_row(path="d.py"), ts_ms=5),  # total_order null -> 0
    ]
    changes, bad = _parse(spark, values)
    assert bad.count() == 0
    seqs = {r["path"]: r["seq"] for r in changes.collect()}
    assert seqs == {"a.py": 100, "b.py": 7, "c.py": 5003, "d.py": 5000}


def test_tombstone_drop_default_and_error_mode(spark):
    values = [_env(op="c", after=_row(), lsn=1), None]
    changes, bad = _parse(spark, values)  # default: drop
    assert changes.count() == 1 and bad.count() == 0
    changes, bad = _parse(spark, values, tombstones="error")
    assert changes.count() == 1
    assert [r["_invalid_reason"] for r in bad.collect()] == ["tombstone"]


def test_tombstone_delete_mode_synthesizes_D_from_record_key(spark):
    df = spark.createDataFrame(
        [
            (json.dumps({"repo": "r1", "path": "a.py"}), _env(op="c", after=_row(), lsn=1), 500),
            (json.dumps({"repo": "r9", "path": "z.py"}), None, 501),
        ],
        "key string, value string, kafka_offset long",
    )
    changes, bad = parse_cdc_envelope(
        df,
        ROW_DDL,
        KEYS,
        key_col="key",
        tombstones="delete",
        tombstone_seq=F.col("kafka_offset"),
    )
    assert bad.count() == 0
    rows = {r["seq"]: r for r in changes.collect()}
    assert rows[501]["op"] == "D"
    assert rows[501]["repo"] == "r9" and rows[501]["path"] == "z.py"
    assert rows[501]["content"] is None


def test_tombstone_delete_mode_requires_key_and_seq():
    with pytest.raises(ValueError, match="tombstone_seq"):
        parse_cdc_envelope(None, ROW_DDL, KEYS, tombstones="delete")


def test_quarantine_reasons_total_split(spark):
    values = [
        _env(op="c", after=_row(), lsn=1),  # good
        '{"oops": ',  # malformed JSON
        _env(op="t", after=_row(), lsn=2),  # unmapped op (truncate)
        _env(op="c", after=_row()),  # no lsn/pos/ts_ms -> seq null
        _env(op="c", after={"repo": "r1"}, lsn=3),  # key col path null
    ]
    changes, bad = _parse(spark, values)
    assert changes.count() == 1
    reasons = sorted(r["_invalid_reason"] for r in bad.collect())
    assert reasons == ["key-null:path", "malformed-json", "op:t", "seq:null"]
    # total split: every record lands exactly once
    assert changes.count() + bad.count() == len(values)


def test_reserved_and_unknown_columns_rejected():
    with pytest.raises(ValueError, match="collides"):
        parse_cdc_envelope(None, "repo string, op string", ["repo"])
    with pytest.raises(ValueError, match="not in row_ddl"):
        parse_cdc_envelope(None, "repo string", ["repo", "path"])
    with pytest.raises(ValueError, match="drop|delete|error"):
        parse_cdc_envelope(None, "repo string", ["repo"], tombstones="keep")


def test_envelope_stream_replays_to_same_state_as_flat_events(spark, tmp_path):
    """End-to-end: envelope decode feeds the replay kernel and converges
    to the identical LWW table a flat change stream produces."""
    from mex_extractors_spark import synth
    from mex_extractors_spark.lake.table import LakeTable
    from mex_extractors_spark.streaming.replay import ReplayEngine

    flat = synth.events(spark, 400, n_repos=6, paths_per_repo=4).cache()
    # render the flat stream as Debezium envelopes (op I->c, U->u, D->d;
    # before image for deletes, after otherwise; lsn = seq)
    img = F.to_json(
        F.struct("repo", "path", "commit", "lang", "content")
    )
    env_json = F.concat(
        F.lit('{"op":"'),
        F.when(F.col("op") == "I", "c").when(F.col("op") == "U", "u").otherwise("d"),
        F.lit('","'),
        F.when(F.col("op") == "D", "before").otherwise(F.lit("after")),
        F.lit('":'),
        img,
        F.lit(',"source":{"lsn":'),
        F.col("seq").cast("string"),
        F.lit("}}"),
    )
    stream = flat.select(env_json.alias("value"))
    changes, bad = parse_cdc_envelope(
        stream, "repo string, path string, commit string, lang string, content string",
        key_cols=["repo", "path"],
    )
    assert bad.count() == 0

    def _mk(name):
        return LakeTable(
            str(tmp_path / name),
            key_cols=("repo", "path"),
            seq_col="seq",
            num_buckets=4,
        )

    t_flat, t_env = _mk("flat"), _mk("env")
    ReplayEngine(t_flat).replay(spark, flat, 1, 400, batch_size=200)
    ReplayEngine(t_env).replay(spark, changes, 1, 400, batch_size=200)
    cols = ["repo", "path", "commit", "lang", "content", "seq"]
    a = t_flat.read(spark).select(cols).orderBy("repo", "path").collect()
    b = t_env.read(spark).select(cols).orderBy("repo", "path").collect()
    assert a == b and len(a) > 0


def test_envelope_replay_decode_fused(spark, tmp_path):
    """The decode must fuse into the scan stage: exactly ONE from_json
    in the physical plan and no Exchange between the parse projection
    and the file scan (the envelope parse is a per-row expression — at
    10^10 events a shuffle here would dominate the job)."""
    src = str(tmp_path / "segments")
    env = F.concat(
        F.lit('{"op":"c","after":{"user_id":'),
        F.col("id").cast("string"),
        F.lit('},"source":{"lsn":'),
        F.col("id").cast("string"),
        F.lit("}}"),
    )
    spark.range(100).select(env.alias("value")).write.text(src)
    changes, _ = parse_cdc_envelope(
        spark.read.text(src), "user_id bigint", key_cols=["user_id"]
    )
    plan = changes._jdf.queryExecution().executedPlan().toString()
    assert plan.count("from_json") == 1, plan
    lines = plan.splitlines()
    fj = next(i for i, l in enumerate(lines) if "from_json" in l)
    scan = next(
        i for i, l in enumerate(lines) if "FileScan" in l or "Scan text" in l
    )
    assert fj < scan, plan
    assert not any("Exchange" in l for l in lines[fj:scan]), plan


def test_streaming_envelope_tail_converges(spark, tmp_path):
    """The full binlog-tail shape: a directory of envelope-JSON files
    tailed by Structured Streaming, decoded per micro-batch through the
    ReplayEngine normalize hook, upserted exactly-once — converges to
    the same table as a direct batch replay of the flat events."""
    from pyspark.sql.types import StringType, StructField, StructType

    from mex_extractors_spark import synth
    from mex_extractors_spark.lake.table import LakeTable
    from mex_extractors_spark.streaming.replay import ReplayEngine

    n = 600
    flat = synth.events(spark, n, n_repos=10, paths_per_repo=6).cache()
    img = F.to_json(F.struct("repo", "path", "commit", "lang", "content"))
    env_json = F.concat(
        F.lit('{"op":"'),
        F.when(F.col("op") == "I", "c").when(F.col("op") == "U", "u").otherwise("d"),
        F.lit('","'),
        F.when(F.col("op") == "D", "before").otherwise(F.lit("after")),
        F.lit('":'), img,
        F.lit(',"source":{"lsn":'), F.col("seq").cast("string"), F.lit("}}"),
    )
    src = str(tmp_path / "wire")
    # two log segments arriving "over time"
    flat.where("seq <= 300").select(env_json.alias("value")).write.parquet(src)
    flat.where("seq > 300").select(env_json.alias("value")).write.mode(
        "append"
    ).parquet(src)

    row_ddl = "repo string, path string, commit string, lang string, content string"

    def decode(df):
        changes, _bad = parse_cdc_envelope(df, row_ddl, key_cols=["repo", "path"])
        return changes

    table = LakeTable(str(tmp_path / "env_lake"), num_buckets=4)
    q = ReplayEngine(table, normalize=decode).stream_from_files(
        spark,
        src,
        schema=StructType([StructField("value", StringType())]),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)

    ref = LakeTable(str(tmp_path / "flat_lake"), num_buckets=4)
    ReplayEngine(ref).replay(spark, flat, 1, n, batch_size=n)
    cols = ["repo", "path", "commit", "lang", "content", "seq"]
    got = sorted(map(tuple, table.read(spark).select(cols).collect()))
    exp = sorted(map(tuple, ref.read(spark).select(cols).collect()))
    assert got == exp and len(got) > 0


def test_build_kafka_options_and_record_projection(spark):
    from mex_extractors_spark.sources.cdc_envelope import (
        build_kafka_options,
        kafka_record_envelopes,
    )

    opts = build_kafka_options(
        "broker:9092",
        ["cdc.repo_files", "cdc.repo_meta"],
        max_offsets_per_trigger=2_000_000,
        extra={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts["subscribe"] == "cdc.repo_files,cdc.repo_meta"
    assert opts["maxOffsetsPerTrigger"] == "2000000"
    assert opts["failOnDataLoss"] == "true"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    with pytest.raises(ValueError):
        build_kafka_options("b:9092", [])
    with pytest.raises(ValueError):
        build_kafka_options("b:9092", "t", max_offsets_per_trigger=0)

    # kafka source schema stand-in: binary key/value + offset columns
    rec = spark.createDataFrame(
        [(b'{"repo":"r1","path":"a.py"}', None, "t", 0, 17)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    proj = kafka_record_envelopes(rec)
    row = proj.collect()[0]
    assert row["key"] == '{"repo":"r1","path":"a.py"}'
    assert row["value"] is None  # tombstone passes through as NULL string
    assert row["kafka_offset"] == 17
    # tombstone-delete mode consumes the projection directly
    changes, bad = parse_cdc_envelope(
        proj, ROW_DDL, KEYS, key_col="key",
        tombstones="delete", tombstone_seq=F.col("kafka_offset"),
    )
    r = changes.collect()[0]
    assert r["op"] == "D" and r["repo"] == "r1" and r["seq"] == 17
    assert bad.count() == 0


def test_tombstone_delete_mode_quarantines_bad_keys_and_seq(spark):
    """A tombstone with NULL/malformed key JSON or NULL ordering must
    quarantine, never become a NULL-keyed delete (total-split holds)."""
    df = spark.createDataFrame(
        [
            (json.dumps({"repo": "r1", "path": "a.py"}), None, 500),  # good
            (None, None, 501),  # key NULL
            ('{"repo": "r2"', None, 502),  # key JSON malformed
            (json.dumps({"repo": "r3"}), None, 503),  # path missing
            (json.dumps({"repo": "r4", "path": "d.py"}), None, None),  # seq NULL
        ],
        "key string, value string, kafka_offset long",
    )
    changes, bad = parse_cdc_envelope(
        df, ROW_DDL, KEYS, key_col="key",
        tombstones="delete", tombstone_seq=F.col("kafka_offset"),
    )
    rows = changes.collect()
    assert len(rows) == 1 and rows[0]["repo"] == "r1" and rows[0]["seq"] == 500
    reasons = sorted(r["_invalid_reason"] for r in bad.collect())
    assert reasons == [
        "tombstone-key-null:path",
        "tombstone-key-null:repo",
        "tombstone-key-null:repo",
        "tombstone-seq:null",
    ]
    assert changes.count() + bad.count() == 5


def test_maxwell_records_decode(spark):
    """Genuine Maxwell wire shape: type/data/old/ts/xid — not Debezium's
    op/before/after — must decode, not quarantine."""
    recs = [
        json.dumps({
            "database": "d", "table": "files", "type": "insert",
            "ts": 1449786310, "xid": 940752,
            "data": _row(content="maxwell-new"),
        }),
        json.dumps({
            "database": "d", "table": "files", "type": "update",
            "ts": 1449786311, "xid": 940753, "xoffset": 2,
            "data": _row(content="maxwell-upd"),
            "old": {"content": "maxwell-new"},
        }),
        json.dumps({
            "database": "d", "table": "files", "type": "delete",
            "ts": 1449786312, "xid": 940754,
            "data": _row(path="b.py", content="gone"),
        }),
        json.dumps({  # no xid -> ts-seconds fallback
            "database": "d", "table": "files", "type": "insert",
            "ts": 1449786313,
            "data": _row(path="c.py"),
        }),
    ]
    changes, bad = _parse(spark, recs)
    assert bad.count() == 0, bad.collect()
    rows = sorted(changes.collect(), key=lambda r: r["seq"])
    assert [r["op"] for r in rows] == ["I", "U", "D", "I"]
    assert rows[0]["content"] == "maxwell-new"
    assert rows[0]["seq"] == 940752 * 65536
    assert rows[1]["content"] == "maxwell-upd"  # data, not old
    assert rows[1]["seq"] == 940753 * 65536 + 2
    assert rows[2]["path"] == "b.py" and rows[2]["content"] == "gone"
    assert rows[3]["seq"] == 1449786313 * 1000 * 1000
