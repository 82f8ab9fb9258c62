"""Predicate DML (delete_where / update_where) and rollback_to.

Reference analog: mex-extractors only ever *upserts* backend state; a
compliance purge or in-place correction happens out-of-band there. The
lake makes both first-class (Iceberg/Delta DELETE/UPDATE ... WHERE), so
these tests pin the contracts the engine claims: predicate pruning
leaves untouched buckets' files byte-identical, idempotency shares the
ingest window, MoR deltas fold on rewrite, time travel still sees the
pre-DML state, and rollback reverts fencing so replays re-apply.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from mex_extractors_spark.lake.table import LakeTable


ROWS = [
    (f"k{i:03d}", i, "U", "red" if i % 3 == 0 else "blue", float(i))
    for i in range(60)
]
SCHEMA = "k string, seq long, op string, color string, v double"


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(str(tmp_path / "lake"), num_buckets=4, key_cols=["k"])
    t.apply_batch(spark, spark.createDataFrame(ROWS, SCHEMA), "b1")
    return t


def test_delete_where_matches_recompute(spark, table):
    st = table.delete_where(spark, [("color", "=", "red")], "del-1")
    reds = sum(1 for r in ROWS if r[3] == "red")
    assert st.applied and st.matched == reds
    got = {r["k"] for r in table.read(spark).collect()}
    want = {r[0] for r in ROWS if r[3] != "red"}
    assert got == want


def test_delete_where_idempotent_by_commit_id(spark, table):
    table.delete_where(spark, [("color", "=", "red")], "del-1")
    v = table.current_snapshot()["version"]
    again = table.delete_where(spark, [("color", "=", "red")], "del-1")
    assert not again.applied and again.version == v
    assert table.current_snapshot()["version"] == v


def test_update_where_rewrites_only_matches(spark, table):
    st = table.update_where(
        spark, {"v": F.col("v") * 10}, [("color", "=", "blue")], "upd-1"
    )
    blues = sum(1 for r in ROWS if r[3] == "blue")
    assert st.applied and st.matched == blues
    vals = {r["k"]: r["v"] for r in table.read(spark).collect()}
    for k, seq, _op, color, v in ROWS:
        assert vals[k] == (v * 10 if color == "blue" else v)


def test_update_where_casts_to_table_type(spark, table):
    # int literal into a double column: cast keeps the schema stable
    table.update_where(spark, {"v": F.lit(7)}, [("color", "=", "red")], "upd-2")
    f = {fld.name: fld.dataType.simpleString() for fld in table.read(spark).schema}
    assert f["v"] == "double"


def test_update_where_rejects_key_and_seq(spark, table):
    with pytest.raises(ValueError, match="immutable"):
        table.update_where(spark, {"k": F.lit("x")}, [("color", "=", "red")], "bad1")
    with pytest.raises(ValueError, match="immutable"):
        table.update_where(spark, {"seq": F.lit(0)}, [("color", "=", "red")], "bad2")
    with pytest.raises(ValueError, match="unknown"):
        table.update_where(spark, {"nope": F.lit(0)}, [("color", "=", "red")], "bad3")


def test_dml_requires_predicate(spark, table):
    with pytest.raises(ValueError, match="predicate"):
        table.delete_where(spark, [], "bad")


def test_delete_prunes_untouched_buckets(spark, table):
    """A key-equality predicate hits exactly one bucket: the other
    buckets' manifest entries (files, checksum) must survive verbatim —
    the rewrite never reads or rewrites them."""
    before = table.current_snapshot()["buckets"]
    st = table.delete_where(spark, [("k", "=", "k007")], "del-key")
    assert st.applied and st.matched == 1 and st.buckets_rewritten == 1
    after = table.current_snapshot()["buckets"]
    changed = [b for b in after if after[b] != before[b]]
    assert len(changed) == 1
    for b in after:
        if b not in changed:
            assert after[b]["files"] == before[b]["files"]
            assert after[b]["checksum"] == before[b]["checksum"]


def test_zero_match_delete_still_records_commit_id(spark, table):
    st = table.delete_where(spark, [("color", "=", "green")], "del-none")
    assert st.applied and st.matched == 0 and st.buckets_rewritten == 0
    assert not table.delete_where(spark, [("color", "=", "green")], "del-none").applied
    assert table.read(spark).count() == len(ROWS)


def test_dml_time_travel_and_provenance(spark, table):
    v1 = table.current_snapshot()["version"]
    table.delete_where(spark, [("color", "=", "red")], "del-1")
    snap = table.current_snapshot()
    assert snap["dml"]["op"] == "delete" and snap["dml"]["matched"] > 0
    # pre-DML snapshot still reads the full state (copy-on-write)
    assert table.read(spark, version=v1).count() == len(ROWS)
    # provenance is per-commit: the next ingest commit must not carry it
    more = spark.createDataFrame([("z1", 1000, "U", "red", 1.0)], SCHEMA)
    table.apply_batch(spark, more, "b2")
    assert "dml" not in table.current_snapshot()


def test_delete_folds_mor_deltas(spark, tmp_path):
    t = LakeTable(
        str(tmp_path / "mor"),
        num_buckets=4,
        key_cols=["k"],
        merge_mode="mor",
        max_deltas_per_bucket=10,
    )
    t.apply_batch(spark, spark.createDataFrame(ROWS, SCHEMA), "b1")
    upd = [(f"k{i:03d}", 1000 + i, "U", "red", -1.0) for i in range(0, 60, 10)]
    t.apply_batch(spark, spark.createDataFrame(upd, SCHEMA), "b2")
    assert any(
        m.get("deltas") for m in t.current_snapshot()["buckets"].values()
    ), "precondition: deltas pending"
    st = t.delete_where(spark, [("color", "=", "red")], "del-1")
    assert st.applied
    # every rewritten bucket folded its deltas; survivors read merged
    snap = t.current_snapshot()
    for b in snap["dml"]["buckets"]:
        assert not snap["buckets"][str(b)].get("deltas")
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    # the delete ran on MERGED state: keys updated to red by b2 are gone
    for k, _s, _o, color, v in ROWS:
        i = int(k[1:])
        now_red = color == "red" or i % 10 == 0
        assert (k not in got) == now_red


def test_rollback_reverts_state_and_fencing(spark, table):
    v1 = table.current_snapshot()["version"]
    table.delete_where(spark, [("color", "=", "red")], "del-1")
    assert table.read(spark).count() < len(ROWS)
    assert table.rollback_to(v1) == v1
    assert table.current_snapshot()["version"] == v1
    assert table.read(spark).count() == len(ROWS)
    # fencing reverted with the snapshot: the same commit id re-applies
    st = table.delete_where(spark, [("color", "=", "red")], "del-1")
    assert st.applied and st.matched > 0


def test_rollback_rejects_non_ancestor(spark, table):
    v1 = table.current_snapshot()["version"]
    table.create_branch("side")
    more = spark.createDataFrame([("z1", 999, "U", "red", 1.0)], SCHEMA)
    table.apply_batch(spark, more, "side-b", branch="side")
    side_head = table.refs()["side"]
    assert side_head != v1
    with pytest.raises(ValueError, match="not an ancestor"):
        table.rollback_to(side_head)
    with pytest.raises(ValueError, match="not found"):
        table.rollback_to(9999)
    # no-op rollback to the current head is allowed
    assert table.rollback_to(v1) == v1


def test_rollback_then_expire_reclaims_rolled_over_files(spark, table):
    v1 = table.current_snapshot()["version"]
    table.delete_where(spark, [("color", "=", "red")], "del-1")
    v2 = table.current_snapshot()["version"]
    table.rollback_to(v1)
    table.expire_snapshots(keep_last=1)
    assert table.read(spark).count() == len(ROWS)  # head intact
    with pytest.raises(ValueError, match="not found"):
        table.read(spark, version=v2)
    # the rolled-over version's data dir is vacuumed
    import glob

    assert not glob.glob(os.path.join(table.path, "data", f"v{v2:08d}-*"))


# ------------------------------------------------------------- merge_into


def test_merge_into_clauses(spark, table):
    src = spark.createDataFrame(
        [(f"k{i:03d}", 1000 + i, "green", float(-i)) for i in range(10)]
        + [("z100", 500, "new", 1.5), ("z101", 501, "new", 2.5)],
        "k string, seq long, color string, v double",
    )
    st = table.merge_into(
        spark,
        src,
        "m1",
        when_matched_update={
            "color": F.col("s.color"),
            "v": F.col("t.v") + F.col("s.v"),
        },
        when_matched_delete=F.col("t.color") == "red",
        when_not_matched_insert=True,
    )
    assert st.applied
    got = {r["k"]: (r["color"], r["v"], r["seq"]) for r in table.read(spark).collect()}
    for k, seq, _op, color, v in ROWS:
        i = int(k[1:])
        if i < 10 and color == "red":
            assert k not in got  # matched delete
        elif i < 10:
            # matched update: SET from s and t, seq immutable
            assert got[k] == ("green", v + float(-i), seq)
        else:
            assert got[k] == (color, v, seq)  # untouched
    assert got["z100"] == ("new", 1.5, 500)
    assert got["z101"] == ("new", 2.5, 501)
    dml = table.current_snapshot()["dml"]
    assert dml["op"] == "merge"
    assert dml["deleted"] == sum(1 for i in range(10) if i % 3 == 0)
    assert dml["updated"] == sum(1 for i in range(10) if i % 3 != 0)
    assert dml["inserted"] == 2


def test_merge_into_conditional_insert_and_guard(spark, table):
    src = spark.createDataFrame(
        [("k001", 1000, "x", 1.0), ("z1", 1001, "ok", 1.0), ("z2", 1002, "no", 1.0)],
        "k string, seq long, color string, v double",
    )
    st = table.merge_into(
        spark,
        src,
        "m2",
        when_matched_update={"color": F.lit("guarded")},
        matched_condition=F.col("s.v") > 100,  # never true -> hold
        when_not_matched_insert=F.col("s.color") == "ok",
    )
    assert st.applied and st.matched == 1  # k001 matched (held)
    got = {r["k"]: r["color"] for r in table.read(spark).collect()}
    assert got["k001"] == "blue"  # guard blocked the update
    assert got["z1"] == "ok" and "z2" not in got  # conditional insert
    dml = table.current_snapshot()["dml"]
    assert dml["updated"] == 0 and dml["inserted"] == 1 and dml["deleted"] == 0


def test_merge_into_rejects_ambiguous_source_and_missing_seq(spark, table):
    src = spark.createDataFrame(
        [("k001", 1, "a", 1.0), ("k001", 2, "b", 2.0)],
        "k string, seq long, color string, v double",
    )
    with pytest.raises(ValueError, match="ambiguous"):
        table.merge_into(spark, src, "bad")
    with pytest.raises(ValueError, match="sequence column"):
        table.merge_into(spark, src.limit(1).drop("seq"), "bad2")
    with pytest.raises(ValueError, match="immutable"):
        table.merge_into(
            spark,
            src.limit(1),
            "bad3",
            when_matched_update={"seq": F.lit(0)},
        )


def test_merge_into_prunes_untouched_buckets_and_is_idempotent(spark, table):
    before = table.current_snapshot()["buckets"]
    src = spark.createDataFrame(
        [("k001", 1000, "x", 0.0)], "k string, seq long, color string, v double"
    )
    st = table.merge_into(
        spark, src, "m3", when_matched_update={"color": F.col("s.color")}
    )
    assert st.applied and st.buckets_rewritten == 1
    after = table.current_snapshot()["buckets"]
    changed = [b for b in after if after[b] != before[b]]
    assert len(changed) == 1
    assert not table.merge_into(
        spark, src, "m3", when_matched_update={"color": F.col("s.color")}
    ).applied


def test_merge_into_insert_fills_missing_columns_with_nulls(spark, table):
    src = spark.createDataFrame([("z9", 900)], "k string, seq long")
    table.merge_into(spark, src, "m4", when_not_matched_insert=True)
    row = table.read(spark).where(F.col("k") == "z9").first()
    assert row["color"] is None and row["v"] is None and row["seq"] == 900


# ---------------------------------------------------- review regressions


def test_delete_where_null_predicate_rows_survive(spark, table):
    """SQL three-valued logic: a NULL predicate value matches nothing —
    a row with color=NULL must survive DELETE WHERE color='blue' even
    when it shares a rewritten bucket with matching rows."""
    table.merge_into(
        spark,
        spark.createDataFrame([("z9", 900)], "k string, seq long"),
        "seed-null",
    )  # inserts color=NULL, v=NULL
    n_blue = sum(1 for r in ROWS if r[3] == "blue")
    st = table.delete_where(spark, [("color", "=", "blue")], "del-blue")
    assert st.matched == n_blue
    left = {r["k"] for r in table.read(spark).collect()}
    assert "z9" in left  # NULL row survived
    assert left == {r[0] for r in ROWS if r[3] != "blue"} | {"z9"}


def test_update_where_multi_set_uses_pre_image(spark, table):
    """All SET expressions and the predicate evaluate against the OLD
    row: SET color='redacted', v=0 WHERE color='red' must zero v for
    every red row even though color is rewritten in the same commit."""
    st = table.update_where(
        spark,
        {"color": F.lit("redacted"), "v": F.lit(0.0)},
        [("color", "=", "red")],
        "redact",
    )
    reds = sum(1 for r in ROWS if r[3] == "red")
    assert st.matched == reds
    got = {r["k"]: (r["color"], r["v"]) for r in table.read(spark).collect()}
    for k, _seq, _op, color, v in ROWS:
        if color == "red":
            assert got[k] == ("redacted", 0.0), (k, got[k])
        else:
            assert got[k] == (color, v)


def test_dml_rejects_unknown_where_column(spark, table):
    """A typo'd WHERE column must raise, never 'succeed' as a zero-match
    commit (every file would be stats-pruned for a nonexistent column)."""
    with pytest.raises(ValueError, match="unknown columns in WHERE"):
        table.delete_where(spark, [("colour", "=", "red")], "typo")
    with pytest.raises(ValueError, match="unknown columns in WHERE"):
        table.update_where(spark, {"v": F.lit(0.0)}, [("colr", "=", "x")], "typo2")


def test_merge_into_rejects_unknown_source_columns(spark, table):
    src = spark.createDataFrame(
        [("z1", 1, "x")], "k string, seq long, contnet string"  # typo'd payload
    )
    with pytest.raises(ValueError, match="not in the table schema"):
        table.merge_into(spark, src, "typo-src")
    # explicit opt-in keeps the clause-condition-only column pattern
    st = table.merge_into(
        spark, src, "typo-src-ok", allow_extra_source_columns=True
    )
    assert st.applied


def test_merge_into_drops_and_counts_null_key_source_rows(spark, table):
    """NULL-key source rows can never match the key-equality join; an
    unguarded insert clause must not write them into state as
    unreachable rows — they drop and count (apply_batch's
    events_invalid contract)."""
    src = spark.createDataFrame(
        [
            ("z200", 700, "new", 1.0),
            (None, 701, "ghost", 2.0),
            (None, 702, "ghost2", 3.0),
        ],
        "k string, seq long, color string, v double",
    )
    st = table.merge_into(spark, src, "m-null", when_not_matched_insert=True)
    assert st.applied and st.source_invalid == 2
    got = {r["k"] for r in table.read(spark).collect()}
    assert "z200" in got and None not in got
    dml = table.current_snapshot()["dml"]
    assert dml["inserted"] == 1 and dml["source_invalid"] == 2

    # all-NULL-key source: no-op commit, still counted
    src2 = spark.createDataFrame(
        [(None, 800, "ghost", 9.0)], "k string, seq long, color string, v double"
    )
    st2 = table.merge_into(spark, src2, "m-null2", when_not_matched_insert=True)
    assert st2.applied and st2.source_invalid == 1
    assert None not in {r["k"] for r in table.read(spark).collect()}
