"""Multi-table atomic commits (lake/catalog.py): staging on txn
branches, single-CAS catalog publish, snapshot-isolated reads,
conflict/abort/crash behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.lake.catalog import LakeCatalog
from mex_extractors_spark.lake.table import CommitConflict, LakeTable


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, seq long, op string, content string"
    )


def _counts(spark, rows):
    return spark.createDataFrame(rows, "lang string, seq long, op string, n long")


@pytest.fixture()
def cat(tmp_path):
    c = LakeCatalog(str(tmp_path / "lake"))
    c.register("state", LakeTable(str(tmp_path / "lake/state"), num_buckets=4))
    c.register(
        "stats",
        LakeTable(str(tmp_path / "lake/stats"), key_cols=["lang"], num_buckets=2),
    )
    return c


def test_transaction_commits_both_tables_atomically(spark, cat):
    with cat.transaction() as txn:
        txn.apply_batch(
            spark, "state", _mk(spark, [("r1", "a.py", 1, "U", "x")]), "b1"
        )
        txn.apply_batch(spark, "stats", _counts(spark, [("py", 1, "U", 1)]), "s1")
        snap = txn.commit()
    assert snap["version"] == 1
    assert set(snap["tables"]) == {"state", "stats"}
    assert cat.read(spark, "state").count() == 1
    assert cat.read(spark, "stats").collect()[0].n == 1
    # housekeeping: mains fast-forwarded, txn branches dropped
    assert cat.table("state").current_snapshot()["version"] == snap["tables"]["state"]
    assert cat.table("state").refs() == {} and cat.table("stats").refs() == {}


def test_staged_but_uncommitted_is_invisible_and_aborted(spark, cat):
    with cat.transaction() as txn:
        txn.apply_batch(spark, "state", _mk(spark, [("r1", "a", 1, "U", "x")]), "b1")
        txn.commit()
    v_before = cat.current_snapshot()["version"]

    class Boom(RuntimeError):
        pass

    with pytest.raises(Boom):
        with cat.transaction() as txn2:
            txn2.apply_batch(
                spark, "state", _mk(spark, [("r1", "a", 2, "U", "CRASH")]), "b2"
            )
            txn2.apply_batch(spark, "stats", _counts(spark, [("py", 1, "U", 9)]), "s2")
            raise Boom()  # crash between staging and commit
    # catalog unchanged; reads see the old world; branches cleaned up
    assert cat.current_snapshot()["version"] == v_before
    assert [r.content for r in cat.read(spark, "state").collect()] == ["x"]
    with pytest.raises(ValueError):
        cat.read(spark, "stats")  # never committed a pin
    assert cat.table("state").refs() == {}
    # main never advanced either
    assert cat.table("state").read(spark).collect()[0].content == "x"


def test_concurrent_transactions_conflict_then_retry(spark, cat):
    t1 = cat.transaction()
    t2 = cat.transaction()
    t1.apply_batch(spark, "state", _mk(spark, [("r1", "a", 1, "U", "one")]), "b1")
    t2.apply_batch(spark, "state", _mk(spark, [("r2", "b", 2, "U", "two")]), "b2")
    t1.commit()
    with pytest.raises(CommitConflict):
        t2.commit()
    t2.abort()
    # retry on the new head succeeds and sees t1's world as its base
    t3 = cat.transaction()
    t3.apply_batch(spark, "state", _mk(spark, [("r2", "b", 2, "U", "two")]), "b2")
    t3.commit()
    got = {(r.repo, r.content) for r in cat.read(spark, "state").collect()}
    assert got == {("r1", "one"), ("r2", "two")}


def test_snapshot_isolated_multi_table_reads(spark, cat):
    with cat.transaction() as t1:
        t1.apply_batch(spark, "state", _mk(spark, [("r1", "a", 1, "U", "v1")]), "b1")
        t1.apply_batch(spark, "stats", _counts(spark, [("py", 1, "U", 1)]), "s1")
        t1.commit()
    pinned = cat.current_snapshot()["version"]
    with cat.transaction() as t2:
        t2.apply_batch(spark, "state", _mk(spark, [("r1", "a", 2, "U", "v2")]), "b2")
        t2.apply_batch(spark, "stats", _counts(spark, [("py", 2, "U", 2)]), "s2")
        t2.commit()
    # a reader pinned to the OLD catalog snapshot sees the old versions
    # of BOTH tables — never v2 state next to n=1 stats or vice versa
    assert cat.read(spark, "state", catalog_version=pinned).collect()[0].content == "v1"
    assert cat.read(spark, "stats", catalog_version=pinned).collect()[0].n == 1
    assert cat.read(spark, "state").collect()[0].content == "v2"
    assert cat.read(spark, "stats").collect()[0].n == 2


def test_idempotent_batch_inside_transaction(spark, cat):
    with cat.transaction() as t1:
        t1.apply_batch(spark, "state", _mk(spark, [("r1", "a", 1, "U", "x")]), "b1")
        t1.commit()
    # redelivering the same batch id stages a no-op; commit still works
    with cat.transaction() as t2:
        st = t2.apply_batch(spark, "state", _mk(spark, [("r1", "a", 1, "U", "x")]), "b1")
        assert not st.applied
        t2.commit()
    assert cat.read(spark, "state").count() == 1


def test_transaction_fences_and_evolves_like_plain_apply(spark, cat):
    """Staging uses the FULL apply path: fencing and schema evolution
    behave exactly as on main."""
    with cat.transaction() as t1:
        t1.apply_batch(spark, "state", _mk(spark, [("r1", "a", 5, "U", "x")]), "b1")
        t1.commit()
    with cat.transaction() as t2:
        batch = spark.createDataFrame(
            [("r1", "a", 3, "U", "stale", None), ("r1", "b", 9, "U", "new", "py")],
            "repo string, path string, seq long, op string, content string, lang string",
        )
        st = t2.apply_batch(spark, "state", batch, "b2")
        assert st.events_fenced == 1  # seq 3 <= watermark 5
        t2.commit()
    rows = {r.path: (r.content, r.lang) for r in cat.read(spark, "state").collect()}
    assert rows == {"a": ("x", None), "b": ("new", "py")}  # evolved column
