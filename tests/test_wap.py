"""Snapshot branches, tags, and write-audit-publish.

The WAP contract (Iceberg/Nessie write-audit-publish): stage a commit
on an audit branch, validate the POST-commit table state, and only
then atomically fast-forward main. Reference analog: blocking asset
checks gating downstream materialization
(mex/extractors/pipeline/base.py:107-127), evaluated here on the
would-be-published table itself instead of the incoming batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.lake.table import (
    CommitAborted,
    CommitConflict,
    LakeTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, seq long, lang string, op string"
    )


@pytest.fixture()
def table(tmp_path):
    return LakeTable(
        str(tmp_path / "wap_lake"), key_cols=["repo", "path"], num_buckets=4
    )


class TestBranches:
    def test_branch_write_invisible_until_fast_forward(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_branch("audit")
        table.apply_batch(
            spark, _mk(spark, [("r2", "b", 2, "go", "U")]), "b2", branch="audit"
        )
        assert table.read(spark).count() == 1
        assert table.read(spark, ref="audit").count() == 2
        assert table.current_snapshot()["version"] == 1
        assert "b2" not in table.applied_batches()
        head = table.fast_forward("audit")
        assert head == 2
        assert table.read(spark).count() == 2
        assert {"b1", "b2"} <= table.applied_batches()

    def test_branch_fencing_uses_branch_head(self, spark, table):
        """Redelivery to a branch is fenced by the BRANCH watermarks —
        the audit flow behaves exactly like main would post-publish."""
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_branch("audit")
        table.apply_batch(
            spark, _mk(spark, [("r1", "a", 5, "go", "U")]), "b2", branch="audit"
        )
        # redelivered seq<=5 for the same key: fenced on the branch even
        # though MAIN's watermark is still 1
        st = table.apply_batch(
            spark, _mk(spark, [("r1", "a", 5, "STALE", "U")]), "b3", branch="audit"
        )
        assert st.applied and st.events_fenced == 1
        rows = {
            (r["repo"], r["lang"]) for r in table.read(spark, ref="audit").collect()
        }
        assert rows == {("r1", "go")}

    def test_non_fast_forward_rejected(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_branch("stale")
        table.apply_batch(spark, _mk(spark, [("r2", "b", 2, "py", "U")]), "b2")
        table.apply_batch(
            spark, _mk(spark, [("r3", "c", 3, "py", "U")]), "b3", branch="stale"
        )
        with pytest.raises(CommitConflict, match="not a fast-forward"):
            table.fast_forward("stale")
        assert table.read(spark).count() == 2  # main untouched

    def test_branch_of_empty_table(self, spark, table):
        table.create_branch("boot")
        table.apply_batch(
            spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1", branch="boot"
        )
        assert table.current_snapshot() is None
        assert table.read(spark, ref="boot").count() == 1
        table.fast_forward("boot")
        assert table.read(spark).count() == 1

    def test_create_branch_twice_and_unknown_branch(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_branch("x")
        with pytest.raises(ValueError, match="already exists"):
            table.create_branch("x")
        with pytest.raises(ValueError, match="unknown branch"):
            table.apply_batch(
                spark, _mk(spark, [("r2", "b", 2, "py", "U")]), "b2", branch="nope"
            )
        with pytest.raises(ValueError, match="invalid ref name"):
            table.create_branch("bad/name")


class TestWriteAuditPublish:
    def test_wap_publishes_only_after_audit_passes(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        st = table.write_audit_publish(
            spark,
            _mk(spark, [("r2", "b", 2, "go", "U")]),
            "b2",
            validate=lambda df: None if df.count() == 2 else "bad count",
        )
        assert st.applied
        assert table.read(spark).count() == 2
        assert table.refs() == {}  # audit branch cleaned up

    def test_wap_abort_leaves_main_untouched_and_retryable(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        v0 = table.current_snapshot()["version"]

        def too_small(df):
            return "rows vanished" if df.count() < 10 else None

        with pytest.raises(CommitAborted, match="audit failed"):
            table.write_audit_publish(
                spark, _mk(spark, [("r2", "b", 2, "go", "U")]), "b2", too_small
            )
        assert table.current_snapshot()["version"] == v0
        assert table.read(spark).count() == 1
        assert "b2" not in table.applied_batches()
        assert table.refs() == {}
        # fixed audit retries cleanly with the same batch id
        table.write_audit_publish(
            spark, _mk(spark, [("r2", "b", 2, "go", "U")]), "b2", lambda df: None
        )
        assert table.read(spark).count() == 2

    def test_wap_audit_sees_post_commit_state(self, spark, table):
        """The validator receives the state main WOULD have — including
        LWW against existing rows, which a batch-only check cannot see."""
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        seen = {}

        def capture(df):
            seen["langs"] = {r["lang"] for r in df.collect()}
            return None

        table.write_audit_publish(
            spark, _mk(spark, [("r1", "a", 9, "go", "U")]), "b2", capture
        )
        assert seen["langs"] == {"go"}  # update already merged in the audit view

    def test_wap_abandoned_snapshots_reclaimed_by_expiry(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        with pytest.raises(CommitAborted):
            table.write_audit_publish(
                spark,
                _mk(spark, [("r2", "b", 2, "go", "U")]),
                "b2",
                validate=lambda df: "nope",
            )
        staged = [h["version"] for h in table.history()]
        assert len(staged) == 2  # main v1 + the abandoned audit snapshot
        table.expire_snapshots(keep_last=1)
        assert [h["version"] for h in table.history()] == [1]
        assert table.read(spark).count() == 1


class TestTags:
    def test_tag_pins_a_version_and_survives_expiry(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_tag("rel-1")
        table.apply_batch(spark, _mk(spark, [("r1", "a", 2, "go", "U")]), "b2")
        table.apply_batch(spark, _mk(spark, [("r2", "b", 3, "py", "U")]), "b3")
        assert {
            (r["repo"], r["lang"])
            for r in table.read(spark, ref="rel-1").collect()
        } == {("r1", "py")}
        table.expire_snapshots(keep_last=1)
        # the tagged snapshot is retained and readable
        assert table.read(spark, ref="rel-1").count() == 1
        with pytest.raises(ValueError, match="immutable"):
            table.create_tag("rel-1")

    def test_read_rejects_version_and_ref_together(self, spark, table):
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_tag("t1")
        with pytest.raises(ValueError, match="not both"):
            table.read(spark, version=1, ref="t1")
        with pytest.raises(ValueError, match="unknown branch/tag"):
            table.read(spark, ref="ghost")


class TestCrashAndCollisionHardening:
    def test_crash_during_compact_publish_leaves_table_intact(
        self, spark, table, monkeypatch
    ):
        """A kill between compaction's data write and its snapshot
        publish must leave the current snapshot untouched; the orphaned
        rewrite is vacuumable and a re-run compacts cleanly."""
        table_mor = LakeTable(
            table.path, key_cols=["repo", "path"], num_buckets=4,
            merge_mode="mor", max_deltas_per_bucket=None,
        )
        table_mor.apply_batch(
            spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1", mode="cow"
        )
        table_mor.apply_batch(
            spark, _mk(spark, [("r1", "a", 2, "go", "U")]), "b2"
        )
        before = table_mor.current_snapshot()
        orig_publish = LakeTable._publish

        def boom(self, snapshot, ref=None):
            raise RuntimeError("injected crash before publish")

        monkeypatch.setattr(LakeTable, "_publish", boom)
        with pytest.raises(RuntimeError, match="injected"):
            table_mor.compact(spark)
        monkeypatch.setattr(LakeTable, "_publish", orig_publish)
        assert table_mor.current_snapshot() == before
        assert [(r["repo"], r["lang"]) for r in table_mor.read(spark).collect()] == [
            ("r1", "go")
        ]
        # orphaned rewrite files reclaimed, then the retry succeeds
        assert table_mor.vacuum_orphans() > 0
        v = table_mor.compact(spark)
        assert v == before["version"] + 1
        snap = table_mor.current_snapshot()
        assert not any(m.get("deltas") for m in snap["buckets"].values())
        assert [(r["repo"], r["lang"]) for r in table_mor.read(spark).collect()] == [
            ("r1", "go")
        ]

    def test_interleaved_branch_and_main_commits_never_collide(
        self, spark, table
    ):
        """The global version counter gives every commit — main or any
        branch — a unique version/data-dir, so interleaved writers on
        different refs never race the publish CAS."""
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_branch("x")
        table.create_branch("y")
        table.apply_batch(spark, _mk(spark, [("r2", "b", 2, "py", "U")]), "bx", branch="x")
        table.apply_batch(spark, _mk(spark, [("r3", "c", 3, "py", "U")]), "by", branch="y")
        table.apply_batch(spark, _mk(spark, [("r4", "d", 4, "py", "U")]), "b2")
        versions = [h["version"] for h in table.history()]
        assert len(versions) == len(set(versions)) == 4
        # each ref sees exactly its own lineage
        assert table.read(spark).count() == 2          # main: b1 + b2
        assert table.read(spark, ref="x").count() == 2  # b1 + bx
        assert table.read(spark, ref="y").count() == 2  # b1 + by
        table.drop_branch("x"); table.drop_branch("y")


class TestReviewRegressions:
    def test_cas_loser_cannot_destroy_winner_data_files(
        self, spark, table, monkeypatch
    ):
        """Two writers that computed the SAME version must not share a
        data dir: the loser writes its own attempt dir, exhausts its
        optimistic-concurrency retries (its version counter is pinned to
        the clash), raises CommitConflict, and the winner's committed
        files survive. The loser reclaims its abandoned attempt dir
        EAGERLY on the terminal conflict — nothing left to vacuum."""
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        winner = LakeTable(table.path, key_cols=["repo", "path"], num_buckets=4)
        loser = LakeTable(table.path, key_cols=["repo", "path"], num_buckets=4)
        clash = winner._next_version()
        winner.apply_batch(spark, _mk(spark, [("r2", "b", 2, "py", "U")]), "b2")
        monkeypatch.setattr(loser, "_next_version", lambda: clash)
        with pytest.raises(CommitConflict):
            loser.apply_batch(spark, _mk(spark, [("r3", "c", 3, "py", "U")]), "b3")
        # the winner's commit is fully intact — every referenced file readable
        assert sorted(
            (r["repo"], r["path"]) for r in table.read(spark).collect()
        ) == [("r1", "a"), ("r2", "b")]
        assert table.verify_bucket_checksums(spark) == []
        # the loser's attempt dir was removed at the terminal conflict,
        # so the orphan vacuum has nothing left to reclaim
        assert table.vacuum_orphans() == 0

    def test_read_key_casts_literals_to_stored_key_types(self, spark, tmp_path):
        """murmur3 hashes int and long differently — an uncast Python
        int probing a LongType key would scan the wrong bucket and
        silently return empty."""
        t = LakeTable(str(tmp_path / "lk"), key_cols=["user_id"], num_buckets=16)
        df = spark.createDataFrame(
            [(i, i * 10, "U") for i in range(50)], "user_id long, v long, op string"
        ).withColumn("seq", F.col("user_id") + 1)
        t.apply_batch(spark, df, "b1")
        for probe in range(0, 50, 7):
            got = t.read_key(spark, user_id=probe).collect()
            assert [(r["user_id"], r["v"]) for r in got] == [(probe, probe * 10)], probe

    def test_fast_forward_survives_expiry_of_branch_intermediates(
        self, spark, table
    ):
        """expire_snapshots keeps each branch's ancestry, so a
        multi-commit branch still fast-forwards after maintenance."""
        table.apply_batch(spark, _mk(spark, [("r1", "a", 1, "py", "U")]), "b1")
        table.create_branch("work")
        for i in range(2, 5):
            table.apply_batch(
                spark, _mk(spark, [(f"r{i}", "x", i, "py", "U")]), f"w{i}", branch="work"
            )
        table.expire_snapshots(keep_last=1)
        head = table.fast_forward("work")
        assert head == table.current_snapshot()["version"]
        assert table.read(spark).count() == 4
        table.drop_branch("work")
