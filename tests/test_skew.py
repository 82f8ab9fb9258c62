"""Skew tests (SURVEY.md §5.2 item 5): extreme hot-key distributions
must stay correct, and the merge path must pre-reduce map-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from mex_extractors_spark import synth
from mex_extractors_spark.lake.table import LakeTable
from mex_extractors_spark.operators.lww import lww_latest, lww_latest_salted
from mex_extractors_spark.streaming.replay import ReplayEngine


def test_lww_correct_under_extreme_skew(spark):
    """2 repos × 3 paths → ~6 keys for 20k events: every partition holds
    thousands of rows per key. max_by partial agg must reduce them
    map-side and still pick the global max seq."""
    df = synth.events(spark, 20_000, n_repos=2, paths_per_repo=3)
    got = {
        (r.repo, r.path): r.seq for r in lww_latest(df).collect()
    }
    exp = {
        (r.repo, r.path): r.seq
        for r in df.groupBy("repo", "path").agg(F.max("seq").alias("seq")).collect()
    }
    assert got == exp
    salted = {
        (r.repo, r.path): r.seq
        for r in lww_latest_salted(df, salt_buckets=8).collect()
    }
    assert salted == exp


def test_replay_correct_under_skew(spark, tmp_path):
    df = synth.events(spark, 5_000, n_repos=2, paths_per_repo=4)
    table = LakeTable(str(tmp_path / "lake"), num_buckets=4)
    ReplayEngine(table).replay(spark, df, 1, 5_000, batch_size=1_000)
    got = sorted(map(tuple, table.read(spark).select("repo", "path", "seq").collect()))
    exp = sorted(
        map(
            tuple,
            lww_latest(df).where("op != 'D'").select("repo", "path", "seq").collect(),
        )
    )
    assert got == exp


def test_partial_aggregation_shrinks_shuffle(spark):
    """Structural evidence of map-side combine: the partial aggregate
    sits below the exchange, so with 6 keys over 8 partitions the
    shuffle carries ≤ 48 pre-reduced rows, not the 50k input rows."""
    df = synth.events(spark, 50_000, n_repos=2, paths_per_repo=3, num_partitions=8)
    out = lww_latest(df)
    assert out.count() <= 6  # ~6 live keys
    plan = out._jdf.queryExecution().executedPlan().toString()
    partial_pos = plan.find("partial_max_by")
    exchange_pos = plan.find("Exchange")
    assert partial_pos != -1 and exchange_pos != -1
    # toString prints top-down: final agg, exchange, then partial agg —
    # the partial must appear BELOW (after) the exchange in the tree
    assert partial_pos > exchange_pos
