from __future__ import annotations

from mex_extractors_spark import synth
from mex_extractors_spark.operators.lww import (
    apply_deletes,
    lww_latest,
    lww_latest_salted,
    lww_latest_window,
)


def _expected(rows):
    latest = {}
    for r in sorted(rows, key=lambda r: r.seq):
        latest[(r.repo, r.path)] = r
    return sorted(
        (r.repo, r.path, r.seq, r.op, r.commit, r.lang, r.content)
        for r in latest.values()
    )


def _got(df):
    return sorted(
        (r.repo, r.path, r.seq, r.op, r.commit, r.lang, r.content) for r in df.collect()
    )


def test_lww_strategies_agree(spark):
    df = synth.events(spark, 3000, n_repos=30, paths_per_repo=10)
    rows = df.collect()
    exp = _expected(rows)
    assert _got(lww_latest(df)) == exp
    assert _got(lww_latest_window(df)) == exp
    assert _got(lww_latest_salted(df, salt_buckets=7)) == exp


def test_lww_on_duplicated_stream(spark):
    df = synth.events(spark, 1000, n_repos=20)
    dup = synth.with_duplicate_delivery(df)
    assert _got(lww_latest(dup)) == _expected(df.collect())


def test_lww_on_shuffled_stream(spark):
    df = synth.events(spark, 1000, n_repos=20)
    assert _got(lww_latest(synth.shuffled(df))) == _expected(df.collect())


def test_apply_deletes(spark):
    df = lww_latest(synth.events(spark, 1000, n_repos=20))
    live = apply_deletes(df)
    assert live.where("op = 'D'").count() == 0
    assert live.count() == df.where("op != 'D'").count()


def test_lww_plan_has_partial_aggregation(spark):
    """The max_by strategy must plan a partial (map-side) aggregate phase
    before the exchange — hot keys pre-reduce on every input partition,
    which is the skew defusal at 100 TB."""
    df = lww_latest(synth.events(spark, 10))
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in explained
    # exactly one exchange: partial agg -> shuffle -> final agg
    assert explained.count("Exchange") == 1
