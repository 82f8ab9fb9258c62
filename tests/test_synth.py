from __future__ import annotations

from pyspark.sql import functions as F

from mex_extractors_spark import synth


def test_events_deterministic(spark):
    a = synth.events(spark, 500).collect()
    b = synth.events(spark, 500).collect()
    assert a == b


def test_events_shape_and_ops(spark):
    df = synth.events(spark, 2000)
    rows = df.collect()
    assert len(rows) == 2000
    seqs = sorted(r.seq for r in rows)
    assert seqs == list(range(1, 2001))
    ops = {r.op for r in rows}
    assert ops == {"I", "U", "D"}
    frac_d = sum(r.op == "D" for r in rows) / len(rows)
    assert 0.05 < frac_d < 0.15
    for r in rows:
        assert len(r.commit) == 40
        if r.op == "D":
            assert r.content is None
        else:
            assert r.content and r.content.startswith("def fn_")


def test_repo_skew(spark):
    """Zipf-ish: hottest repo should carry far more than uniform share."""
    df = synth.events(spark, 5000, n_repos=100)
    top = (
        df.groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()[0]["count"]
    )
    assert top > 5000 / 100 * 5  # > 5x uniform share


def test_duplicate_delivery_superset(spark):
    df = synth.events(spark, 300)
    dup = synth.with_duplicate_delivery(df)
    assert dup.count() > 300
    # same distinct event set
    assert dup.distinct().count() == 300


def test_shuffled_preserves_rows(spark):
    df = synth.events(spark, 300)
    assert sorted(synth.shuffled(df).collect()) == sorted(df.collect())
