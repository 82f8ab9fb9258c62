"""Temporal joins (operators/asof.py): as-of + banded interval join.

The registry queries j10/j11 pin both operators against DuckDB's
native ASOF JOIN / BETWEEN semantics on real data (test_queries_parity
runs them every session); these unit tests pin the edge semantics the
sf0.001 events table cannot produce — ties, tolerance, NULL keys and
times, forward direction, band boundaries, the loud over-span error.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.operators.asof import asof_join, interval_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "k int, t int, lv string")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k int, t int, rv string")


def _pairs(df, value="rv"):
    return {
        (r["k"], r["t"]): (r["t_matched"], r[value])
        for r in df.collect()
    }


def test_asof_backward_inclusive_latest_at_or_before(spark):
    left = _left(spark, [(1, 5, "a"), (1, 9, "b"), (1, 2, "c"), (2, 3, "d")])
    right = _right(spark, [(1, 2, "r2"), (1, 5, "r5"), (1, 8, "r8"), (2, 9, "r9")])
    got = _pairs(asof_join(left, right, on="k", left_time="t"))
    assert got == {
        (1, 5): (5, "r5"),   # inclusive: equal time matches
        (1, 9): (8, "r8"),
        (1, 2): (2, "r2"),
        (2, 3): (None, None),  # left-outer: nothing at or before
    }


def test_asof_forward_inclusive_earliest_at_or_after(spark):
    left = _left(spark, [(1, 5, "a"), (1, 9, "b"), (2, 3, "d")])
    right = _right(spark, [(1, 5, "r5"), (1, 7, "r7"), (2, 1, "r1")])
    got = _pairs(asof_join(left, right, on="k", left_time="t", direction="forward"))
    assert got == {
        (1, 5): (5, "r5"),
        (1, 9): (None, None),
        (2, 3): (None, None),
    }


def test_asof_tolerance_nulls_out_distant_matches(spark):
    left = _left(spark, [(1, 10, "a"), (1, 100, "b")])
    right = _right(spark, [(1, 8, "r8")])
    got = _pairs(
        asof_join(left, right, on="k", left_time="t", tolerance_seconds=5)
    )
    assert got == {(1, 10): (8, "r8"), (1, 100): (None, None)}


def test_asof_null_keys_and_times_never_match(spark):
    left = _left(spark, [(None, 5, "a"), (1, None, "b"), (1, 5, "c")])
    right = _right(spark, [(None, 1, "rN"), (1, None, "rT"), (1, 4, "r4")])
    got = {(r["lv"]): (r["t_matched"], r["rv"]) for r in
           asof_join(left, right, on="k", left_time="t").collect()}
    # NULL-key / NULL-time right rows are dropped; NULL left rows
    # survive unmatched (SQL semantics: NULL equality/comparison fails)
    assert got == {"a": (None, None), "b": (None, None), "c": (4, "r4")}


def test_asof_match_is_atomic_across_payload_columns(spark):
    """All payload columns must come from the SAME right row (the
    struct formulation); per-column last() would mix rows."""
    left = _left(spark, [(1, 10, "a")])
    right = spark.createDataFrame(
        [(1, 3, "x3", 30), (1, 7, None, 70)], "k int, t int, rv string, n int"
    )
    row = asof_join(left, right, on="k", left_time="t").collect()[0]
    # the t=7 row wins; its rv is genuinely NULL (not back-filled from t=3)
    assert (row["t_matched"], row["rv"], row["n"]) == (7, None, 70)


def test_asof_timestamp_tolerance_and_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "eu", "2024-01-01 10:00:00"), (1, "us", "2024-01-01 10:00:00")],
        "k int, region string, t string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "eu", "2024-01-01 09:59:00", "near"),
         (1, "us", "2024-01-01 08:00:00", "far")],
        "k int, region string, t string, rv string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    got = {
        r["region"]: r["rv"]
        for r in asof_join(
            left, right, on=["k", "region"], left_time="t",
            tolerance_seconds=120,
        ).collect()
    }
    assert got == {"eu": "near", "us": None}


def test_asof_plan_has_single_exchange_and_no_join(spark):
    left = _left(spark, [(1, 5, "a")])
    right = _right(spark, [(1, 2, "r")])
    plan = asof_join(left, right, on="k", left_time="t")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan  # union+window, not a range join
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_forward_uses_incremental_frame(spark):
    """BOTH directions must plan the incremental running frame. A
    (currentRow, unboundedFollowing) frame is re-aggregated wholesale
    per row by Spark — O(n^2) per key partition, which would break the
    module's one-sort cost contract on a skewed key."""
    left = _left(spark, [(1, 5, "a")])
    right = _right(spark, [(1, 7, "r")])
    for direction in ("backward", "forward"):
        plan = asof_join(
            left, right, on="k", left_time="t", direction=direction
        )._jdf.queryExecution().executedPlan().toString()
        assert "unboundedfollowing" not in plan.lower(), (direction, plan)


def test_asof_reserved_column_collision_raises(spark):
    left = _left(spark, [(1, 5, "a")]).withColumn("_m", F.lit(1))
    right = _right(spark, [(1, 2, "r")])
    with pytest.raises(ValueError, match="internal working columns"):
        asof_join(left, right, on="k", left_time="t")


def test_asof_matched_time_always_suffixed(spark):
    """The documented contract: the matched right time is exposed as
    {right_time}{suffix} even when the name would not collide."""
    left = spark.createDataFrame([(1, 5, "a")], "k int, t int, lv string")
    right = spark.createDataFrame([(1, 2, "r")], "k int, price_ts int, rv string")
    out = asof_join(
        left, right, on="k", left_time="t", right_time="price_ts"
    )
    assert "price_ts_matched" in out.columns
    assert [r.price_ts_matched for r in out.collect()] == [2]


def test_interval_join_reserved_band_column_raises(spark):
    pts = _points(spark, [(1, 5, "p")]).withColumn("_b", F.lit(0))
    ivs = _ivs(spark, [(1, 1, 9, "i")])
    with pytest.raises(ValueError, match="internal band column"):
        interval_join(pts, ivs, on="k", point_time="t", start_col="s", end_col="e")


def _points(spark, rows):
    return spark.createDataFrame(rows, "k int, t int, pv string")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "k int, s int, e int, iv string")


def test_interval_join_between_is_inclusive_both_ends(spark):
    pts = _points(spark, [(1, 5, "a"), (1, 10, "b"), (1, 11, "c"), (1, 4, "d")])
    ivs = _ivs(spark, [(1, 5, 10, "w1")])
    got = sorted(
        r["pv"]
        for r in interval_join(
            pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
            band_seconds=3,
        ).collect()
    )
    assert got == ["a", "b"]


def test_interval_join_overlapping_intervals_yield_multiple_rows(spark):
    pts = _points(spark, [(1, 7, "a")])
    ivs = _ivs(spark, [(1, 0, 100, "big"), (1, 7, 7, "point"), (2, 0, 100, "otherkey")])
    got = sorted(
        r["iv"]
        for r in interval_join(
            pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
            band_seconds=10,
        ).collect()
    )
    assert got == ["big", "point"]


def test_interval_join_band_boundary_exact(spark):
    """Points landing exactly on a band edge still match intervals
    whose overlap is confined to the adjacent band."""
    pts = _points(spark, [(1, 10, "edge")])
    ivs = _ivs(spark, [(1, 10, 19, "right-open"), (1, 0, 10, "left-close")])
    got = sorted(
        r["iv"]
        for r in interval_join(
            pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
            band_seconds=10,
        ).collect()
    )
    assert got == ["left-close", "right-open"]


def test_interval_join_drops_null_and_reversed_intervals(spark):
    pts = _points(spark, [(1, 5, "a")])
    ivs = _ivs(spark, [(1, 9, 2, "reversed"), (1, None, 9, "null"), (1, 2, 9, "ok")])
    got = [
        r["iv"]
        for r in interval_join(
            pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
            band_seconds=5,
        ).collect()
    ]
    assert got == ["ok"]


def test_interval_join_over_span_fails_loudly(spark):
    pts = _points(spark, [(1, 5, "a")])
    ivs = _ivs(spark, [(1, 0, 10_000, "huge")])
    with pytest.raises(Exception, match="re-band"):
        interval_join(
            pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
            band_seconds=1, max_bands=100,
        ).collect()


def test_interval_join_suffixes_colliding_columns(spark):
    pts = spark.createDataFrame([(1, 5, "p")], "k int, t int, name string")
    ivs = spark.createDataFrame([(1, 0, 9, "i")], "k int, s int, e int, name string")
    out = interval_join(
        pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
        band_seconds=5,
    )
    assert "name" in out.columns and "name_iv" in out.columns
    row = out.collect()[0]
    assert (row["name"], row["name_iv"]) == ("p", "i")


def test_interval_join_plan_is_equi_join_not_nested_loop(spark):
    pts = _points(spark, [(1, 5, "a")])
    ivs = _ivs(spark, [(1, 0, 9, "w")])
    plan = interval_join(
        pts, ivs, on="k", point_time="t", start_col="s", end_col="e",
        band_seconds=5,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
