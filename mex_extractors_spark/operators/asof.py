"""Temporal joins: as-of join and banded interval (range) join.

The reference has no temporal join (SURVEY.md §2.4 J10 records it as
absent), but both shapes are table stakes for an event-log engine — an
as-of join is "enrich each event with the latest state at or before
its timestamp" (the read-side dual of the LWW merge kernel in
operators/lww.py), and an interval join is "assign each event to the
session/campaign window that contains it".

Spark-first scale design, chosen over the naive formulations:

* The naive as-of join is a non-equi join (``l.k = r.k AND l.t >= r.t``
  → BroadcastNestedLoop or a sort-merge with per-row rescans) followed
  by a max-per-left-row dedup — a row-explosion that is quadratic per
  key. Instead ``asof_join`` UNIONS the two sides and takes a
  ``last(..., ignorenulls=True)`` running window per key: ONE shuffle
  on the key, O(n log n) per-key sort, zero intermediate explosion.
  This is the classic union-scan formulation (pandas ``merge_asof``,
  kdb ``aj``) expressed as a Spark window.
* The naive interval join is the same nested-loop trap. Instead
  ``interval_join`` BANDS time into fixed-width buckets: each point
  lands in exactly one bucket, each interval explodes into the few
  buckets it overlaps, and the join becomes a plain equi-join on
  (key, bucket) that AQE/sort-merge handles at any scale, with the
  exact range predicate re-applied after. Each point matches an
  overlapping interval in exactly one bucket (the point's own), so no
  post-join dedup is needed.

Both operators stay entirely in codegen'd expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_TS_TYPES = (TimestampType, TimestampNTZType)


def _as_key_list(on: str | list[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _micros(c: Column) -> Column:
    """Microseconds-since-epoch of a TIMESTAMP or TIMESTAMP_NTZ column.

    ``unix_micros`` only accepts TIMESTAMP, and parquet event times read
    back as NTZ; the cast is exact because the session timezone is
    pinned to UTC (session.py) — under UTC the NTZ→TZ mapping is the
    identity on the wall-clock fields, so it stays monotone (no DST
    folds) and microsecond-precise."""
    return F.unix_micros(c.cast("timestamp"))


def _time_delta(a: Column, b: Column, is_timestamp: bool) -> Column:
    """a - b in seconds (timestamps) or raw units (numerics)."""
    if is_timestamp:
        return (_micros(a) - _micros(b)) / F.lit(1_000_000.0)
    return a - b


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "ts",
    right_time: str | None = None,
    right_payload: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For every left row, attach the right row with the same key and
    the greatest right time <= left time (``direction='backward'``,
    inclusive — DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``
    semantics) or the smallest right time >= left time (``'forward'``).
    Always left-outer: unmatched left rows keep NULL payload.

    Plan shape: union both sides → ONE ``Exchange hashpartitioning(on)``
    → per-key sort by (time, side) → running ``last(ignorenulls)`` of
    the right-row struct → filter back to left rows. The struct keeps
    the match atomic (all payload columns come from the SAME right
    row). No join operator appears in the plan at all, so there is no
    range-explosion and no BroadcastNestedLoop regardless of key
    cardinality; skewed keys cost a sort, not a cross product.

    Right rows must be unique per (key, time) — with ties the winning
    row is not deterministic (pre-aggregate, as j10 does). Right rows
    with NULL key or NULL time are dropped (they can never match, but
    would otherwise pollute the NULL-key window partition); left rows
    with NULL key/time come back payload-NULL, matching SQL semantics.

    ``tolerance_seconds`` nulls out matches farther than the given
    distance (seconds for timestamps, raw units for numeric time).
    The matched right time is exposed as ``{right_time}{suffix}``;
    payload columns colliding with left column names get ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_key_list(on)
    rt = right_time or left_time
    # internal working columns pass through the union and the final
    # select; a same-named user column would be silently REPLACED by
    # withColumn (no duplicate-column error to save us) — fail loudly
    reserved = {"_t", "_side", "_r", "_m"} & set(left.columns)
    if reserved:
        raise ValueError(
            f"left columns {sorted(reserved)} collide with asof_join's "
            "internal working columns — rename them first"
        )
    payload = (
        list(right_payload)
        if right_payload is not None
        else [c for c in right.columns if c not in {*keys, rt}]
    )
    is_ts = isinstance(left.schema[left_time].dataType, _TS_TYPES)

    # right side: keys + time + one struct carrying (match time, payload)
    r = right.na.drop(subset=[*keys, rt]).select(
        *keys,
        F.col(rt).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(rt).alias("_rt"), *[F.col(c) for c in payload]
        ).alias("_r"),
    )
    l = left.select(
        *left.columns,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal time → >= is inclusive
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc_nulls_first(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        # forward = backward over REVERSED time: sort descending and
        # keep the same incremental (unboundedPreceding, currentRow)
        # running frame. A (currentRow, unboundedFollowing) frame with
        # first(ignorenulls) is semantically identical but Spark
        # evaluates UnboundedFollowing frames by re-aggregating the
        # whole remaining frame per row — O(n^2) per key partition,
        # which contradicts this module's one-sort cost contract.
        # Right rows sort BEFORE left rows at equal time → <= inclusive;
        # NULL left times lead the partition (no right row precedes
        # them) → NULL match, mirroring asc_nulls_first backward.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc_nulls_first(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)

    if tolerance_seconds is not None:
        dist = F.abs(_time_delta(F.col("_t"), matched["_rt"], is_ts))
        matched = F.when(dist <= F.lit(tolerance_seconds), matched)

    taken = {*left.columns}
    out_cols = [F.col(c) for c in left.columns]
    # ALWAYS suffixed — the documented contract ("exposed as
    # {right_time}{suffix}"), not just on collision with a left column
    out_cols.append(F.col("_m._rt").alias(f"{rt}{suffix}"))
    for c in payload:
        out_cols.append(
            F.col(f"_m.{c}").alias(f"{c}{suffix}" if c in taken else c)
        )
    return (
        u.withColumn("_m", matched)
        .filter(F.col("_side") == 1)
        .select(*out_cols)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_time: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    band_seconds: float = 3600.0,
    max_bands: int = 4096,
    suffix: str = "_iv",
) -> DataFrame:
    """Inner point-in-interval join: every (point, interval) pair with
    equal keys and ``start <= point_time <= end`` (both ends inclusive,
    SQL ``BETWEEN``). A point inside k overlapping intervals yields k
    rows.

    Scale path: time is banded into ``band_seconds`` buckets. Points
    map to exactly one bucket; intervals explode via ``sequence()``
    into the buckets they overlap (a 1-hour interval at a 1-hour band
    spans at most 2). The join is then a plain equi-join on
    (keys, bucket) — shuffle-partitioned, AQE-skew-handled, never a
    nested loop — and the exact BETWEEN predicate filters the band's
    false positives. No dedup is needed because a given (point,
    interval) pair can only meet in the point's own bucket.

    Pick ``band_seconds`` near the typical interval length: too small
    explodes intervals into many buckets, too large degrades the
    equi-join's selectivity. An interval spanning more than
    ``max_bands`` buckets fails loudly (raise_error in the plan)
    rather than silently exploding — re-band instead. Intervals with
    NULL or reversed bounds are dropped, matching SQL BETWEEN.
    """
    keys = _as_key_list(on)
    # "_b" is the internal band column on BOTH sides; a same-named user
    # column would be silently replaced (points) or duplicated
    # (intervals) and then dropped from the output — fail loudly
    if "_b" in points.columns or "_b" in intervals.columns:
        raise ValueError(
            "a '_b' column collides with interval_join's internal band "
            "column — rename it first"
        )
    is_ts = isinstance(points.schema[point_time].dataType, _TS_TYPES)
    # band width in the time column's own units: microseconds for
    # timestamps, raw units for numeric time
    width = F.lit(int(band_seconds * 1_000_000)) if is_ts else F.lit(band_seconds)

    def bucket(c: Column) -> Column:
        t = _micros(c) if is_ts else c.cast("double")
        return F.floor(t / width)

    iv = intervals.na.drop(subset=[*keys, start_col, end_col]).filter(
        F.col(start_col) <= F.col(end_col)
    )
    span = bucket(F.col(end_col)) - bucket(F.col(start_col)) + 1
    iv = iv.withColumn(
        "_b",
        F.explode(
            F.when(
                span <= F.lit(max_bands),
                F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col))),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"interval_join: an interval spans more than "
                            f"{max_bands} bands of {band_seconds}s — "
                            f"re-band with a larger band_seconds ("
                        ),
                        span.cast("string"),
                        F.lit(" bands needed)"),
                    )
                )
            )
        ),
    )
    # suffix interval columns that collide with point columns
    taken = set(points.columns)
    iv = iv.select(
        *[F.col(k) for k in keys],
        "_b",
        *[
            F.col(c).alias(f"{c}{suffix}" if c in taken else c)
            for c in intervals.columns
            if c not in keys
        ],
    )
    s = f"{start_col}{suffix}" if start_col in taken else start_col
    e = f"{end_col}{suffix}" if end_col in taken else end_col
    pt = points.withColumn("_b", bucket(F.col(point_time)))
    return (
        pt.join(iv, on=[*keys, "_b"], how="inner")
        .filter(F.col(point_time).between(F.col(s), F.col(e)))
        .drop("_b")
    )
