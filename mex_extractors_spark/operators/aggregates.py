"""Aggregation operators (SURVEY.md §2.5) — hash agg with partial
combine everywhere; no pre-sorts (the reference's sort+itertools.groupby
pattern is subsumed by shuffle-free map-side partial aggregation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_minmax(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    min_alias: str = "start",
    max_alias: str = "modified",
) -> DataFrame:
    """min/max of a value per group — sequencing dates → (start, modified)
    (seq_repo/transform.py:121-144)."""
    return df.groupBy(*key_cols).agg(
        F.min(value_col).alias(min_alias), F.max(value_col).alias(max_alias)
    )


def group_collect(
    df: DataFrame,
    key_cols: Sequence[str],
    struct_cols: Sequence[str],
    alias: str = "items",
    sort: bool = True,
) -> DataFrame:
    """sort+groupby→nested lists (synopse/main.py:85-108) → collect_list
    of structs; array_sort replaces the pre-sort for determinism."""
    agg = F.collect_list(F.struct(*struct_cols))
    if sort:
        agg = F.array_sort(agg)
    return df.groupBy(*key_cols).agg(agg.alias(alias))


def distinct_value_set(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    alias: str = "value_set",
) -> DataFrame:
    """Sorted distinct values per group (synopse/transform.py:200-203,
    grippeweb/transform.py:339-355) → array_sort(collect_set)."""
    return df.groupBy(*key_cols).agg(
        F.array_sort(F.collect_set(value_col)).alias(alias)
    )


def first_of_group(
    df: DataFrame, key_cols: Sequence[str], order_col: str
) -> DataFrame:
    """Deterministic first-of-group representative
    (synopse/transform.py:154-156) via min_by (partial-agg friendly,
    unlike row_number). Ties on ``order_col`` are broken by the full
    row (struct comparison over the remaining columns in schema order)
    — min_by alone returns an arbitrary tied row, which would change
    across partitionings and re-runs."""
    others = [c for c in df.columns if c not in key_cols]
    payload = F.struct(*others)
    packed = df.groupBy(*key_cols).agg(
        F.min_by(payload, F.struct(F.col(order_col), payload)).alias("_w")
    )
    return packed.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in others])


def union_of_key_sets(
    df: DataFrame, col_a: Column | str, col_b: Column | str, alias: str = "key"
) -> DataFrame:
    """Union of two key expressions as one distinct set
    (synopse/extract.py:186-194)."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    return (
        df.select(a.alias(alias))
        .unionAll(df.select(b.alias(alias)))
        .where(F.col(alias).isNotNull())
        .distinct()
    )


def outbound_connection_count(*ref_cols: str) -> Column:
    """Count non-null reference fields per row (utils.py:18-28)."""
    arr = F.array(*[F.col(c) for c in ref_cols])
    return F.size(F.filter(arr, lambda x: x.isNotNull()))
