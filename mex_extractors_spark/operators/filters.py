"""Filter operators with drop-reason lineage (SURVEY.md §2.3).

The reference's filters log every drop with a reason
(mex/extractors/filters.py:18-84, ff_projects/filter.py:43-142, each
failure logged via logging.py:13-32). The Spark re-expression keeps the
lineage as data: a ``drop_reason`` column computed by one
``when``-cascade, so per-reason counts are a groupBy away and the kept
set is a single filter — no per-row logging, no second pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def filter_cascade(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Annotate with the FIRST failing rule's name (order = reference's
    sequential predicate cascade, ff_projects/filter.py:43-142).

    ``rules``: ordered (reason, drop_condition) pairs. Adds
    ``drop_reason`` (null = keep). Use ``kept``/``drop_counts`` to
    consume.
    """
    reason = F.lit(None).cast("string")
    # build from the last rule backwards so the first match wins
    for name, cond in reversed(list(rules)):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return df.withColumn("drop_reason", reason)


def kept(df_with_reason: DataFrame) -> DataFrame:
    return df_with_reason.where(F.col("drop_reason").isNull()).drop("drop_reason")


def drop_counts(df_with_reason: DataFrame) -> DataFrame:
    """Per-reason drop lineage metric (groupBy over the reason column)."""
    return (
        df_with_reason.where(F.col("drop_reason").isNotNull())
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )


def keep_singletons(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Remove ALL rows whose key occurs more than once — the reference's
    keep-only-singletons dedup (ff_projects/filter.py:144-155,
    ``lfd_nrs.count(x) == 1``). Window count, no self-join."""
    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    return (
        df.withColumn("_n", F.count(F.lit(1)).over(w))
        .where(F.col("_n") == 1)
        .drop("_n")
    )


def deny_list_filter(
    df: DataFrame,
    array_col: str,
    deny_patterns: Sequence[str],
) -> DataFrame:
    """Drop rows where ANY element of an array column CONTAINS any deny
    entry — the reference's ``any_contains_any`` global filter
    (mex/extractors/filters.py:37-59): substring containment, not regex
    (an entry like ``C++`` must not be a pattern-syntax error, and
    ``a.b`` must not match ``aXb``). An empty deny list drops nothing;
    a null array is "no partner matched" and the row is kept.
    """
    if not deny_patterns:
        return df

    def _hits(x):
        cond = F.lit(False)
        for p in deny_patterns:
            cond = cond | x.contains(F.lit(p))
        return cond

    return df.where(
        ~F.coalesce(F.exists(F.col(array_col), _hits), F.lit(False))
    )


def year_floor_filter(
    df: DataFrame, date_col: str, earliest_year: int
) -> DataFrame:
    """Keep rows with year(date) >= floor (filters.py:61-75)."""
    return df.where(F.year(F.col(date_col)) >= F.lit(earliest_year))


def exactly_one_gate(
    df: DataFrame,
    key_cols: Sequence[str],
    error_if_many: bool = False,
) -> DataFrame:
    """Exactly-one semantics: keep keys with exactly one row.

    Reference precedents: LDAP person lookup returns the person iff the
    query matches exactly one (ldap/helpers.py:33-87), and the publisher
    consent gate RAISES if any person has >1 consent
    (publisher/filter.py:11-54). With ``error_if_many`` the caller gets
    a DataFrame of violations to assert-empty on (blocking check) —
    raising inside executors is not a thing.
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    counted = df.withColumn("_n", F.count(F.lit(1)).over(w))
    if error_if_many:
        return counted.where(F.col("_n") > 1).drop("_n")
    return counted.where(F.col("_n") == 1).drop("_n")


def author_count_cutoff(
    df: DataFrame, authors_col: str, max_authors: int
) -> DataFrame:
    """Drop records whose author count REACHES the cutoff — strict
    ``<`` keep, mirroring the reference exactly (endnote/extract.py:38
    drops when ``len(authors) >= settings.cutoff_number_authors``); a
    record with exactly ``max_authors`` authors is dropped. NULL author
    arrays are kept — ``size(NULL)`` is NULL in non-legacy Spark and
    would silently drop no-authors records the reference keeps (its
    findall yields an empty list, len 0 < cutoff)."""
    a = F.col(authors_col)
    return df.where(a.isNull() | (F.size(a) < F.lit(max_authors)))


def subtree_members(
    edges: DataFrame,
    root_ids: Sequence[str],
    id_col: str = "unit_id",
    parent_col: str = "parent_unit_id",
    max_depth: int = 20,
) -> DataFrame:
    """Descendants of the given roots in a (child, parent) dimension —
    the org-unit subtree filter (datenkompass/filter.py:108-139,
    ``find_descendants``). Iterative self-join BFS to fixpoint; the
    frontier is tiny (dimension table) so each step broadcasts.
    """
    spark = edges.sparkSession
    # explicit schema: createDataFrame cannot infer one from an empty
    # root list, and "no configured roots" is a legal (empty) subtree.
    # The id type is taken from the edge table, not hardcoded — a
    # string frontier against bigint edge ids would join through an
    # implicit cast (lossy above 2^53)
    from pyspark.sql.types import StructField, StructType

    frontier = spark.createDataFrame(
        [(r,) for r in root_ids],
        StructType([StructField(id_col, edges.schema[id_col].dataType)]),
    )
    seen = frontier
    cached: list[DataFrame] = []
    for _ in range(max_depth):
        children = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed(id_col, parent_col)),
                parent_col,
            )
            .select(id_col)
            .distinct()
        )
        new = children.join(seen, id_col, "left_anti").persist()
        cached.append(new)
        if new.isEmpty():
            break
        seen = seen.unionByName(new).persist()
        cached.append(seen)
        frontier = new
    # materialize the subtree, then free every per-iteration cache
    result = seen.localCheckpoint()
    for df in cached:
        df.unpersist()
    return result
