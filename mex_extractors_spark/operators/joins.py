"""Join/lookup operators (SURVEY.md §2.4).

Every reference join is a Python dict probe or a cached RPC — build
side always a small dimension. Spark-first: broadcast hash joins for
dims, left-anti + union for get-or-create upserts, iterative joins for
the one graph op (topological levels). No sort-merge join should ever
appear in these plans at dimension scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mex_extractors_spark.functions.ids import stable_id


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Dict-probe join (seq_repo/main.py:49-52 ``{k: v}.get(key)``) →
    broadcast hash join. ``how='inner'`` is the join-by-skip variant
    (synopse/transform.py:156-159 ``if key not in dict: continue``)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def lookup_with_fallback(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    value_col: str,
    fallback,
) -> DataFrame:
    """Left join + coalesce to a fallback literal — missing unit →
    FALLBACK_UNIT (seq_repo/transform.py:304-313, open_data/transform.py:52)."""
    joined = fact.join(F.broadcast(dim), on=on, how="left")
    return joined.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(fallback)))


def get_or_create_dim(
    dim: DataFrame,
    needed_keys: DataFrame,
    key_col: str,
    id_col: str,
    id_namespace: str,
) -> DataFrame:
    """Get-or-create dimension upsert without per-row side effects.

    The reference creates missing orgs mid-transform and ``load()``s
    them eagerly (synopse/transform.py:648-683,
    international_projects/transform.py:235-262). Spark re-expression:
    left-anti join finds the missing keys, deterministic ids are minted
    as column expressions (no identity service), and the union becomes
    the new dimension — one shuffle, done BEFORE the main join.
    """
    missing = (
        needed_keys.select(F.col(key_col)).where(F.col(key_col).isNotNull()).distinct()
        .join(dim.select(key_col), key_col, "left_anti")
        .withColumn(id_col, stable_id(F.lit(id_namespace), F.col(key_col)))
    )
    for c in dim.columns:
        if c not in (key_col, id_col):
            missing = missing.withColumn(c, F.lit(None).cast(dim.schema[c].dataType))
    return dim.unionByName(missing.select(*dim.columns))


def synonym_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_name_col: str,
    synonyms_col: str = "synonyms",
    id_col: str | None = None,
) -> DataFrame:
    """Resolve a free-text name against a dimension's synonym arrays —
    unit-by-synonym lookup (organigram/helpers.py:70-85). Explode the
    (small) dim's synonyms, broadcast, equi-join.

    ``id_col``: when set, a synonym shared by several dim rows resolves
    to exactly ONE (the row with the greatest ``id_col`` — the
    deterministic stand-in for the reference's dict build, where the
    last insert wins). Without it the join keeps SQL semantics: a
    duplicated synonym fans the fact row out once per owner."""
    exploded = dim.withColumn(fact_name_col, F.explode(F.col(synonyms_col))).drop(synonyms_col)
    if id_col is not None:
        others = [c for c in exploded.columns if c != fact_name_col]
        exploded = exploded.groupBy(fact_name_col).agg(
            *[
                F.max_by(F.col(c), F.col(id_col)).alias(c)
                for c in others
            ]
        )
    return fact.join(F.broadcast(exploded), on=fact_name_col, how="left")


def self_link_successor(
    df: DataFrame,
    name_col: str,
    ref_name_col: str,
    id_col: str,
    out_col: str = "succeeds",
    unique_names: bool = True,
) -> DataFrame:
    """Successor linking: set ``succeeds`` from a name reference to
    another row's id (synopse/transform.py:542-587 two-pass dict build
    → self broadcast join).

    ``unique_names=True`` (default) mirrors the reference's dict
    semantics: a name carried by several rows links to exactly one id
    (the greatest — deterministic, unlike the dict's insertion-order
    overwrite); ``False`` keeps SQL join semantics and fans out."""
    lookup = df.select(F.col(name_col).alias(ref_name_col), F.col(id_col).alias(out_col))
    if unique_names:
        lookup = lookup.groupBy(ref_name_col).agg(F.max(out_col).alias(out_col))
    return df.join(F.broadcast(lookup), on=ref_name_col, how="left")


def topological_levels(
    edges: DataFrame,
    id_col: str = "unit_id",
    parent_col: str = "parent_unit_id",
    max_depth: int = 20,
) -> DataFrame:
    """Topological level per node: parents precede children
    (sorters.py:12-49 networkx.topological_sort). Iterative-join level
    assignment — level(n) = 1 + level(parent); roots = level 0. Cycles
    surface as rows that never stabilize (left at null) so callers can
    fail loudly like the reference's TopologicalSortError.

    ``orderBy(level, id)`` afterwards reproduces the reference's
    deterministic parent-first, pk-tiebreak ordering.
    """
    nodes = edges.select(id_col, parent_col)
    # roots: no parent, OR a DANGLING parent (an id that never appears
    # as a node row — an incomplete dimension extract, not a cycle).
    # networkx auto-creates such a parent node and sorts on; without
    # this seed the whole dangling subtree would stay level-null and be
    # misdiagnosed as a cycle by the caller's fail-loudly contract
    known = nodes.select(F.col(id_col).alias("_known")).distinct()
    levels = nodes.where(F.col(parent_col).isNull()).select(
        id_col, F.lit(0).alias("level")
    ).unionByName(
        nodes.where(F.col(parent_col).isNotNull())
        .join(known, F.col(parent_col) == F.col("_known"), "left_anti")
        .select(id_col, F.lit(1).alias("level"))
    )
    frontier = levels
    cached: list[DataFrame] = []
    for _ in range(max_depth):
        nxt = (
            nodes.join(
                F.broadcast(
                    frontier.select(
                        F.col(id_col).alias(parent_col), F.col("level").alias("_pl")
                    )
                ),
                parent_col,
            )
            .select(id_col, (F.col("_pl") + 1).alias("level"))
        )
        new = nxt.join(levels.select(id_col), id_col, "left_anti").persist()
        cached.append(new)
        if new.isEmpty():
            break
        levels = levels.unionByName(new)
        frontier = new
    # materialize the (dimension-sized) result, then free every
    # per-iteration cache — a deep hierarchy must not leave O(depth)
    # cached partitions behind for the rest of the session
    result = (
        nodes.select(id_col).distinct().join(levels, id_col, "left").localCheckpoint()
    )
    for df in cached:
        df.unpersist()
    return result
