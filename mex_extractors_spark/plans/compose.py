"""Multi-source composition — the ``all_extractors`` lifecycle analog.

The reference runs every source extractor through shared dimensions
into one publish job (pipeline/base.py:204-211 ``all_extractors`` asset
job; SURVEY.md §3.2-3.3 lifecycle): per-source extract/transform →
common MEx model with deterministic identity → shared org/unit
dimensions (get-or-create) → one merged store → publish-filtered read.

Spark composition: each heterogeneous source is adapted to the common
schema with :func:`to_common_model` (pure expressions — identity is a
column, not an identity-service round-trip), ALL sources' org keys are
resolved against ONE shared dimension in a single get-or-create pass
(so two sources naming the same org mint the same id — the property
the reference's shared wikidata/organization pipeline exists for), the
union lands in one :class:`LakeTable` batch, and publishing is a
predicate-pushed read (deny-listed primary sources filtered at scan).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mex_extractors_spark.lake.table import LakeTable
from mex_extractors_spark.operators.joins import get_or_create_dim
from mex_extractors_spark.sources.normalize import to_common_model

COMMON_COLUMNS = [
    "identifier",
    "stableTargetId",
    "hadPrimarySource",
    "identifierInPrimarySource",
    "title_text",
    "org_id",
]


@dataclass(frozen=True)
class SourceSpec:
    """One heterogeneous source and how to adapt it to the common model."""

    primary_source: str
    natural_key_col: str
    title_col: str | None = None
    org_key_col: str | None = None


def compose_sources(
    sources: list[tuple[DataFrame, SourceSpec]],
    org_dim: DataFrame,
    org_key_col: str = "org_key",
    org_id_col: str = "org_id",
    org_namespace: str = "org",
) -> tuple[DataFrame, DataFrame]:
    """Adapt every source to the common model and resolve org keys
    against ONE shared get-or-create dimension.

    Returns ``(items, dim)``: the unioned common-model items (each with
    its resolved ``org_id``) and the upserted dimension. The dimension
    is dimension-sized → broadcast into every source's join; the only
    shuffles are the single distinct over needed org keys inside
    ``get_or_create_dim``.
    """
    adapted: list[DataFrame] = []
    for df, spec in sources:
        c = to_common_model(
            df, spec.primary_source, spec.natural_key_col, spec.title_col
        )
        # title is a Text[] array (single element when present)
        title = (
            F.element_at("title", 1).getField("value")
            if spec.title_col is not None
            else F.lit(None)
        ).cast("string")
        org_key = (
            F.col(spec.org_key_col) if spec.org_key_col else F.lit(None)
        ).cast("string")
        adapted.append(
            c.select(
                "identifier",
                "stableTargetId",
                "hadPrimarySource",
                "identifierInPrimarySource",
                title.alias("title_text"),
                org_key.alias(org_key_col),
            )
        )

    union = adapted[0]
    for a in adapted[1:]:
        union = union.unionByName(a)

    needed = union.select(org_key_col)
    dim = get_or_create_dim(org_dim, needed, org_key_col, org_id_col, org_namespace)
    items = union.join(
        F.broadcast(dim.select(org_key_col, org_id_col)), org_key_col, "left"
    ).select(*COMMON_COLUMNS)
    return items, dim


def publish_multi_source(
    spark: SparkSession,
    sources: list[tuple[DataFrame, SourceSpec]],
    org_dim: DataFrame,
    lake_dir: str,
    deny_primary_sources: tuple[str, ...] = (),
    batch_id: str = "all-extractors-1",
) -> tuple[DataFrame, LakeTable]:
    """End-to-end: compose → one lake batch → publish-filtered read.

    The lake table is keyed on the common-model identity (stable across
    re-runs), the batch applies exactly-once (idempotent batch id), and
    the publish read filters deny-listed primary sources — the
    reference's publisher primary-source filter (publisher/extract.py),
    pushed down to the bucketed parquet scan.
    """
    items, _dim = compose_sources(sources, org_dim)
    table = LakeTable(
        lake_dir,
        key_cols=["hadPrimarySource", "identifierInPrimarySource"],
        seq_col="seq",
        op_col="op",
        num_buckets=4,
    )
    events = items.withColumns(
        {"seq": F.lit(1).cast("long"), "op": F.lit("U")}
    )
    table.apply_batch(spark, events, batch_id)
    published = table.read(spark)
    if deny_primary_sources:
        published = published.where(
            ~F.col("hadPrimarySource").isin(list(deny_primary_sources))
        )
    return published, table
