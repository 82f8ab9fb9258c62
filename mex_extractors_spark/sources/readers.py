"""Validated, schema-declared scans (SURVEY.md §2.1 S1-S5, S18).

The reference validates every row against a Pydantic model at ingest
(seq_repo/extract.py:18 model_validate; synopse/extract.py:41-47
parse_csv) with alias-based column renaming (seq_repo/model.py:16-29).
Spark re-expression: explicit StructType per source + scan-time rename,
plus a quarantine split for rows that fail validation predicates —
instead of raising on the first bad row, bad rows become a side output
with a reason (same lineage philosophy as the filter cascade).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json_validated(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType,
    aliases: dict[str, str] | None = None,
    skip_file_substring: str | None = None,
) -> DataFrame:
    """S1/S2: schema'd JSON scan with alias renaming and file-name
    filtering (voxco/extract.py:25-27 skips ``test_`` files)."""
    df = spark.read.schema(schema).json(paths)
    if skip_file_substring:
        # match on the file NAME like the reference ("test_" not in
        # file_name, voxco/extract.py:26) — the full URI would also
        # skip files under any directory whose path contains the substr
        base = F.element_at(F.split(F.input_file_name(), "/"), -1)
        df = df.where(~base.contains(skip_file_substring))
    if aliases:
        df = df.withColumnsRenamed(aliases)
    return df


def read_csv_validated(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    delimiter: str = ",",
    header: bool = True,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """S3: typed CSV scan (synopse/extract.py parse_csv sites)."""
    df = spark.read.csv(path, schema=schema, header=header, sep=delimiter)
    if aliases:
        df = df.withColumnsRenamed(aliases)
    return df


def read_xml_records(
    spark: SparkSession,
    path: str | list[str],
    row_tag: str,
    schema: StructType | None = None,
    max_authors: int | None = None,
    authors_col: str = "authors",
) -> DataFrame:
    """S6: XML record scan (endnote/extract.py:22-60) via Spark 4's
    native XML source. ``max_authors`` applies the reference's
    author-count cutoff (endnote/extract.py:36-44) as a pushed-down
    ``size(col) < n`` filter instead of per-record Python."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    # load() takes a list directly; a comma-joined string would be
    # treated as ONE literal path and fail with PATH_NOT_FOUND
    df = reader.load(path)
    if max_authors is not None:
        # size(NULL) is NULL (not -1) in non-legacy Spark, which would
        # silently drop records with no authors block — the reference
        # cutoff only drops records with TOO MANY authors
        a = F.col(authors_col)
        df = df.where(a.isNull() | (F.size(a) < F.lit(max_authors)))
    return df


def parse_xml_column(
    df: DataFrame, xml_col: str, schema: str | StructType, out_col: str = "parsed"
) -> DataFrame:
    """S6 variant: parse an XML-string column in place (`from_xml`) —
    for streams/tables that carry XML payloads as data."""
    return df.withColumn(out_col, F.from_xml(F.col(xml_col), schema))


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-testdata convention: one parquet per table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def quarantine_split(
    df: DataFrame, required_non_null: Sequence[str], extra_rules: Sequence[tuple[str, Column]] = ()
) -> tuple[DataFrame, DataFrame]:
    """Validation gate: (valid, quarantined-with-reason).

    Replaces raise-on-first-invalid Pydantic validation with a total
    split: every row lands exactly once; the quarantine carries the
    first failed rule name.
    """
    reason = F.lit(None).cast("string")
    rules: list[tuple[str, Column]] = [
        *[(f"null:{c}", F.col(c).isNull()) for c in required_non_null],
        *extra_rules,
    ]
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    tagged = df.withColumn("_invalid_reason", reason)
    valid = tagged.where(F.col("_invalid_reason").isNull()).drop("_invalid_reason")
    bad = tagged.where(F.col("_invalid_reason").isNotNull())
    return valid, bad


def columnar_pivot(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """S8 columnar exception (grippeweb/connector.py:64-75): table →
    one row per column name with its distinct sorted values — what the
    reference pivots dicts for, free in a columnar engine."""
    if not columns:
        raise ValueError("columnar_pivot needs at least one column")
    parts = [
        df.select(
            F.lit(c).alias("column_name"),
            F.array_sort(F.collect_set(F.col(c).cast("string"))).alias("value_set"),
        )
        for c in columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
