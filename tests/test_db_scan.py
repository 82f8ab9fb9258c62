"""S7 DB-scan adapter (whitelist + range partitioning, DuckDB dialect
stand-in) and S13 OpenAPI schema scan."""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from mex_extractors_spark.sources.db_scan import (
    build_jdbc_options,
    range_predicates,
    read_db_table,
    whitelisted_query,
)
from mex_extractors_spark.sources.file_scan import split_scan_errors
from mex_extractors_spark.sources.openapi import openapi_schemas_df

SF = "/root/testdata/sf0.001"
QUERIES = {
    "MetaNation": f"SELECT n_nationkey, n_name FROM '{SF}/nation.parquet'",
}
SCHEMA = StructType(
    [StructField("n_nationkey", IntegerType()), StructField("n_name", StringType())]
)


def _duckdb_dialect_factory():
    # returned as a closure so cloudpickle ships it by VALUE to the
    # executors (a module-level test function would pickle by reference
    # and fail to import worker-side)
    def dialect(sql: str):
        import duckdb

        return duckdb.connect().execute(sql).fetch_df()

    return dialect


def test_whitelist_rejects_unknown_model():
    with pytest.raises(KeyError, match="no whitelisted query"):
        whitelisted_query(QUERIES, "MetaDropTables")


def test_range_predicates_cover_whole_domain():
    preds = range_predicates("k", 0, 100, 4)
    assert len(preds) == 4
    assert preds[0] == "k < 25"
    assert preds[-1] == "k >= 75"  # open-ended: no row lost past upper


def test_partitioned_db_scan_matches_full_table(spark):
    df = read_db_table(
        spark,
        QUERIES,
        "MetaNation",
        SCHEMA,
        _duckdb_dialect_factory(),
        partition_column="n_nationkey",
        lower=0,
        upper=25,
        num_partitions=4,
    )
    good, bad = split_scan_errors(df)
    assert bad.count() == 0
    rows = {(r.n_nationkey, r.n_name) for r in good.collect()}
    full = {(r[0], r[1]) for r in _duckdb_dialect_factory()(QUERIES["MetaNation"]).itertuples(index=False)}
    assert rows == full  # every range partition pulled, no dup/loss


def test_jdbc_options_shape():
    opts = build_jdbc_options(
        "jdbc:sqlserver://host;database=SurvNet3Meta",
        QUERIES,
        "MetaNation",
        partition_column="n_nationkey",
        lower=0,
        upper=25,
        num_partitions=8,
    )
    assert opts["dbtable"].startswith("(SELECT n_nationkey")
    assert opts["partitionColumn"] == "n_nationkey"
    assert opts["numPartitions"] == "8"
    assert opts["fetchsize"] == "10000"


def test_openapi_schema_scan(spark):
    # igs/extract.py:31-46 classification shape
    doc = {
        "components": {
            "schemas": {
                "Pathogen": {"enum": ["SARS", "INFLUENZA"]},
                "Sample": {
                    "properties": {"id": {}, "collected": {}},
                    "required": ["id"],
                },
                "Both": {"enum": ["x"], "properties": {"p": {}}},
                "Neither": {"description": "skipped"},
            }
        }
    }
    rows = {r.schema_name: r for r in openapi_schemas_df(spark, doc).collect()}
    assert set(rows) == {"Pathogen", "Sample", "Both"}
    assert rows["Pathogen"].kind == "enum"
    assert rows["Pathogen"].enum_values == ["SARS", "INFLUENZA"]
    assert rows["Sample"].kind == "properties"
    assert rows["Sample"].fields == ["collected", "id"]
    assert rows["Sample"].required == ["id"]
    assert rows["Both"].kind == "properties"  # reference overwrite order
