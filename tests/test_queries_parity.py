"""Spark-vs-DuckDB parity for every oracle-paired query (the same
comparison the driver runs at sf0.01, exercised here at sf0.001 so
mismatches surface before the round gate)."""

from __future__ import annotations

import math

import duckdb
import pytest

from mex_extractors_spark.plans.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows_to_set(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


ORACLED = sorted(name for name, qd in REGISTRY.items() if qd.oracle is not None)
ROWS_ONLY = sorted(name for name, qd in REGISTRY.items() if qd.oracle is None)


def _assert_driver_canonicalizable(name, sdf):
    """Registry guard: the driver's oracle harness canonicalizes results
    via pandas sort_values, which cannot sort array/map/struct cells
    (CORRECTNESS_r04's only err, s13_openapi_classify). Every registered
    query must emit scalar top-level columns only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} break the driver's "
        "pandas canonicalization — array_join/to_json them to scalars"
    )


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    _assert_driver_canonicalizable(name, sdf)
    spark_cols = sdf.columns
    spark_rows = _rows_to_set([tuple(r) for r in sdf.collect()], spark_cols)

    res = ddb.execute(qd.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = _rows_to_set(res.fetchall(), duck_cols)

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert spark_rows == duck_rows, (
        f"{name}: value mismatch ({len(spark_rows)} vs {len(duck_rows)} rows); "
        f"first spark={spark_rows[:2]} duck={duck_rows[:2]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    _assert_driver_canonicalizable(name, sdf)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
