"""S7 — relational database scans (MSSQL in the reference).

The reference pulls nine whitelisted SurvNet queries through one pyodbc
connection and zips rows to dicts (ifsg/connector.py:36-82
QUERY_BY_MODEL + parse_rows; kvis/extract.py:10 same shape). That is a
single-connection, driver-side pull. The cluster shape has two tiers:

- :func:`build_jdbc_options` / :func:`read_jdbc_table` — Spark's own
  JDBC source with explicit range partitioning (partitionColumn/
  lowerBound/upperBound/numPartitions) so N executors each pull a key
  range concurrently, predicates pushed into the database. This is the
  production path on a real cluster (needs a JDBC driver jar).
- :func:`read_db_table` — the same whitelist + range-partitioning
  semantics over a pluggable ``execute_query`` callback running inside
  the generic vectorized scan adapter (``file_scan.scan_units_
  vectorized``). The callback is the dialect: pyodbc in production, a
  DuckDB-over-parquet stand-in in tests — which makes the whole path
  runnable and testable in this sandbox.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from mex_extractors_spark.sources.file_scan import scan_units_vectorized


def whitelisted_query(query_by_model: dict[str, str], model_name: str) -> str:
    """QUERY_BY_MODEL gate (ifsg/connector.py:36-47): only registered
    model → query pairs may run; anything else is a hard error."""
    try:
        return query_by_model[model_name]
    except KeyError as exc:
        raise KeyError(
            f"model {model_name!r} has no whitelisted query; "
            f"known: {sorted(query_by_model)}"
        ) from exc


def range_predicates(
    partition_column: str, lower: int, upper: int, num_partitions: int
) -> list[str]:
    """Spark-JDBC-style range split: ``num_partitions`` WHERE clauses
    covering (-inf, upper] ∪ ... with open ends so no row is lost."""
    if num_partitions <= 1:
        return ["1=1"]
    step = max(1, (upper - lower) // num_partitions)
    bounds = [lower + i * step for i in range(1, num_partitions)]
    preds = [f"{partition_column} < {bounds[0]}"]
    preds += [
        f"{partition_column} >= {bounds[i]} AND {partition_column} < {bounds[i + 1]}"
        for i in range(len(bounds) - 1)
    ]
    preds.append(f"{partition_column} >= {bounds[-1]}")
    return preds


def read_db_table(
    spark: SparkSession,
    query_by_model: dict[str, str],
    model_name: str,
    schema: StructType,
    execute_query: Callable[[str], Any],
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """Whitelisted, range-partitioned database scan.

    ``execute_query(sql) -> pandas.DataFrame`` is the dialect adapter;
    it runs executor-side, one call per range partition, through the
    vectorized scan (schema alignment + quarantine included). The
    declared ``schema`` is the model contract — the reference's
    Pydantic model, as a StructType.
    """
    base = whitelisted_query(query_by_model, model_name)
    if partition_column is not None:
        if lower is None or upper is None:
            raise ValueError("partition_column needs lower/upper bounds")
        preds = range_predicates(partition_column, lower, upper, num_partitions)
    else:
        preds = ["1=1"]
    units = [
        {"path": f"{model_name}[{i}]", "sql": f"SELECT * FROM ({base}) t WHERE {p}"}
        for i, p in enumerate(preds)
    ]

    def _read(unit: dict[str, Any]):
        return execute_query(unit["sql"])

    return scan_units_vectorized(
        spark, units, schema, _read, num_partitions=max(1, len(units))
    )


def build_jdbc_options(
    url: str,
    query_by_model: dict[str, str],
    model_name: str,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for ``spark.read.format("jdbc")`` with the whitelist and
    explicit range partitioning — pure + testable without a driver."""
    opts = {
        "url": url,
        # dbtable-as-subquery pushes the whitelisted projection down
        "dbtable": f"({whitelisted_query(query_by_model, model_name)}) AS t",
        "fetchsize": str(fetchsize),
    }
    if partition_column is not None:
        if lower is None or upper is None:
            raise ValueError("partition_column needs lower/upper bounds")
        opts |= {
            "partitionColumn": partition_column,
            "lowerBound": str(lower),
            "upperBound": str(upper),
            "numPartitions": str(num_partitions),
        }
    if extra:
        opts |= extra
    return opts


def read_jdbc_table(spark: SparkSession, **kwargs: Any) -> DataFrame:
    """Production JDBC path: same parameters as
    :func:`build_jdbc_options`; requires a JDBC driver jar on the
    cluster classpath."""
    return spark.read.format("jdbc").options(**build_jdbc_options(**kwargs)).load()
