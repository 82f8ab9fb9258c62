"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC query (converged LWW state over the
events stream) on sf0.001. ``queries``/``oracle_sql`` expose the
operator registry in ``mex_extractors_spark.plans.queries`` — one entry
per implemented operator family from SURVEY.md §2, each oracle an
ANSI-SQL equivalent DuckDB runs on the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mex_extractors_spark.plans import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.cdc_converged_state(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
