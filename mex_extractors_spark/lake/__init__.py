"""Iceberg-style copy-on-write lake table (no runtime jars needed).

Snapshot JSON + immutable parquet data files + atomic pointer publish —
cleanly swappable for real Iceberg (`spark-submit --packages`) on a
cluster; the engine only talks to the small `LakeTable` API.
"""

from mex_extractors_spark.lake.ann import IvfIndex
from mex_extractors_spark.lake.catalog import (
    LakeCatalog,
    LakeTransaction,
    replay_into_catalog,
)
from mex_extractors_spark.lake.derived import full_refresh, refresh_aggregates
from mex_extractors_spark.lake.index import full_index, refresh_inverted_index
from mex_extractors_spark.lake.schema_evolution import merge_schemas
from mex_extractors_spark.lake.table import (
    ApplyStats,
    CommitAborted,
    CommitConflict,
    DmlStats,
    LakeTable,
)

__all__ = [
    "ApplyStats",
    "CommitAborted",
    "CommitConflict",
    "DmlStats",
    "IvfIndex",
    "LakeCatalog",
    "LakeTable",
    "LakeTransaction",
    "full_index",
    "full_refresh",
    "merge_schemas",
    "refresh_aggregates",
    "refresh_inverted_index",
    "replay_into_catalog",
]
