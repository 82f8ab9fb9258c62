"""Iceberg-style copy-on-write lake table (no runtime jars needed).

Snapshot JSON + immutable parquet data files + atomic pointer publish —
cleanly swappable for real Iceberg (`spark-submit --packages`) on a
cluster; the engine only talks to the small `LakeTable` API.
"""

from mex_extractors_spark.lake.schema_evolution import merge_schemas
from mex_extractors_spark.lake.table import LakeTable

__all__ = ["LakeTable", "merge_schemas"]
