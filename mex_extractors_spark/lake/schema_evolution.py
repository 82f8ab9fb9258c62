"""Schema-merge executed before each apply batch (SURVEY.md §4.2).

The reference's notion of schema evolution is "new model version ⇒ new
output prefix + recorded versions" (mex/extractors/sinks/s3.py:100-127).
Here it is a real table-metadata operation with Iceberg semantics:

- new columns in the batch are ADDED to the table schema (nullable);
- type WIDENING is allowed along int→long→double (and float→double),
  date→timestamp;
- NARROWING or incompatible changes are rejected (the batch fails
  before any data file is written — a blocking check, cf.
  mex/extractors/pipeline/base.py:113).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
    TimestampType,
)

# widening lattice: a type may be promoted to anything with a higher rank
# within its family
_NUMERIC_RANK: dict[str, int] = {
    ByteType().simpleString(): 0,
    ShortType().simpleString(): 1,
    IntegerType().simpleString(): 2,
    LongType().simpleString(): 3,
    FloatType().simpleString(): 4,
    DoubleType().simpleString(): 5,
}
_TEMPORAL_RANK: dict[str, int] = {
    DateType().simpleString(): 0,
    TimestampType().simpleString(): 1,
}


class SchemaEvolutionError(ValueError):
    """Incompatible schema change: narrowing or cross-family rewrite."""


def _widen(a: DataType, b: DataType) -> DataType:
    """Least common widened type of two field types, or raise."""
    if a == b:
        return a
    sa, sb = a.simpleString(), b.simpleString()
    for rank in (_NUMERIC_RANK, _TEMPORAL_RANK):
        if sa in rank and sb in rank:
            return a if rank[sa] >= rank[sb] else b
    raise SchemaEvolutionError(f"cannot evolve column type {sa} <-> {sb}")


def merge_schemas(table_schema: StructType, batch_schema: StructType) -> StructType:
    """Merged target schema: table fields (possibly widened) first, then
    batch-only fields appended in batch order, all nullable additions."""
    table_by_name = {f.name: f for f in table_schema.fields}
    out: list[StructField] = []
    batch_by_name = {f.name: f for f in batch_schema.fields}
    for f in table_schema.fields:
        if f.name in batch_by_name:
            widened = _widen(f.dataType, batch_by_name[f.name].dataType)
            out.append(StructField(f.name, widened, nullable=f.nullable or batch_by_name[f.name].nullable))
        else:
            # column absent from this batch: keep, values stay/become null
            out.append(StructField(f.name, f.dataType, nullable=True))
    for f in batch_schema.fields:
        if f.name not in table_by_name:
            out.append(StructField(f.name, f.dataType, nullable=True))
    return StructType(out)


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project/cast a DataFrame to the target schema: missing columns
    become typed nulls, widened columns are cast. Pure projection —
    stays inside whole-stage codegen."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            src = F.col(f.name)
            cols.append(src.cast(f.dataType).alias(f.name) if have[f.name].dataType != f.dataType else src)
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
