"""Schema-merge executed before each apply batch (SURVEY.md §4.2).

The reference's notion of schema evolution is "new model version ⇒ new
output prefix + recorded versions" (mex/extractors/sinks/s3.py:100-127).
Here it is a real table-metadata operation with Iceberg semantics:

- new columns in the batch are ADDED to the table schema (nullable);
- type WIDENING is allowed along LOSSLESS promotions only
  (byte→short→int→long, byte/short→float, byte/short/int→double,
  float→double, date→timestamp — the Iceberg promotion rules);
- NARROWING, lossy promotions (long→float/double: a 64-bit integer
  does not fit a 24/53-bit mantissa), or incompatible changes are
  rejected (the batch fails before any data file is written — a
  blocking check, cf. mex/extractors/pipeline/base.py:113).
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

# widening edges: LOSSLESS promotions only. A naive rank lattice that
# puts float above long would let a long column "widen" to float — a
# float mantissa holds 24 bits, so values past 2^24 silently corrupt
# (and long→double past 2^53 likewise). Iceberg's allowed promotions
# are the same idea: int→long, float→double, never integer→smaller
# float. byte/short fit exactly in float; byte/short/int fit exactly
# in double.
_WIDENS_TO: dict[str, set[str]] = {
    ByteType().simpleString(): {"smallint", "int", "bigint", "float", "double"},
    ShortType().simpleString(): {"int", "bigint", "float", "double"},
    IntegerType().simpleString(): {"bigint", "double"},
    LongType().simpleString(): set(),
    FloatType().simpleString(): {"double"},
    DoubleType().simpleString(): set(),
    # date -> timestamp is deliberately NOT a promotion (unlike the int
    # widenings, it is not in Iceberg's set either): the cast goes
    # through spark.sql.session.timeZone, so the same batch replayed
    # under a different session tz would store different instants —
    # breaking byte-stable replay/checksum equality. Evolve via an
    # explicit new column instead.
    DateType().simpleString(): set(),
    TimestampType().simpleString(): set(),
}


class SchemaEvolutionError(ValueError):
    """Incompatible schema change: narrowing or cross-family rewrite."""


def _widen(a: DataType, b: DataType) -> DataType:
    """Least common widened type of two field types, or raise."""
    if a == b:
        return a
    sa, sb = a.simpleString(), b.simpleString()
    # container types that differ ONLY in nullability flags
    # (ArrayType.containsNull, struct field nullable — e.g. collect_list
    # builds containsNull=false arrays) are the same type: keep the
    # table's declaration, align_to_schema's cast absorbs the rest.
    # DataType equality includes those flags but simpleString erases
    # them, so equal strings here mean a nullability-only difference.
    if sa == sb:
        return a
    if sb in _WIDENS_TO.get(sa, set()):
        return b
    if sa in _WIDENS_TO.get(sb, set()):
        return a
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
