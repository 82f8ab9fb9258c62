"""Sort-order / Z-order clustering expressions for compaction rewrites.

Iceberg's sort-order compaction (``rewrite_data_files`` with a table
sort order) and Delta's ``OPTIMIZE ... ZORDER BY`` both solve the same
100 TB problem this module targets: on a key-hash-bucketed layout every
bucket sees the whole range of every non-key column, so per-file
min/max stats prune *nothing* for range predicates — one file per
bucket means the one file always may-match. Rewriting each bucket as
several files, each covering a narrow range of the cluster columns,
turns the existing footer-stats skipping (`lake/stats.py`) into real
in-bucket pruning.

Two strategies, picked by ``LakeTable.compact(cluster_by=...)``:

- ``"sort"`` — lexicographic sort within each bucket by the cluster
  columns, rolled into files of ``target_file_rows`` rows. Perfect
  pruning on the leading column, none on trailing ones (the classic
  B-tree-order tradeoff). Works for any orderable column type.
- ``"zorder"`` — rows are sorted by a Morton (Z-order) value that
  interleaves the bits of per-column quantile codes, so every file
  covers a small rectangle in the multi-column space and range
  predicates on *any* clustered column prune. Columns must be
  numeric/date/timestamp (quantile codes come from one
  ``percentile_approx`` aggregate — no extra shuffle, no sampling UDF).

Everything here is pure Catalyst expressions (whole-stage codegen'd);
the quantile cutpoints are the only driver-side state, collected by a
single aggregate job over the candidate buckets.

Reference behavior matched: the reference engine has no clustering
analog (its sinks write row-group-at-a-time NDJSON,
``/root/reference/mex/extractors/sinks/s3.py``); this is the
Spark-first capability a 100 TB lake needs on top of it.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# cells per column = 2**ZORDER_BITS; 6 bits = 63 cutpoints per column
# keeps the code expression comfortably inside one codegen'd method
# while giving 4096 distinct z-cells for a 2-column cluster.
ZORDER_BITS = 6

# column name the z-value is materialized under in the *physical*
# parquet files of a z-ordered rewrite. Reads are invisible to it:
# every read path loads files with an explicit logical schema, and
# parquet resolves columns by name, so an extra physical column is
# simply never materialized.
ZVALUE_COL = "_mex_zv"

_ZORDERABLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
)


def zorder_supported(dt: T.DataType) -> bool:
    """Whether a column type can carry a quantile code (projectable to
    double with order preserved — see ``numeric_expr``)."""
    return isinstance(dt, _ZORDERABLE)


def numeric_expr(c: str, dt: T.DataType) -> Column:
    """Order-preserving double projection of a zorderable column.
    DATE cannot cast to double directly (Spark rejects it) — it goes
    through ``unix_date``; TIMESTAMP casts to epoch seconds natively."""
    col = F.col(c)
    if isinstance(dt, T.DateType):
        return F.unix_date(col).cast("double")
    return col.cast("double")


def column_cutpoints(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = ZORDER_BITS,
    accuracy: int = 10_000,
) -> dict[str, list[float]]:
    """Per-column quantile cutpoints from ONE ``percentile_approx``
    aggregate over ``df`` (the candidate buckets' rows). The aggregate
    is a partial-merge sketch — no shuffle of the data, one job — and
    the result is O(2^bits) floats per column on the driver."""
    fracs = [(i + 1) / (1 << bits) for i in range((1 << bits) - 1)]
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [
        F.percentile_approx(
            numeric_expr(c, fields[c]), fracs, accuracy
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    return {
        c: sorted({float(v) for v in (row[c] or []) if v is not None})
        for c in cols
    }


def code_expr(col: Column, cuts: Sequence[float]) -> Column:
    """Quantile code of ``col``: the number of cutpoints strictly below
    the value — a chain of codegen'd comparisons, rows with NULL land
    in cell 0 (nulls-first, matching Spark's default sort order)."""
    code: Column = F.lit(0)
    for cut in cuts:
        code = code + F.when(
            col.cast("double") > F.lit(float(cut)), 1
        ).otherwise(0)
    return code


def zvalue_expr(
    cols: Sequence[str],
    cutpoints: Mapping[str, Sequence[float]],
    bits: int = ZORDER_BITS,
    schema: T.StructType | None = None,
) -> Column:
    """Morton value interleaving the per-column quantile codes, most
    significant bits first, column order breaking ties at equal bit
    significance. Sorting by this value and rolling files at a row
    budget gives each file a compact z-range — a bounded rectangle in
    every clustered dimension.

    ``schema`` enables the order-preserving date projection
    (``numeric_expr``); without it columns cast straight to double."""
    n = len(cols)
    if bits * n > 64:
        # Java's shiftleft masks the shift amount to 6 bits, so a
        # >=64-bit Morton value would silently wrap high-significance
        # bits onto low ones — garbage interleaving with no error
        raise ValueError(
            f"zorder Morton value needs bits*len(cols) <= 64 "
            f"(got {bits}*{n} = {bits * n}); lower ZORDER_BITS or "
            "cluster on fewer columns"
        )
    fields = (
        {f.name: f.dataType for f in schema.fields} if schema is not None else {}
    )

    def _num(c: str) -> Column:
        if c in fields:
            return numeric_expr(c, fields[c])
        return F.col(c).cast("double")

    codes = [code_expr(_num(c), cutpoints[c]) for c in cols]
    z: Column = F.lit(0).cast("long")
    for b in range(bits):
        for ci, code in enumerate(codes):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, b * n + (n - 1 - ci)))
    return z
