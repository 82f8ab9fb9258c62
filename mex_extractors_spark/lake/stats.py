"""File-level column statistics and data-skipping predicates.

Iceberg keeps per-data-file lower/upper bounds + null counts in its
manifests so a planner can drop files *before* scheduling the scan
(data skipping); the reference's analog is the per-export metadata
document written next to the data (`sinks/s3.py:111-133`). Here the
stats ride the snapshot manifest of :class:`~..lake.table.LakeTable`:

- **min/max/null_count** come straight from the parquet footers of the
  files the engine just wrote — the same place Spark's writers already
  deposit them, so collection is a driver-side footer read per new
  file (O(touched buckets), no data job). On a real cluster this is
  exactly the Iceberg model: writers emit stats, the manifest stores
  them.
- **value sets** (capped distinct values per file) are collected for
  low-cardinality columns. On a key-hash-bucketed layout min/max is
  wide for categorical columns (every bucket sees most of the
  alphabet), but *rare* categories live in few buckets — a value set
  prunes `lang = 'cobol'` style filters that min/max never could.
  They're computed by the same ``observe()`` aggregates that already
  produce the manifest checksums, so they cost zero extra jobs.

Pruning is strictly conservative: a file is skipped only when a
conjunct *provably* excludes every row in it, and the residual
predicate is still applied to the surviving rows — correctness never
depends on the stats being present or complete.
"""

from __future__ import annotations

import base64
import hashlib
import math
from typing import Any, Mapping, Sequence

# predicate ops the pruner understands; anything else keeps the file
PRUNABLE_OPS = {"=", "<", "<=", ">", ">=", "in"}

# bloom filter defaults: m bits per (file, column), k probe positions.
# fpp ~ (1 - e^{-kn/m})^k: 8192 bits / 5 hashes holds ~1k distinct
# values per file at <1% false positives; raise bloom_bits for bigger
# files (the manifest cost is m/8 bytes per file per column).
BLOOM_BITS_DEFAULT = 8192
BLOOM_HASHES_DEFAULT = 5
BLOOM_HASHES_MAX = 8  # keeps h1 + i*h2 < 2^63 (h1, h2 are 60-bit)

# value sets above this cardinality are dropped (no pruning power, and
# the manifest should stay small)
VALUE_SET_MAX = 32

_JSONABLE = (int, float, str, bool)


def footer_column_stats(path: str, cols: Sequence[str]) -> dict[str, dict[str, Any]]:
    """Per-column {min, max, nulls} for one parquet file, aggregated
    across its row groups, read from the footer alone. Columns whose
    footer stats are missing/unreadable are omitted (=> never pruned).
    """
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:
        return {}
    if md.num_row_groups == 0:
        return {}
    wanted = set(cols)
    idx_by_name: dict[str, int] = {}
    for i in range(md.num_columns):
        name = md.row_group(0).column(i).path_in_schema
        if name in wanted:  # top-level primitives only (nested paths are dotted)
            idx_by_name[name] = i
    out: dict[str, dict[str, Any]] = {}
    for name, i in idx_by_name.items():
        mn, mx, nulls, ok = None, None, 0, True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo, hi = st.min, st.max
            if not (isinstance(lo, _JSONABLE) and isinstance(hi, _JSONABLE)):
                ok = False
                break
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
            nulls += st.null_count or 0
        if ok and mn is not None:
            out[name] = {"min": mn, "max": mx, "nulls": nulls}
    return out


def bloom_canon(value: Any, type_tag: str) -> str | None:
    """Canonical string a predicate value hashes as, or None when the
    value's Python type does not match the column's stored type family
    (then the bloom must not be consulted: Spark's residual filter can
    still match via implicit cast — e.g. int column vs '5', or a string
    column holding ' 5' vs predicate 5).

    The canonical forms mirror Spark's CAST(col AS STRING) for exactly
    the supported families — string ('s'), integral ('i'), boolean
    ('b') — which is what the write-side bloom builder hashes
    (table.py ``_bloom_bucket_stats``)."""
    if type_tag == "s":
        return value if isinstance(value, str) else None
    if type_tag == "b":
        if isinstance(value, bool):
            return "true" if value else "false"
        return None
    if type_tag == "i":
        if isinstance(value, int) and not isinstance(value, bool):
            return str(value)
        return None
    return None


def bloom_positions(canon: str, m: int, k: int) -> list[int]:
    """The k probe positions for a canonical value: double hashing
    (Kirsch-Mitzenmacher) over one md5 — h1 = first 15 hex chars,
    h2 = hex chars 17..31 forced odd, pos_i = (h1 + i*h2) mod m.
    Must stay bit-identical to the Spark-side builder's
    conv(substring(md5(..), 1, 15), 16, 10) expressions."""
    d = hashlib.md5(canon.encode("utf-8")).hexdigest()
    h1 = int(d[0:15], 16)
    h2 = int(d[16:31], 16) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def bloom_may_contain(bloom: Mapping[str, Any], value: Any) -> bool:
    """Conservative membership test against one file's per-column bloom
    (``{"m": bits, "k": hashes, "t": type_tag, "b": base64 bitset}``).
    Returns False only when the value is PROVABLY absent; any doubt
    (type mismatch, malformed bloom) keeps the file."""
    try:
        canon = bloom_canon(value, bloom["t"])
        if canon is None:
            return True
        bits = base64.b64decode(bloom["b"])
        m, k = int(bloom["m"]), int(bloom["k"])
        if m <= 0 or k <= 0 or len(bits) * 8 < m:
            return True
        for pos in bloom_positions(canon, m, k):
            if not (bits[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True
    except Exception:
        return True


def _has_nan(values: Sequence[Any]) -> bool:
    return any(isinstance(v, float) and math.isnan(v) for v in values)


def _comparable(a: Any, b: Any) -> bool:
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return True
    return type(a) is type(b)


def file_may_match(
    stats: Mapping[str, Mapping[str, Any]] | None,
    col_present: bool,
    col: str,
    op: str,
    value: Any,
) -> bool:
    """Conservative may-match test for one conjunct against one file.

    ``col_present`` is whether the file's schema version contains the
    column at all: a file written before the column existed reads back
    as all-null there, and null satisfies none of the prunable ops, so
    the file is skippable outright (schema-evolution pruning).
    """
    if op not in PRUNABLE_OPS:
        return True
    if not col_present:
        return False
    # NaN predicate values defeat every evidence form: parquet footers
    # exclude NaN from min/max, Python's nan != nan breaks value-set
    # membership, and Spark's NaN==NaN is TRUE — keep the file
    if _has_nan(value if op == "in" else [value]):
        return True
    st = (stats or {}).get(col)
    if st is None:
        return True
    bloom = st.get("bloom")
    if bloom is not None and op in ("=", "in"):
        vals = value if op == "in" else [value]
        # each element either proves absent via the bloom or keeps the
        # file; the bloom saying "maybe" still falls through to the
        # value-set / min-max evidence below
        if all(not bloom_may_contain(bloom, v) for v in vals):
            return False
    values = st.get("values")
    if values is not None and op in ("=", "in"):
        # Value sets REFUTE only — a hit must still fall through to the
        # min/max bounds below: the set is collected per BUCKET and
        # stamped on every file of it (one groupBy readback), so after
        # a clustered compaction splits a bucket into range files the
        # set alone would keep every file and the per-file min/max is
        # the evidence that actually prunes.
        # Type-mismatched predicate values: Spark's residual filter
        # applies implicit casts ('2024' = 2024 can match), so pruning
        # on raw Python membership would drop matching files — skip the
        # refutation. An EMPTY value set means the column is all-null
        # in this file, which no prunable op matches — prune is safe.
        if op == "=":
            if not (values and not _comparable(value, values[0])):
                if value not in values:
                    return False
        else:  # "in"
            # ANY non-comparable element forces a keep: Spark's residual
            # isin() can match it via implicit cast even when the
            # comparable elements all miss (e.g. [100, "5"] vs int col).
            if not (values and any(not _comparable(v, values[0]) for v in value)):
                if not any(v in values for v in value):
                    return False
    mn, mx = st.get("min"), st.get("max")
    if mn is None:
        return True
    try:
        if op == "in":
            cand = [v for v in value if _comparable(v, mn)]
            if len(cand) != len(value):
                return True  # any non-comparable element: conservative keep
            return any(mn <= v <= mx for v in cand)
        if not _comparable(value, mn):
            return True
        if op == "=":
            return mn <= value <= mx
        if op == "<":
            return mn < value
        if op == "<=":
            return mn <= value
        # floating columns: parquet min/max EXCLUDE NaN, but Spark
        # orders NaN above every value, so an unseen NaN row satisfies
        # any '>'/'>=' predicate — max-based refutation is unsound
        # there (Iceberg tracks nan_counts for exactly this reason);
        # '<'/'<=' stay sound because NaN never satisfies them
        if op == ">":
            return True if isinstance(mx, float) else mx > value
        if op == ">=":
            return True if isinstance(mx, float) else mx >= value
    except TypeError:
        return True
    return True


def validate_predicates(where: Sequence[tuple]) -> list[tuple[str, str, Any]]:
    """Normalize/validate a ``where=`` argument: a list of
    ``(column, op, value)`` conjuncts with op in ``PRUNABLE_OPS``."""
    out = []
    for pred in where:
        if len(pred) != 3:
            raise ValueError(f"predicate must be (col, op, value): {pred!r}")
        col, op, value = pred
        if op not in PRUNABLE_OPS:
            raise ValueError(
                f"unsupported predicate op {op!r} (supported: {sorted(PRUNABLE_OPS)})"
            )
        if op == "in" and not isinstance(value, (list, tuple, set)):
            raise ValueError(f"'in' predicate needs a collection value: {pred!r}")
        out.append((col, op, list(value) if op == "in" else value))
    return out
