"""Canonical row serialization + content hashing.

The reference's integrity contract: items serialize to sorted-key JSON
and the byte stream is sha256'd into the commit metadata
(mex/extractors/sinks/s3.py:97,106-109; asserted byte-for-byte in
tests/sinks/test_s3.py:69-79). Spark version: a struct with
name-sorted fields → ``to_json`` → ``sha2(..., 256)`` — byte-stable
across partitionings and cluster sizes because field order is fixed
and no nondeterministic expression participates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_json(df_or_cols: DataFrame | Sequence[str]) -> Column:
    """Sorted-field JSON for each row (the canonical bytes).

    ``ignoreNullFields=false`` matters: the reference serializes with
    ``exclude_none=False`` (sinks/s3.py:173) and ``json.dumps`` keeps
    null keys, so a null-valued field must appear as ``"field":null``
    — Spark's default silently omits it, which would make the canonical
    bytes (and every checksum built on them) diverge from the
    reference's for any row containing a null."""
    names = (
        sorted(df_or_cols.columns)
        if isinstance(df_or_cols, DataFrame)
        else sorted(df_or_cols)
    )
    return F.to_json(F.struct(*names), {"ignoreNullFields": "false"})


def row_sha256(df_or_cols: DataFrame | Sequence[str]) -> Column:
    """sha256 of the canonical row bytes (C13+C14)."""
    return F.sha2(canonical_json(df_or_cols), 256)


def content_sha256(col: str | Column = "content") -> Column:
    """The BASELINE per-row invariant: sha256 of the content column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def table_checksum(df: DataFrame) -> Column:
    """Order-independent whole-table integrity value: sum of per-row
    64-bit hashes of the canonical json, as an aggregate expression."""
    return F.sum(F.xxhash64(canonical_json(df)).cast("decimal(38,0)"))
