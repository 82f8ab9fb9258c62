"""Cross-engine deterministic hashing primitives.

The approximate operators (simhash, sign-LSH, IVF) need hash values an
external oracle can reproduce. Spark's ``xxhash64`` has no DuckDB
equivalent, so operators that want an exact DuckDB oracle use these
md5-derived primitives instead — md5 is identical everywhere:

- ``md5_long60``: the first 15 hex chars of md5 parsed as a 60-bit
  non-negative long. Spark: ``conv(substr(md5(x),1,15),16,10)``;
  DuckDB: ``('0x' || substr(md5(x),1,15))::BIGINT``. 60 bits keeps the
  unsigned value strictly below 2^63 so both engines parse it exactly.
- ``lsh_planes``: pseudo-random hyperplane components computed in pure
  Python (driver-side, hashlib.md5) and embedded as *literals* into
  both the Spark plan and the generated oracle SQL — every executor,
  every run, and the oracle all see identical planes, and the executor
  does zero per-row hash work for them.

The production default for scale paths stays ``xxhash64`` (faster);
the md5 forms exist so the correctness gate can check the exact same
plan shape end-to-end.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long60(col: Column) -> Column:
    """60-bit non-negative long from md5 (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long60_sql(expr: str) -> str:
    """The identical 60-bit md5 hash as a DuckDB SQL fragment."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _unit(seed: int, p: int, j: int) -> float:
    """Deterministic pseudo-random value in [-0.5, 0.5) from (seed,p,j)."""
    h = hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()
    return (int(h[:8], 16) % 1000) / 1000.0 - 0.5


def lsh_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """``num_planes`` hyperplanes of ``dim`` components, pure-Python
    deterministic — embed as literals in Spark plans and oracle SQL."""
    return [[_unit(seed, p, j) for j in range(dim)] for p in range(num_planes)]


def dot(a: list[float], b: list[float]) -> float:
    """Plain sequential dot product — same accumulation order as the
    Spark ``aggregate`` fold and DuckDB's ``list_dot_product``."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def sign_bucket_of(vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side sign-LSH bucket id of a literal vector (e.g. the ANN
    query vector) — no Spark job needed."""
    b = 0
    for p, plane in enumerate(planes):
        if dot(vec, plane) > 0:
            b |= 1 << p
    return b
