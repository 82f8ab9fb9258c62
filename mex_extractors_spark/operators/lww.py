"""Last-writer-wins reduction — the CDC merge kernel.

The reference deduplicates first-wins with a Python ``seen`` set in input
order (mex/extractors/seq_repo/transform.py:129-136,
mex/extractors/synopse/transform.py:276-289). Inverted to
last-writer-wins by commit sequence, this is the merge law of the whole
engine (SURVEY.md §2.3 F4 / §2.6 W1).

Three strategies, all semantically identical:

``lww_latest``      — declarative ``max_by(struct(*), seq)`` aggregate.
                      Catalyst plans it with a PARTIAL (map-side) combine
                      phase (``partial_max_by`` before the single
                      exchange; SortAggregate because the struct buffer
                      is not UnsafeRow-mutable), so a hot (repo,path) key
                      is pre-reduced on every input partition before the
                      one shuffle. This is the default: the skew-defusing
                      two-phase reduce falls out of the engine for free.
``lww_latest_window`` — row_number over a key window. One shuffle, no
                      partial aggregation: every row of a hot key lands
                      on one task. Kept for plan comparison and because
                      the rank variant generalizes (top-k history).
``lww_latest_salted`` — explicit two-phase salted reduce for engines/
                      plans where max_by partials are unavailable:
                      reduce per (key, salt), then per key. Documents the
                      north-rule skew handling in code.

Ties on ``seq`` can only be duplicate deliveries of the same event
(``seq`` is a strictly-increasing global commit sequence), so any winner
is byte-identical — all three strategies are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_latest(
    df: DataFrame,
    key_cols: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
) -> DataFrame:
    """Latest row per key by ``seq`` via max_by — partial-agg friendly."""
    others = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(seq_col)).alias("_w")
    )
    return packed.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in others])


def lww_latest_window(
    df: DataFrame,
    key_cols: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
) -> DataFrame:
    """Latest row per key via row_number window (no map-side combine)."""
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def lww_latest_salted(
    df: DataFrame,
    key_cols: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
    salt_buckets: int = 16,
) -> DataFrame:
    """Explicit two-phase skew-safe reduce (SURVEY.md §4.2).

    Phase 1 shuffles on (key, salt) so a hot key spreads over
    ``salt_buckets`` tasks; phase 2 reduces the ≤``salt_buckets``
    survivors per key. Salt is derived from ``seq`` so it is
    deterministic and uniform within a key.
    """
    others = [c for c in df.columns if c not in key_cols]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(seq_col)).alias("_w")
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        F.max_by(F.col("_w"), F.col(f"_w.{seq_col}")).alias("_w")
    )
    return phase2.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in others])


def apply_deletes(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Drop tombstone winners: a key whose latest event is a delete
    leaves the table (resurrection = a later I/U wins again)."""
    return df.where(F.col(op_col) != "D")
