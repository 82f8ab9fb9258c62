"""Event-time windowed streaming operators (SURVEY.md §2.9 T5).

The reference has no event-time semantics (duplicates/late data are
handled by the LWW kernel), but a training-data ingest pipeline needs
windowed rollups over the change stream — batch/stream-symmetric here:
each function takes any DataFrame (static or streaming); on a streaming
input the watermark bounds state and drops data later than
``late_threshold``.

Stateful custom aggregation uses ``applyInPandasWithState`` — the
sanctioned vectorized path for operators Spark's built-ins can't
express (running per-key cumulative state across micro-batches).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    late_threshold: str = "10 minutes",
) -> DataFrame:
    """Per-key tumbling-window event counts with a watermark.

    On a stream: state for a window is dropped once the watermark passes
    its end + ``late_threshold``; later events are discarded (bounded
    state at 10^10-event scale). On a static frame the same plan is an
    ordinary grouped aggregate.
    """
    src = df.withWatermark(ts_col, late_threshold) if df.isStreaming else df
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def sliding_rates(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    late_threshold: str = "10 minutes",
) -> DataFrame:
    """Sliding-window global event rate (events per window)."""
    src = df.withWatermark(ts_col, late_threshold) if df.isStreaming else df
    return (
        src.groupBy(F.window(F.col(ts_col), window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    late_threshold: str = "10 minutes",
) -> DataFrame:
    """Session windows: events of a key closer than ``gap`` coalesce into
    one session (F.session_window — native, stateful on streams)."""
    src = df.withWatermark(ts_col, late_threshold) if df.isStreaming else df
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


# --------------------------------------------------- custom stateful op

RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("max_seq", LongType())]
)
RUNNING_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("batch_events", LongType()),
        StructField("total_events", LongType()),
        StructField("max_seq", LongType()),
    ]
)


# stands in for NULL seq inside the Arrow batches (see _running_totals_fn);
# a genuine seq of exactly -2^63 is indistinguishable from NULL — an
# acceptable corner for a watermark that only ever ratchets upward
_NULL_SEQ_SENTINEL = -(2**63)


def _running_totals_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    """Vectorized per-key running totals across micro-batches: the shape
    of any custom accumulating operator (dedup counters, per-repo quota
    enforcement) that outlives a single batch."""
    n, max_seq = state.get if state.exists else (0, None)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        # NULL seqs arrive as the wrapper's int64 sentinel, NOT NaN: a
        # nullable long column converts Arrow->pandas as float64, and a
        # 64-bit seq above 2^53 (a real CDC LSN) would silently round —
        # a watermark the stream never observed. The sentinel keeps the
        # column int64 end-to-end; rows at the sentinel count as events
        # but carry no watermark, and the watermark bootstraps as None,
        # not 0 — a key whose seqs are all negative must not report a
        # high watermark it never observed.
        if len(pdf):
            m = int(pdf["seq"].max())
            if m != _NULL_SEQ_SENTINEL:
                max_seq = m if max_seq is None else max(max_seq, m)
    n += batch_n
    state.update((n, max_seq))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "batch_events": [batch_n],
            "total_events": [n],
            "max_seq": [max_seq],
        }
    )


def running_totals(
    df: DataFrame,
    key_col: str = "repo",
    seq_col: str = "seq",
) -> DataFrame:
    """applyInPandasWithState wrapper: per-key event totals + high
    watermark maintained as stream state (Arrow-batched, no per-row
    Python). Works only on streaming DataFrames."""
    # the output schema declares key:string — cast so a numeric key
    # column works instead of dying in Arrow conversion mid-stream
    # NULL seqs become an int64 sentinel BEFORE the Arrow boundary: a
    # column with nulls reaches pandas as float64, where seqs above
    # 2^53 lose precision and corrupt the persisted watermark
    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.coalesce(
            F.col(seq_col).cast("long"), F.lit(_NULL_SEQ_SENTINEL).cast("long")
        ).alias("seq"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_OUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
