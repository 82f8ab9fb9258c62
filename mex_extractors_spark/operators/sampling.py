"""Corpus curation operators: PII redaction, deterministic sampling,
token-budget shard packing.

Training-data pipelines need reproducibility above all: a re-run over
100 TB must redact, sample, and shard IDENTICALLY, or downstream
dedup/decontamination stops composing. Everything here is therefore
expression-only (whole-stage codegen) and seed-free-deterministic —
sampling hashes the stable document id instead of drawing randoms, and
shard assignment is a pure function of (id order, token budget).
Reference analog: the per-source regex scrubbing loops (SURVEY.md §2.8
C2/C6) and the deterministic artificial-data discipline
(mex/extractors/artificial/main.py:22-33, seed=42).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# portable regexes: Java regex (Spark) and RE2 (DuckDB) agree on these
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
LONG_NUMBER_RE = "[0-9]{9,}"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: str | Column) -> Column:
    """Replace emails, IPv4 addresses, and long digit runs (phone/card
    numbers) with typed placeholders. Order matters: emails first (an
    address may contain digits), then dotted IPs, then bare digit runs.
    Pure regexp_replace chain — codegen'd, and byte-identical to the
    DuckDB oracle's `regexp_replace(..., 'g')`."""
    c = _c(col)
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, LONG_NUMBER_RE, "<NUM>")


def hash_sample_keep(col: str | Column, keep_below_hex: str) -> Column:
    """Deterministic sampling predicate: keep a row when the md5-hex
    prefix of its id sorts below ``keep_below_hex``. md5 is uniform, so
    a k-hex-digit cutoff keeps ≈ int(cutoff,16)/16^k of the corpus —
    '28' keeps ≈ 40/256 ≈ 15.6%. Unlike rand(seed), the decision is a
    pure function of the id: stable across re-runs, partitionings,
    engines (the oracle states the identical predicate), and corpus
    growth (a doc's fate never changes when neighbors arrive)."""
    cutoff = keep_below_hex.lower()
    if not cutoff or any(ch not in "0123456789abcdef" for ch in cutoff):
        raise ValueError(f"keep_below_hex must be non-empty hex: {keep_below_hex!r}")
    return F.substring(F.md5(_c(col).cast("string")), 1, len(cutoff)) < F.lit(cutoff)


def hash_sample(df: DataFrame, id_col: str, keep_below_hex: str) -> DataFrame:
    return df.where(hash_sample_keep(id_col, keep_below_hex))


def pack_shards(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    budget: int,
    range_width: int = 100_000,
) -> DataFrame:
    """Assign each document to a training shard by cumulative cost
    (tokens/chars) in deterministic ``id_col`` order: shard boundaries
    fall every ``budget`` cost units, shard = floor(exclusive_cumsum /
    budget). Equivalent to `SUM(cost) OVER (ORDER BY id)` — but a
    global-order window is a single-partition sort that dies at 100 TB,
    so this computes the distributed prefix sum instead:

    1. deterministic range bucket ``_rb = floor(id / range_width)``
       (order-preserving, no sampling — unlike repartitionByRange);
    2. per-bucket local cumsum (window partitioned BY bucket — a real
       parallel window, one shuffle on _rb);
    3. per-bucket totals (tiny: one row per bucket) get an exclusive
       global prefix via a window over ~n_buckets rows, broadcast back.

    The only single-partition work is step 3 over num_buckets rows.
    Requires a non-negative numeric id; pick ``range_width`` so buckets
    are large enough to amortize the shuffle and small enough to
    parallelize (corpus_size / ~10×parallelism)."""
    if budget <= 0 or range_width <= 0:
        raise ValueError("budget and range_width must be positive")
    idc, cost = F.col(id_col), F.col(cost_col)
    rb = F.floor(idc / F.lit(range_width)).alias("_rb")
    local = df.withColumn("_rb", rb)
    w_local = (
        Window.partitionBy("_rb")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive global offset of each bucket: cumsum of the totals of
    # all PRIOR buckets (n_buckets rows — the only global-order sort)
    w_prior = (
        Window.orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_rb")
        .agg(F.sum(cost).alias("_rb_total"))
        .withColumn("_off", F.coalesce(F.sum("_rb_total").over(w_prior), F.lit(0)))
        .select("_rb", "_off")
    )
    cum = F.col("_off") + F.sum(cost).over(w_local)
    return (
        local.join(F.broadcast(offsets), on="_rb")
        .withColumn(
            "shard",
            F.floor((cum - cost) / F.lit(float(budget))).cast("long"),
        )
        .drop("_rb", "_off")
    )
