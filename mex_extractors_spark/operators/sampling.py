"""Corpus curation operators: PII redaction, deterministic sampling,
exact-quota stratified sampling, vocabulary building, token-budget
shard packing.

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

# portable regexes: Java regex (Spark) and RE2 (DuckDB) agree on these.
# EMAIL also matches an IPv4 HOST (john@10.0.0.1) — otherwise the IP
# pass would leave the identifying local part behind as "john@<IP>".
# LONG_NUMBER allows single space/dot/dash separators between digits so
# formatted phone/card numbers ("4111 1111 1111 1111", "555-123-4567")
# redact too; 9+ digits total keeps dates ("2026-08-21", 8 digits) out.
EMAIL_RE = (
    "[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    "|([0-9]{1,3}\\.){3}[0-9]{1,3})"
)
IPV4_RE = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
LONG_NUMBER_RE = "[0-9]([ .-]?[0-9]){8,}"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _check_reserved(df: DataFrame, names: "tuple[str, ...]", op: str) -> None:
    """Internal working columns are added with withColumn and dropped at
    the end — a same-named user column would be silently REPLACED and
    then deleted from the output. Fail loudly instead."""
    clash = set(names) & set(df.columns)
    if clash:
        raise ValueError(
            f"{op}: input columns {sorted(clash)} collide with internal "
            "working columns — rename them first"
        )


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


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quota: int | dict[str, int],
    margin: float = 4.0,
) -> DataFrame:
    """Exactly ``quota`` rows per stratum (or the whole stratum when it
    has fewer), selected deterministically as the first ``quota`` ids in
    md5-hash order — the stratified analog of hash_sample, with the same
    reproducibility contract: a document's fate is a pure function of
    its id, never of partitioning, corpus growth, or a seed.

    ``quota`` may be a per-stratum dict (the corpus_mix building block):
    strata absent from the dict are excluded entirely, and — since a map
    literal cannot key NULL — dict mode ignores NULL-stratum rows; use
    the uniform-int mode when NULL must be sampled as its own stratum.

    The naive plan — ``row_number() OVER (PARTITION BY stratum ORDER BY
    md5(id))`` over the full corpus — shuffles and sorts ALL 100 TB to
    keep a few thousand rows. Instead:

    1. one aggregate pass counts each stratum (tiny result, broadcast,
       eagerly localCheckpoint-ed so no later plan rescans for it);
    2. a second pass keeps rows whose 8-hex-digit md5 prefix falls below
       ``margin * quota / n`` — a superset of the winners, ~margin*quota
       rows per stratum, because prefix order is consistent with full
       md5 order (ties at the cut always sort AFTER strict-below rows);
       the surviving sliver is localCheckpoint-ed too;
    3. strata whose prefilter came up short (a binomial tail event at
       margin=4, but exactness is the contract, not a probability) are
       detected from the two tiny checkpoints; ONLY when one exists does
       a third corpus pass pull that stratum's full row set — the common
       case is exactly two scans;
    4. the rank window runs over the surviving ~margin*quota*strata
       rows only.

    NULL is a stratum like any other (all joins are null-safe), matching
    the naive window's NULL partition. Rows with a NULL **id** are
    dropped upfront: md5(NULL) is NULL, so they have no position in
    hash order — keeping them would make a row's fate depend on whether
    its stratum hit the fallback path (prefilter excludes them, the
    all-rows fallback would not), breaking both the pure-function-of-id
    contract and the naive-window oracle equivalence. The two eager
    checkpoints make this an algorithm operator (it runs jobs when
    invoked), like dedup_components — not a lazily-composable view. The
    oracle can state the selection as the naive window (over non-NULL
    ids) because the prefilter is result-invariant.
    """
    if margin <= 1.0:
        raise ValueError("margin must be > 1")
    _check_reserved(
        df,
        ("_frac", "_stratum", "_n", "_q", "_thresh", "_cs", "_c", "_ss", "_rk"),
        "stratified_sample_exact",
    )
    df = df.where(_c(id_col).isNotNull())
    skey = _c(stratum_col)
    if isinstance(quota, dict):
        if not quota or any(v <= 0 for v in quota.values()):
            raise ValueError("per-stratum quotas must be a non-empty dict of > 0")
        df = df.where(skey.isin(list(quota)))
        qmap = F.create_map(
            *[F.lit(x) for kv in quota.items() for x in kv]
        )
        q_of = lambda stratum: F.element_at(qmap, stratum)  # noqa: E731
    else:
        if quota <= 0:
            raise ValueError("quota must be positive")
        q_of = lambda stratum: F.lit(quota)  # noqa: E731
    idc = _c(id_col).cast("string")
    frac = F.conv(F.substring(F.md5(idc), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    src = df.withColumn("_frac", frac)
    counts = (
        src.groupBy(skey.alias("_stratum"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_q", q_of(F.col("_stratum")))
        .withColumn(
            "_thresh",
            F.least(F.lit(1.01), F.lit(float(margin)) * F.col("_q") / F.col("_n")),
        )
        .localCheckpoint(eager=True)  # scan 1 of the corpus, runs now
    )
    cand = (
        src.join(F.broadcast(counts), on=skey.eqNullSafe(F.col("_stratum")))
        .where(F.col("_frac") < F.col("_thresh"))
        .localCheckpoint(eager=True)  # scan 2, runs now; ~margin*quota*strata rows
    )
    # left join FROM counts: a stratum with ZERO prefilter survivors has
    # no candidate row at all and must still be flagged short
    cand_counts = cand.groupBy(F.col("_stratum").alias("_cs")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    short = (
        counts.join(
            cand_counts, on=F.col("_stratum").eqNullSafe(F.col("_cs")), how="left"
        )
        .where(
            F.coalesce(F.col("_c"), F.lit(0)) < F.least(F.col("_q"), F.col("_n"))
        )
        .select(F.col("_stratum").alias("_ss"))
    )
    pool_cols = [*df.columns, "_frac", "_stratum", "_q"]
    pool = cand.select(*pool_cols)
    if short.limit(1).count():  # tiny: both inputs are checkpointed
        # rare third corpus pass: short strata contribute ALL their rows
        # (replacing, via anti-join, the partial slice cand held for them)
        fallback = (
            src.join(F.broadcast(short), on=skey.eqNullSafe(F.col("_ss")))
            .withColumn("_stratum", F.col("_ss"))
            .withColumn("_q", q_of(F.col("_ss")))
            .select(*pool_cols)
        )
        pool = pool.join(
            F.broadcast(short),
            on=F.col("_stratum").eqNullSafe(F.col("_ss")),
            how="left_anti",
        ).unionByName(fallback)
    w = Window.partitionBy("_stratum").orderBy(F.md5(idc), _c(id_col))
    return (
        pool.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.col("_q"))
        .drop("_frac", "_stratum", "_q", "_rk")
    )


def corpus_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    target_rows: int,
    margin: float = 4.0,
) -> DataFrame:
    """Training-data mixture sampling: split a ``target_rows`` budget
    across sources by weight (the 'books 2×, web 1×' recipe every LLM
    data pipeline encodes), then take each source's allocation
    deterministically in md5(id) order. A source smaller than its
    allocation contributes everything it has (capped, not re-balanced —
    re-balancing would make every document's fate depend on OTHER
    sources' sizes, breaking the pure-function-of-id reproducibility
    contract). Sources absent from ``weights`` are excluded.

    Allocations are largest-remainder rounded so they sum to exactly
    ``target_rows`` (when every source is large enough). The selection
    itself is stratified_sample_exact with per-source quotas — same
    two-scan plan, same naive-window oracle form.
    """
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of > 0")
    total = float(sum(weights.values()))
    raw = {s: target_rows * w / total for s, w in weights.items()}
    alloc = {s: int(v) for s, v in raw.items()}
    leftover = target_rows - sum(alloc.values())
    # largest remainder, ties broken by source name for determinism
    for s in sorted(raw, key=lambda s: (-(raw[s] - alloc[s]), s))[:leftover]:
        alloc[s] += 1
    quotas = {s: q for s, q in alloc.items() if q > 0}
    if not quotas:
        raise ValueError("target_rows too small: every allocation rounded to 0")
    return stratified_sample_exact(df, source_col, id_col, quotas, margin=margin)


# portable tokenizer: Java regex (Spark) and RE2 (DuckDB) agree on this
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def vocab_build(
    docs: DataFrame,
    text_col: str,
    doc_id_col: str,
    n_docs: int,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    top_k: int = 1000,
    ngram: int = 1,
) -> DataFrame:
    """Corpus vocabulary for tokenizer/BPE training: lowercase, split on
    non-alphanumerics (``ngram=2`` counts adjacent pairs — the unit a
    BPE merge step ranks), then per-token term frequency (tf) and
    document frequency (df); keep tokens inside the df band [min_df,
    max_df_frac * n_docs] (drop hapaxes and stop-word-like ubiquity) and
    return the top_k by tf with a total (tf desc, token) order.

    Scale shape: explode → groupBy(token) rides map-side partial
    aggregation, which pre-collapses the zipf head on each partition
    before the one shuffle; df = count_distinct(doc_id) is the standard
    two-phase distinct expansion; the final orderBy+limit compiles to
    TakeOrdered (per-partition top-k, no global sort). ``n_docs`` is a
    caller-supplied scalar (one count aggregate) so the plan stays a
    single pipeline. Bigrams use zip_with over two shifted slices (the
    bigram_array idiom — per-element element_at would re-split the text
    per bigram).
    """
    if min_df < 1 or not 0 < max_df_frac <= 1 or top_k <= 0:
        raise ValueError("min_df >= 1, 0 < max_df_frac <= 1, top_k > 0 required")
    arr = F.filter(
        F.split(F.lower(_c(text_col)), TOKEN_SPLIT_RE), lambda t: t != ""
    )
    if ngram == 1:
        unit = F.explode(arr)
    elif ngram == 2:
        n = F.size(arr)
        unit = F.explode(
            F.when(n < 2, F.array().cast("array<string>")).otherwise(
                F.zip_with(
                    F.slice(arr, 1, n - 1),
                    F.slice(arr, 2, n - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            )
        )
    else:
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    toks = docs.select(_c(doc_id_col).alias("_doc"), unit.alias("token"))
    stats = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("_doc").alias("df"),
    )
    return (
        stats.where(
            (F.col("df") >= min_df) & (F.col("df") <= float(max_df_frac) * n_docs)
        )
        .orderBy(F.desc("tf"), "token")
        .limit(top_k)
    )


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
    if budget <= 0:
        raise ValueError("budget must be positive")
    return (
        _exclusive_prefix_sum(df, id_col, cost_col, range_width)
        .withColumn(
            "shard",
            F.floor(F.col("_cum0") / F.lit(float(budget))).cast("long"),
        )
        .drop("_cum0")
    )


def _exclusive_prefix_sum(
    df: DataFrame, id_col: str, cost_col: str, range_width: int
) -> DataFrame:
    """``_cum0`` = sum of ``cost_col`` over all rows strictly before
    this one in ``id_col`` order — the distributed prefix-sum kernel
    shared by pack_shards / pack_sequences (steps 1-3 of the pack_shards
    docstring; only per-range-bucket totals ever see a global sort)."""
    if range_width <= 0:
        raise ValueError("range_width must be positive")
    _check_reserved(df, ("_rb", "_off", "_cum0"), "prefix_sum")
    idc = F.col(id_col)
    # a NULL or negative cost corrupts every LATER row's offset (and a
    # NULL poisons the whole running sum) — the docstring contracts
    # ("zero-cost documents get n_seqs = 0") assume costs >= 0, so
    # enforce it in the plan: a pure per-row expression, codegen'd, that
    # fails the job loudly instead of emitting overlapping shards
    raw_cost = F.col(cost_col)
    cost = F.when(
        raw_cost.isNull() | (raw_cost < 0),
        F.raise_error(
            F.concat(
                F.lit(f"prefix_sum: NULL or negative {cost_col} ("),
                F.coalesce(raw_cost.cast("string"), F.lit("NULL")),
                F.lit(") — costs must be >= 0"),
            )
        ),
    ).otherwise(raw_cost)
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
    # _cum0 keeps the SOURCE numeric type: pack_shards divides the
    # untruncated sum (fractional cost columns are legal there);
    # pack_sequences casts to long itself, where costs are token counts
    return (
        local.join(F.broadcast(offsets), on="_rb")
        .withColumn("_cum0", cum - cost)
        .drop("_rb", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    seq_len: int,
    range_width: int = 100_000,
) -> DataFrame:
    """GPT-pretraining sequence packing (concat-and-chunk): the corpus
    is one logical token stream in deterministic ``id_col`` order,
    chunked into fixed ``seq_len`` training sequences; documents may
    straddle chunk boundaries (the standard causal-LM packing, distinct
    from ``pack_shards``' no-split shard assignment). Adds per document:

    - ``token_start``  — exclusive prefix sum of ``cost_col`` (global
      stream offset of the document's first token);
    - ``seq_first`` / ``seq_last`` — ids of the training sequences the
      document lands in (floor(start / L), floor((start+cost-1) / L));
    - ``seq_offset``  — position within ``seq_first`` (start % L);
    - ``n_seqs``      — how many sequences it spans.

    Zero-cost documents contribute nothing to the stream: they get
    ``n_seqs = 0`` and NULL sequence ids rather than a phantom slot.
    Same scale shape as pack_shards — the shared distributed prefix sum
    is the only shuffle; everything after is arithmetic."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    out = _exclusive_prefix_sum(df, id_col, cost_col, range_width)
    start, cost = F.col("_cum0").cast("long"), F.col(cost_col)
    seq_first = F.floor(start / F.lit(float(seq_len))).cast("long")
    seq_last = F.floor((start + cost - 1) / F.lit(float(seq_len))).cast("long")
    empty = cost <= 0
    return (
        out.withColumn("token_start", start)
        .withColumn("seq_first", F.when(~empty, seq_first))
        .withColumn("seq_last", F.when(~empty, seq_last))
        .withColumn(
            "seq_offset", F.when(~empty, F.pmod(start, F.lit(seq_len)).cast("long"))
        )
        .withColumn(
            "n_seqs",
            F.when(empty, F.lit(0)).otherwise(seq_last - seq_first + 1).cast("long"),
        )
        .drop("_cum0")
    )
