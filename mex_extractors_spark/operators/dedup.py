"""Deduplication operators for training-data pipelines.

The reference deduplicates by key with seen-sets and singleton filters
(SURVEY.md §2.3 F3/F4/F5); a 100 TB corpus additionally needs
content-level dedup. All operators here are DataFrame-native:

- exact:        sha256(text) hash-groupBy — one shuffle, partial agg;
- minhash LSH:  shingle → minhash signature → band → bucket join —
                candidate pairs meet only inside a band bucket, so the
                join never goes quadratic;
- simhash:      64-bit sign fingerprint; near-dups share one of
                max_hamming+1 bit-chunks (pigeonhole guarantee holds
                for ANY requested hamming budget);
- n-gram jaccard: exact pair scoring via explode + equi-join on shared
                shingles (with a document-frequency cutoff so stop-
                shingles don't explode the join).

Everything is expression-only (codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mex_extractors_spark.functions.text import shingles


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents: (text_sha256, dup_count,
    keep_id, dup_ids). ``keep_id`` = min id (deterministic survivor).
    Null texts are excluded — two missing documents are not
    byte-identical, and sha2(null) would group them into one bogus
    duplicate set."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.sha2(F.col(text_col), 256).alias("text_sha256"), F.col(id_col))
        .groupBy("text_sha256")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(F.collect_list(id_col)).alias("dup_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one deterministic survivor (min id) per identical text.
    Null-text rows all pass through (they are not duplicates of each
    other — groupBy/Window would bucket the nulls together)."""
    return (
        df.withColumn("_sha", F.sha2(F.col(text_col), 256))
        .withColumn("_keep", F.min(id_col).over(Window.partitionBy("_sha")))
        .where(F.col(text_col).isNull() | (F.col(id_col) == F.col("_keep")))
        .drop("_sha", "_keep")
    )


# --------------------------------------------------------------- minhash


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(_id, _s): one row per character-k-gram POSITION (duplicates
    included). Explode the position sequence, then take the substring as
    an ordinary projected expression — both stay in whole-stage codegen,
    ~5× faster than building the shingle array with transform() (higher-
    order functions are interpreted per element). The repartition on
    ``_id`` fans a few big input files out across all cores AND pre-
    aligns the downstream per-doc groupBy so Catalyst inserts no second
    exchange."""
    spark = df.sparkSession
    parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        # NULL/empty documents have no k-grams — without this filter
        # they all degenerate to one shared shingle ('' via the
        # greatest(...,1) position floor; NULL via hash null-skipping),
        # land in the SAME bucket of every band, and the candidate join
        # goes quadratic in their count — the exact blow-up banded LSH
        # exists to avoid. They simply have no signature and no
        # candidacy (same contract as exact_duplicates' null handling).
        .where(F.col("_text").isNotNull() & (F.length("_text") > 0))
        .repartition(parallelism, F.col("_id"))
        .select(
            "_id",
            "_text",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("_text") - F.lit(k - 1), F.lit(1))
                )
            ).alias("_i"),
        )
        .select("_id", F.substring(F.col("_text"), F.col("_i"), F.lit(k)).alias("_s"))
    )


def minhash_signature(text_col: str | Column, num_hashes: int = 16, k: int = 5) -> Column:
    """MinHash signature (array<bigint>) over character k-gram shingles.
    Hash family i = xxhash64(i, shingle) — deterministic, seedable."""
    sh = shingles(text_col, k)

    def _minhash(i: int) -> Column:
        # closure (not a default arg): a 2-param lambda would be taken as
        # transform's (element, index) form and clobber the family index
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(F.lit(i), s)))

    return F.array(*[_minhash(i) for i in range(num_hashes)])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 5,
) -> DataFrame:
    """MinHash signatures as columns h0..h{n-1} via explode + hash-agg.

    Explode the shingle array ONCE, then take ``num_hashes`` mins in a
    single codegen'd hash aggregate with map-side partial combine. This
    beats the nested-HOF formulation (array_min over transform) by an
    order of magnitude: Catalyst's projection collapse re-inlines a
    shingle-array expression into every hash family, and HOF lambdas are
    interpreted per element.
    """
    # min over duplicate shingles == min over the distinct set, so the
    # positional explode needs NO per-doc dedup before the aggregate
    ex = _exploded_shingles(df, text_col, id_col, k)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_s"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    return ex.groupBy("_id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    ``bands`` bands of ``num_hashes/bands`` rows; two docs become a
    candidate pair iff some band hashes identically. The band bucket id
    is the shuffle key — never a cross join. Returns (id_a, id_b,
    n_shared_bands) with id_a < id_b.
    """
    # a non-dividing split silently discards signature hashes, and
    # bands > num_hashes degenerates every band to a CONSTANT bucket
    # (rows=0 -> xxhash64(lit(b)) alone) — the all-pairs join this
    # function exists to avoid
    rows = _check_bands(num_hashes, bands)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k)
    banded = sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    _band_hash(
                        b, [F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set jaccard ≥ threshold."""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, k)
    sets_df = (
        _exploded_shingles(df, text_col, id_col, k)
        .groupBy("_id")
        .agg(F.collect_set("_s").alias("_sh"))
    )
    joined = (
        cands.join(sets_df.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "_sa"), "id_a")
        .join(sets_df.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "_sb"), "id_b")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------- incremental near-dup


def _check_bands(num_hashes: int, bands: int) -> int:
    """Validate the band split and return rows-per-band (shared by every
    band-key formulation so the guard can't drift)."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    return num_hashes // bands


def _band_hash(b: int, row_hashes: list[Column]) -> Column:
    """Bucket hash of band ``b`` over its signature rows — THE band
    bucket definition. Every producer (minhash_lsh_candidates,
    minhash_band_terms, banded_lsh_keys) must build buckets through this
    one expression: an index persisted with one formulation is probed
    with another, so drift would be a silent, durable total recall loss."""
    return F.xxhash64(F.lit(b), *row_hashes)


def _band_term(b: int, row_hashes: list[Column]) -> Column:
    """String form ``'band:bucket'`` used as inverted-index terms."""
    return F.concat_ws(":", F.lit(b), _band_hash(b, row_hashes))


def minhash_band_terms(
    text_col: str | Column,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> Column:
    """Band-bucket LSH keys as ``'band:bucket'`` strings — the TERMS of
    a persistent near-dup index: feed this to
    ``lake.index.refresh_inverted_index`` and the corpus's band keys are
    maintained incrementally over the change-data-feed (O(changed docs)
    per refresh) instead of re-LSHing 100 TB per dedup run.

    Row-local HOF formulation (the terms_fn contract is one
    array<string> Column per row) — fine for CDF-diff-sized refresh
    inputs; the batch-side probe uses the explode+agg formulation
    (``banded_lsh_keys``), and both compute identical xxhash64 buckets,
    matching ``minhash_lsh_candidates`` exactly.

    NULL/empty documents get an EMPTY term array — the same no-signature
    contract as ``_exploded_shingles`` (which the explode+agg paths ride):
    degenerate docs otherwise all share one shingle, land in the same
    bucket of every band, and the candidate join goes quadratic in their
    count. Keeping both formulations identical here also keeps full
    builds (bulk path) and CDF diffs (this path) converging to the same
    index — and an update that blanks a doc's text retracts all its old
    band keys (array_except against the empty array)."""
    rows = _check_bands(num_hashes, bands)
    sig = minhash_signature(text_col, num_hashes, k)
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    terms = F.array(
        *[
            _band_term(
                b, [F.element_at(sig, b * rows + r + 1) for r in range(rows)]
            )
            for b in range(bands)
        ]
    )
    return F.when(c.isNotNull() & (F.length(c) > 0), terms).otherwise(
        F.array().cast("array<string>")
    )


def banded_lsh_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """(_id, term) band keys via the fast explode+agg signature path —
    the probe-side counterpart of ``minhash_band_terms`` (same buckets,
    an order of magnitude faster on large batches)."""
    rows = _check_bands(num_hashes, bands)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k)
    return sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    _band_term(
                        b, [F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("term"),
    )


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """(id_col, term) band keys — ``minhash_band_terms``'s bulk
    counterpart for corpus-sized FULL index builds (the
    ``bulk_pairs_fn`` contract of ``lake.index.refresh_inverted_index``):
    same xxhash64 buckets through the fast explode+agg signature path
    instead of the row-local HOF (which recomputes the shingle array
    inside every interpreted lambda — 10x+ slower on a bootstrap and
    the gap widens with corpus size)."""
    return banded_lsh_keys(
        df, text_col, id_col, num_hashes, bands, k
    ).withColumnRenamed("_id", id_col)


def probe_near_duplicates(
    spark,
    index,
    corpus,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Near-duplicates of a NEW batch against an indexed lake corpus,
    without re-LSHing the corpus: batch band keys (explode+agg) →
    equi-join the persistent ``(term, key)`` band index → distinct
    candidate (batch, corpus) pairs → exact k-gram jaccard verify.

    Scale shape: the corpus contributes (a) the index join, keyed on
    ``term`` (the index table's leading key — bucket-aligned), and (b)
    ONE read restricted to candidate docs via a broadcast join before
    any shingling — the corpus is never exploded wholesale. Everything
    that scales with corpus size is index-shaped; everything exploded
    is batch- or candidate-sized. Returns (id_a = batch id, id_b =
    corpus key, jaccard ≥ threshold); identical pairs verify at 1.0.

    ``index`` / ``corpus`` are LakeTables: index keyed
    ``("term", <corpus key>)`` maintained by refresh_inverted_index
    with ``minhash_band_terms``; corpus single-key with ``text_col``.

    Snapshot semantics: this is an ALGORITHM operator (like
    dedup_components) — the candidate set is materialized eagerly AT
    CALL TIME from the index's then-current snapshot, while the verify
    step reads corpus text when the returned frame is acted on. Collect
    the result before refreshing the corpus/index, or pairs would mix
    old-index candidates with new-corpus text.
    """
    if len(corpus.key_cols) != 1:
        # keying ctext on key_cols[0] alone would merge distinct docs'
        # shingle sets — fail loudly like refresh_inverted_index does
        raise ValueError(
            f"probe_near_duplicates needs a single-key corpus "
            f"(got key_cols={list(corpus.key_cols)})"
        )
    ckey = corpus.key_cols[0]
    if list(index.key_cols) != ["term", ckey]:
        raise ValueError(
            f"index table must have key_cols=['term', {ckey!r}] "
            f"(got {list(index.key_cols)})"
        )
    keys = banded_lsh_keys(batch, text_col, id_col, num_hashes, bands, k)
    idx = index.read(spark).select("term", F.col(ckey).alias("_cid"))
    cands = (
        keys.join(idx, "term")
        .select(F.col("_id").alias("_bid"), "_cid")
        .distinct()
        # eager: cands feeds both the broadcast prune and the final join —
        # without this the corpus-scale index join could execute twice if
        # the optimizer defeats exchange reuse (same pattern as
        # dedup_components / stratified_sample_exact for reused frames)
        .localCheckpoint(eager=True)
    )
    bsets = (
        _exploded_shingles(batch, text_col, id_col, k)
        .groupBy("_id")
        .agg(F.collect_set("_s").alias("_sa"))
        .withColumnRenamed("_id", "_bid")
    )
    cand_ids = cands.select("_cid").distinct()
    ctext = (
        corpus.read(spark)
        .select(F.col(ckey).alias("_cid"), F.col(text_col))
        .join(F.broadcast(cand_ids), "_cid")  # shingle ONLY candidate docs
    )
    csets = (
        _exploded_shingles(ctext, text_col, "_cid", k)
        .groupBy("_id")
        .agg(F.collect_set("_s").alias("_sb"))
        .withColumnRenamed("_id", "_cid")
    )
    joined = cands.join(bsets, "_bid").join(csets, "_cid")
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    return joined.select(
        F.col("_bid").alias("id_a"),
        F.col("_cid").alias("id_b"),
        F.round(inter / union, 6).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# --------------------------------------------------------------- simhash


def simhash64(text_col: str | Column, token_hash=None) -> Column:
    """64-bit SimHash over whitespace tokens: bit i is the sign of the
    token-weighted ±1 vote of bit i of each token's hash.

    ``token_hash`` is a Column→Column hash (default ``xxhash64`` — the
    fast production path). Pass ``hashing.md5_long60`` for a hash an
    external DuckDB oracle can reproduce bit-for-bit (60 effective
    bits; the top 4 vote negative and stay unset on both engines).

    NOTE: this is the pure-expression form (64 ``aggregate`` HOF folds
    — interpreted, not codegen'd). Fine for small/ad-hoc frames and
    unit tests; the scaled operator path (:func:`simhash_signatures`,
    used by :func:`simhash_near_duplicates`) computes identical values
    via explode + ONE codegen'd hash aggregate — the same 10×-class
    win documented on :func:`minhash_signatures`."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(F.lower(c)), "\\s+")
    hashes = F.transform(toks, token_hash or (lambda t: F.xxhash64(t)))

    def _vote(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_votes = [_vote(i) for i in range(64)]
    out = F.lit(0).cast("long")
    for i, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return out


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_hash=None,
) -> DataFrame:
    """(_id, _sig) simhash signatures via explode + ONE hash aggregate.

    Tokens are exploded (NOT distinct — simhash weights repeats), each
    token hashed once, and all 64 bit-votes land in a single codegen'd
    grouped aggregate with map-side partial combine. Equivalent to
    ``simhash64`` but the hash runs once per token instead of being
    re-evaluated inside 64 interpreted HOF folds."""
    spark = df.sparkSession
    parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    c = F.col(text_col)
    toks = F.split(F.trim(F.lower(c)), "\\s+")
    ex = (
        # NULL/blank documents tokenize to nothing (or the single ''
        # token) — every such doc would share one signature and pair
        # with every other in each chunk bucket, the quadratic blow-up
        # the bucketing exists to avoid; they get no signature instead
        # (same contract as the minhash shingle path)
        df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
        .select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .repartition(parallelism, F.col("_id"))  # fan out big input files
        .select("_id", F.explode("_toks").alias("_tok"))
    )
    hash_fn = token_hash or (lambda t: F.xxhash64(t))
    # materialize the token hash in a projection so the (possibly
    # md5-backed) hash runs once per token, not once per bit-vote
    hashed = ex.select("_id", hash_fn(F.col("_tok")).alias("_h"))
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = hashed.groupBy("_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig + F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(0)
    return agg.select("_id", sig.alias("_sig"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    token_hash=None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, found by
    pigeonhole chunk bucketing: split the 64 signature bits into
    ``max_hamming + 1`` chunks — a pair within the hamming budget has
    fewer differing bits than chunks, so (pigeonhole) it must agree on
    ≥1 whole chunk and the candidate join is an equi-join on
    (chunk_index, chunk_value). Chunk count is DERIVED from the budget:
    4×16-bit chunks only ever guarantee hamming ≤ 3, so a caller asking
    for 6 gets 7 chunks, never silent recall loss."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    base, rem = divmod(64, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    offsets = [sum(widths[:j]) for j in range(n_chunks)]
    with_sig = simhash_signatures(df, text_col, id_col, token_hash)
    chunked = with_sig.select(
        "_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_sig"), offsets[j]).bitwiseAND(
                        # width 64 (max_hamming=0, one chunk) → all-ones long
                        F.lit(((1 << widths[j]) - 1) if widths[j] < 64 else -1)
                    )
                    for j in range(n_chunks)
                ]
            )
        ).alias("_chunk_idx", "_chunk"),
    )
    l, r = chunked.alias("l"), chunked.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l._chunk_idx") == F.col("r._chunk_idx"))
            & (F.col("l._chunk") == F.col("r._chunk"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sig").alias("_siga"),
            F.col("r._sig").alias("_sigb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_siga").bitwiseXOR(F.col("_sigb")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------- exact n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact jaccard over distinct k-gram sets for every pair sharing at
    least one (non-stop) shingle, via an INVERTED INDEX: group doc
    postings per shingle, emit each posting list's id pairs, count
    shared shingles per pair. Two shuffles total (postings, pair agg) —
    no self-join, and the ``max_shingle_df`` stop-shingle guard is a
    free ``size(postings)`` filter instead of a separate document-
    frequency job + anti-join. The guard is ALSO the memory bound: a
    posting list never exceeds max_shingle_df entries, so the per-group
    pair fan-out is ≤ C(max_df, 2) regardless of corpus size."""
    # per-doc distinct via collect_set — rides the _exploded_shingles
    # repartition(_id), so this aggregate plans NO exchange of its own
    sets_df = (
        _exploded_shingles(df, text_col, id_col, k)
        .groupBy("_id")
        .agg(F.collect_set("_s").alias("_sh"))
    )
    exploded = sets_df.select("_id", F.explode("_sh").alias("_s"))
    if max_shingle_df is not None:
        # stop-shingles leave the UNIVERSE, not just the intersection:
        # per-doc sizes below are counted over the same filtered shingle
        # space the intersections use, so jaccard stays a true
        # |A∩B| / |A∪B| of that space (counting stop-shingles in the
        # sizes but not the intersections would systematically
        # underestimate similarity of genuinely near-duplicate pairs)
        grp = exploded.groupBy("_s").agg(F.collect_list("_id").alias("_ids"))
        exploded = (
            grp.where(F.size("_ids") <= max_shingle_df)
            .select(F.explode("_ids").alias("_id"), "_s")
        )
    sizes = exploded.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    postings = (
        exploded.join(sizes, "_id")
        .groupBy("_s")
        .agg(F.collect_list(F.struct("_id", "_n")).alias("_docs"))
        .where(F.size("_docs") >= 2)
    )
    # pair fan-out: double explode + a<b filter stays in whole-stage
    # codegen (no HOF lambdas — those are interpreted row-at-a-time)
    shared = (
        postings.select(F.explode("_docs").alias("_a"), "_docs")
        .select("_a", F.explode("_docs").alias("_b"))
        .where(F.col("_a._id") < F.col("_b._id"))
        .groupBy(
            F.col("_a._id").alias("id_a"),
            F.col("_b._id").alias("id_b"),
            F.col("_a._n").alias("_na"),
            F.col("_b._n").alias("_nb"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    jac = F.round(F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")), 6)
    out = shared.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )
    return out


# plain neighbor-min rounds before pointer doubling engages: covers
# diameter-3 components (the common case) at one join per round; a
# still-moving graph after this switches to the O(log diameter) regime
_DOUBLING_AFTER = 3


def dedup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    survivor-selection step after any pairwise dedup (d1-d5): every doc
    gets a ``component_id`` = the smallest doc id reachable through
    duplicate edges, so ``component_id == doc_id`` marks the canonical
    survivor and everything else in the component is droppable.

    Iterative min-label propagation with ADAPTIVE pointer doubling:
    each round every vertex takes the min of its own label and its
    neighbors' labels (one join + one groupBy-min). Real near-dup
    components are small and dense, so that alone converges in a few
    rounds at one join each; if the graph is still moving after
    ``_DOUBLING_AFTER`` rounds (a long chain / large-diameter
    component), every later round ALSO jumps through the vertex's own
    label (``lbl(v) := min(lbl(v), lbl(lbl(v)))`` — the doubling step
    of Shiloach-Vishkin / the large-star contraction in the "Connected
    Components in MapReduce" pattern), making the remaining rounds
    O(log diameter) instead of O(diameter): a pathological 10^6-long
    duplicate chain converges inside the default 20-round cap. Each
    round's shuffle is sized by the EDGE list (plus, when doubling, one
    self-join on the vertex list), never the corpus squared.

    Every round's frontier is truncated with an eager
    ``localCheckpoint`` — the canonical iterative-plan pattern (what
    GraphFrames does): a mere ``persist`` is not enough, because the
    early-exit convergence probe (``limit(1)``) materializes only SOME
    cached partitions and the next round then recomputes the missing
    ones through the whole unpersisted lineage chain — exponential
    recompute that OOMs after ~7 rounds even on a 12-vertex graph.

    Singleton docs (no duplicate edges) keep their own id as the
    component, so the output covers the full corpus.
    """
    edges = (
        pairs.select(F.col(id_a).alias("_s"), F.col(id_b).alias("_d"))
        .unionByName(pairs.select(F.col(id_b).alias("_s"), F.col(id_a).alias("_d")))
        .localCheckpoint(eager=True)
    )
    labels = docs.select(
        F.col(id_col).alias("_v"), F.col(id_col).alias("_lbl")
    ).localCheckpoint(eager=True)
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["_d"] == labels["_v"])
            .groupBy("_s")
            .agg(F.min("_lbl").alias("_nlbl"))
        )
        hopped = (
            labels.join(neighbor_min, labels["_v"] == neighbor_min["_s"], "left")
            .select("_v", F.least(F.col("_lbl"), F.col("_nlbl")).alias("_lbl"))
        )
        if it >= _DOUBLING_AFTER:
            # pointer doubling: follow the label one more hop so chain
            # distance halves per round (labels are always vertex ids of
            # the same component, so the inner self-join always matches)
            target = hopped.select(
                F.col("_v").alias("_t_v"), F.col("_lbl").alias("_t_lbl")
            )
            hopped = hopped.join(target, hopped["_lbl"] == target["_t_v"]).select(
                "_v", F.least(F.col("_lbl"), F.col("_t_lbl")).alias("_lbl")
            )
        new_labels = hopped.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n._v") == F.col("o._v"))
            .where(F.col("n._lbl") != F.col("o._lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels  # prior checkpoint blocks are GC-reclaimed
        if changed == 0:
            break
    else:
        # silent non-convergence would return WRONG components (a chain
        # longer than max_iterations keeps stale labels at its far end,
        # so one duplicate cluster yields several "canonical" survivors)
        raise RuntimeError(
            f"label propagation did not converge in {max_iterations} "
            "iterations — with pointer doubling rounds ~ log2(diameter), "
            "so this needs a graph of diameter > 2^{max_iterations}; "
            "raise max_iterations"
        )
    return labels.select(F.col("_v").alias(id_col), F.col("_lbl").alias("component_id"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    min_matches: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at
    least ``min_matches`` DISTINCT character ``k``-gram shingles with
    any benchmark/eval document — the training-data decontamination
    step of large-corpus pipelines (beyond the reference; companion to
    the dedup family, SURVEY.md §2 extension list).

    Scale shape: the benchmark side reduces to a DISTINCT shingle set
    and is broadcast (eval suites are tiny next to a 100 TB corpus), so
    corpus rows never shuffle for the membership test; corpus shingles
    explode once through codegen (position explode + substring, see
    ``_exploded_shingles``) and the per-doc distinct-match count is ONE
    hash aggregate with map-side partial dedup. No doc×doc join
    anywhere.

    Returns ``(id_col, matched_shingles)`` for contaminated documents.
    """
    bench_sh = (
        _exploded_shingles(benchmark, text_col, id_col, k).select("_s").distinct()
    )
    corpus_sh = _exploded_shingles(corpus, text_col, id_col, k)
    return (
        corpus_sh.join(F.broadcast(bench_sh), on="_s", how="inner")
        .groupBy("_id")
        .agg(F.count_distinct("_s").alias("matched_shingles"))
        .where(F.col("matched_shingles") >= min_matches)
        .select(F.col("_id").alias(id_col), "matched_shingles")
    )
