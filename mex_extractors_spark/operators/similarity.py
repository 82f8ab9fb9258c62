"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one pass, expression-only dot
product via ``zip_with`` + ``aggregate``. Scale paths:

- sign-LSH (random hyperplanes): hash each vector to an h-bit bucket
  using deterministic seeded pseudo-random planes (components derived
  from xxhash64 — no driver-side randomness, cluster-reproducible);
  query probes only its bucket (+ optional multi-probe neighbors);
- IVF-style coarse quantization: c deterministic centroids sampled by
  hash, every vector assigned to its nearest centroid (broadcast join —
  centroids are tiny), query scans only the top-nprobe nearest lists.

At 100 TB the bucketed variants turn a full-corpus scan into a
partition-pruned scan keyed by bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mex_extractors_spark.functions import hashing


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide, not '/': the session runs with ANSI on (Spark 4
    # default), where a zero-norm vector — zero/padding embeddings
    # occur in real corpora — would throw DIVIDE_BY_ZERO and kill the
    # whole job. Undefined similarity is NULL instead, which sorts
    # after every real score in the desc top-k orderings
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity to a literal query
    vector. Map-side score + global top-k (TakeOrdered — no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def sign_lsh_bucket(vec_col: str | Column, num_planes: int = 8, dim: int = 64, seed: int = 42) -> Column:
    """h-bit sign-LSH bucket id. Planes are computed ONCE on the driver
    (pure-Python md5 PRNG, ``hashing.lsh_planes``) and embedded as
    literal arrays, so every executor sees identical planes with zero
    per-row hash work — and an external oracle can embed the exact same
    constants to reproduce the bucketing bit-for-bit."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = hashing.lsh_planes(num_planes, dim, seed)

    def _proj(plane: list[float]) -> Column:
        lit_plane = F.array(*[F.lit(w) for w in plane])
        return F.aggregate(
            F.zip_with(v, lit_plane, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket + F.when(
            _proj(planes[p]) > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(0)
    return bucket


def derive_num_planes(corpus_size: int, target_bucket_size: int = 64) -> int:
    """Corpus-size-driven plane count: enough sign bits that the
    EXPECTED bucket occupancy is ~``target_bucket_size`` rows, so the
    within-bucket pair join stays ~n·target instead of n²/2^planes with
    a fixed small plane count. Clamped to [4, 24]."""
    import math

    if corpus_size <= target_bucket_size:
        return 4
    return max(4, min(24, math.ceil(math.log2(corpus_size / target_bucket_size))))


def derive_ivf_params(corpus_size: int, recall_target: float = 0.9) -> tuple[int, int]:
    """Corpus-size-driven IVF defaults ``(num_centroids, nprobe)``.

    ``num_centroids ≈ √n`` balances the two costs a probe pays —
    scoring n/num_centroids list members per probed list vs scoring
    num_centroids centroids to pick the lists — so total work per
    query is ~2·nprobe·√n. ``nprobe`` starts where the measured
    recall/scan-fraction curve (BENCH/ANN.md, `scripts/
    ann_recall_probe.py`) crosses the target on clustered corpora:
    nprobe=2 of 64 centroids reached recall@10 = 0.91 scanning 3.4 %
    of a 20k corpus; each doubling of nprobe roughly halves the missed
    mass (0.72 → 0.91 → 0.96 → 0.99). Clamped so tiny corpora still
    get ≥8 lists and nprobe never exceeds the list count.
    """
    import math

    num_centroids = max(8, min(4096, round(math.sqrt(max(corpus_size, 1)))))
    # measured baseline: nprobe=2 misses ~0.1 of the true top-k; each
    # nprobe doubling at least halves the missed mass on clustered data
    missed_at_2 = 0.1
    missed_target = max(1e-6, 1.0 - min(recall_target, 0.999))
    doublings = max(0, math.ceil(math.log2(missed_at_2 / missed_target) - 1e-9))
    nprobe = min(num_centroids, 2 * 2**doublings)
    return num_centroids, nprobe


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    multiprobe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-LSH
    bucket and its hamming-``multiprobe_bits`` neighbor buckets.

    On a real table the bucket id is a persisted partition column, so
    this is a partition-pruned scan; here it is a filter that parquet
    row-group stats can still skip on.
    """
    dim = len(query_vec)
    # the query vector is a literal, so its bucket is computable on the
    # driver in pure Python — no Spark job, no collect
    planes = hashing.lsh_planes(num_planes, dim, seed)
    q_bucket = hashing.sign_bucket_of([float(x) for x in query_vec], planes)
    probe = {q_bucket}
    if multiprobe_bits >= 1:
        probe |= {q_bucket ^ (1 << p) for p in range(num_planes)}
    bucketed = df.withColumn(
        "_bucket", sign_lsh_bucket(F.col(vec_col).cast("array<double>"), num_planes, dim, seed)
    )
    cand = bucketed.where(F.col("_bucket").isin(list(probe))).drop("_bucket")
    # one scoring/ordering contract for every top-k path: delegate to
    # cosine_topk so a change there (rounding, tie order) cannot
    # silently diverge the LSH path from the shared oracle
    return cosine_topk(cand, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def sample_centroids(
    df: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic centroid sample: the ``num_centroids`` vectors
    with smallest md5(id) — md5 so an external oracle selects the
    identical sample. Returns (_cid, _cvec)."""
    return (
        df.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).cast("array<double>").alias("_cvec"),
        )
        .orderBy(F.md5(F.col("_cid").cast("string")))
        .limit(num_centroids)
    )


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vec: bool = False,
) -> DataFrame:
    """Argmin-L2 assignment against an EXPLICIT (_cid, _cvec) centroid
    set via a broadcast join (centroids are tiny by construction), ties
    broken by centroid id. Split out of ``ivf_assignments`` so a
    persistent index (lake/ann.py) can assign fresh vectors with its
    SAVED centroids instead of resampling. Returns
    (id, centroid_id, l2_dist), plus the vector itself when
    ``keep_vec`` (carried through the argmin so a covering index build
    needs no second join back to the corpus)."""
    v = F.col(vec_col).cast("array<double>")
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(v, F.col("_cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v_: acc + v_,
        )
    )
    payload = ["_cid", "l2_dist", *(["_vec"] if keep_vec else [])]
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col("_cid"),
        F.round(l2, 6).alias("l2_dist"),
        *([v.alias("_vec")] if keep_vec else []),
    )
    best = scored.groupBy(id_col).agg(
        F.min_by(
            F.struct(*payload), F.struct("l2_dist", "_cid")
        ).alias("_w")
    )
    return best.select(
        F.col(id_col),
        F.col("_w._cid").alias("centroid_id"),
        F.col("_w.l2_dist").alias("l2_dist"),
        *([F.col("_w._vec").alias(vec_col)] if keep_vec else []),
    )


def ivf_assignments(
    df: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: ``sample_centroids`` +
    ``assign_to_centroids``. Returns (id, centroid_id, l2_dist)."""
    return assign_to_centroids(
        df,
        sample_centroids(df, num_centroids, vec_col=vec_col, id_col=id_col),
        vec_col=vec_col,
        id_col=id_col,
    )


def cluster_means(assigned: DataFrame) -> DataFrame:
    """Element-wise member mean per cluster: (_cid, _pos, _m) rows.

    ``posexplode`` + one ``avg`` keeps the plan a constant size at any
    dimensionality (no per-element aggregate expressions) and stays
    map-side combinable: hash partial aggregation reduces each input
    split to at most k·dim rows before the exchange, so the shuffle is
    O(k·dim·executors) no matter how large the corpus is. Exposed for
    the plan-shape test; ``kmeans_refine`` is its only product caller.
    """
    return (
        assigned.select("_cid", F.posexplode("_v").alias("_pos", "_x"))
        .groupBy("_cid", "_pos")
        .agg(F.avg("_x").alias("_m"))
    )


def kmeans_refine(
    df: DataFrame,
    num_centroids: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF with trained centroids: Lloyd's k-means over the embedding
    column, the missing refinement step on top of ``ivf_assignments``.

    Per iteration: assign every vector to its nearest centroid
    (broadcast argmin — centroids are k×dim doubles, tiny), then
    recompute each centroid as the element-wise mean of its members via
    ``posexplode`` + ONE ``avg`` over ``(centroid, position)`` — a
    single aggregate expression regardless of dimensionality (a
    768-dim embedding must not plan 768 avg expressions), hash-agg
    partial combine pre-reduces each executor to k·dim sums before the
    shuffle, the classic MLlib k-means shape. The k·dim means come back
    to the driver between iterations (sanctioned tiny-metadata collect,
    exactly what MLlib's runs do); the big table is scanned once per
    iteration and never shuffled on its own keys.

    Init is the same deterministic md5-sample as ``ivf_assignments`` so
    an external oracle can replay every iteration in closed form.
    ``iterations`` counts ASSIGNMENT rounds: each round assigns, and
    every round but the last recomputes centroids from its assignment —
    the last round's assignment IS the result (its per-cluster means are
    the final centroids), so the corpus is scanned exactly ``iterations``
    times, never once more for a redundant re-assignment. Returns the
    final (id, centroid_id, l2_dist) assignment; clusters that lose all
    members drop out (their id never reappears), matching the grouped
    recompute.
    """
    v = F.col(vec_col).cast("array<double>")
    data = df.select(F.col(id_col).alias("_id"), v.alias("_v"))

    seed_rows = (
        data.orderBy(F.md5(F.col("_id").cast("string")))
        .limit(num_centroids)
        .collect()
    )
    centroids: list[tuple] = [(r["_id"], list(r["_v"])) for r in seed_rows]

    def _assign(cent: list[tuple]) -> DataFrame:
        # ONE argmin kernel for the whole similarity family: delegating
        # to assign_to_centroids keeps the tie-break (6dp-rounded l2,
        # then centroid id) identical to ivf_assignments / the
        # persistent index, so a near-tie can never be assigned
        # differently by two code paths; keep_vec carries the vector
        # through the argmin for the next round's mean recompute
        spark = df.sparkSession
        cent_df = spark.createDataFrame(cent, "_cid long, _cvec array<double>")
        return assign_to_centroids(
            data, cent_df, vec_col="_v", id_col="_id", keep_vec=True
        ).select(
            "_id",
            "_v",
            F.col("centroid_id").alias("_cid"),
            F.col("l2_dist").alias("_l2"),
        )

    assigned = _assign(centroids)
    for _ in range(max(iterations, 1) - 1):
        mean_rows = cluster_means(assigned).collect()
        acc: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            acc.setdefault(r["_cid"], {})[r["_pos"]] = r["_m"]
        centroids = sorted(
            (cid, [vals[i] for i in range(len(vals))]) for cid, vals in acc.items()
        )
        assigned = _assign(centroids)

    return assigned.select(
        F.col("_id").alias(id_col),
        F.col("_cid").alias("centroid_id"),
        F.round("_l2", 6).alias("l2_dist"),
    )


def pairwise_cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int | None = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed so the pair join is
    an equi-join on bucket id (never a cross join). Returns (id_a, id_b,
    cosine_sim ≥ threshold); pairs in different buckets are missed —
    that is the approximation, tuned by num_planes.

    ``num_planes=None`` derives the plane count from the corpus size
    (``derive_num_planes``) so expected bucket occupancy stays bounded:
    a fixed small plane count means ~n²/2^planes candidate pairs at
    scale. More planes trade recall (near-dup pairs split across
    buckets) for a linear-size join — the classic LSH knob."""
    dim_probe = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    dim = dim_probe[0]["d"] if dim_probe else 0
    if num_planes is None:
        n = df.count()
        num_planes = derive_num_planes(n)
        import logging

        logging.getLogger(__name__).info(
            "pairwise_cosine_near_duplicates: corpus=%d -> num_planes=%d "
            "(expected bucket occupancy ~%d; recall drops as planes grow)",
            n, num_planes, max(1, n >> num_planes),
        )
    bucketed = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        sign_lsh_bucket(F.col(vec_col).cast("array<double>"), num_planes, dim, seed).alias("_b"),
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    pairs = l.join(
        r, (F.col("l._b") == F.col("r._b")) & (F.col("l._id") < F.col("r._id"))
    ).select(
        F.col("l._id").alias("id_a"),
        F.col("r._id").alias("id_b"),
        F.round(cosine(F.col("l._v"), F.col("r._v")), 6).alias("cosine_sim"),
    )
    return pairs.where(F.col("cosine_sim") >= threshold)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_centroids: int | None = 16,
    nprobe: int | None = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF query path: search only the ``nprobe`` inverted lists whose
    centroids are nearest the query, then exact cosine top-k within
    those candidates — the standard recall/cost dial of IVF indexes.

    Scale shape: this variant re-assigns the corpus INLINE per query —
    self-contained, but the wrong plan at 100 TB. The scale path is
    :class:`mex_extractors_spark.lake.ann.IvfIndex`: assignments
    persisted once as a covering lake table, files sort-clustered by
    ``centroid_id``, probe reads file-pruned to ~nprobe/num_centroids
    of the data before any vector math (same semantics, same oracle).
    The probe set is chosen DRIVER-side over the collected centroid
    sample (tiny by construction) and embedded as literals, so the
    candidate filter is a plain ``isin`` the optimizer can push down.

    ``num_centroids=None`` / ``nprobe=None`` derive the measured
    defaults from the corpus size (:func:`derive_ivf_params` — one
    extra count job, metadata-cheap on parquet).
    """
    import math

    if num_centroids is None or nprobe is None:
        dc, dp = derive_ivf_params(df.count())
        num_centroids = num_centroids if num_centroids is not None else dc
        nprobe = nprobe if nprobe is not None else dp
    # ONE centroid sample, shared verbatim between the driver-side
    # probe selection and the executor-side assignment: collecting
    # sample_centroids (instead of an inline re-implementation) keeps
    # the two selections structurally identical, and rebuilding the
    # centroid frame from the collected rows saves the second
    # corpus-wide orderBy/limit ivf_assignments would otherwise run
    cent_rows = sample_centroids(
        df, num_centroids, vec_col=vec_col, id_col=id_col
    ).collect()
    probes = sorted(
        (
            math.sqrt(sum((x - y) ** 2 for x, y in zip(r["_cvec"], query_vec))),
            r["_cid"],
        )
        for r in cent_rows
    )[:nprobe]
    probe_ids = [cid for _d, cid in probes]
    cent_df = df.sparkSession.createDataFrame(
        [(r["_cid"], list(r["_cvec"])) for r in cent_rows],
        "_cid long, _cvec array<double>",
    )
    assigned = assign_to_centroids(df, cent_df, vec_col=vec_col, id_col=id_col)
    candidates = df.join(
        assigned.where(F.col("centroid_id").isin(probe_ids)).select(id_col),
        on=id_col,
        how="inner",
    )
    return cosine_topk(candidates, query_vec, k=k, vec_col=vec_col, id_col=id_col)
