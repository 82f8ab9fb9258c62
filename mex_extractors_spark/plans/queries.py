"""Registry of (spark query, duckdb oracle) pairs — the correctness gate.

Each entry exercises one operator family from SURVEY.md §2 against the
driver's parquet tables. Column names are aliased identically on both
sides (the driver hash-compares values after sorting columns by name).
Money aggregates use exact integer cents (no float-sum drift); float
outputs are rounded.

Every entry has an oracle — including the approximate (LSH/simhash/
IVF) operators: their "randomness" (hyperplanes, hash values, centroid
samples) is derived driver-side from md5 and embedded as literals into
BOTH the Spark plan and the generated SQL, so even approximate results
are exactly reproducible in DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mex_extractors_spark.functions import hashing
from mex_extractors_spark.functions import text as T
from mex_extractors_spark.operators import dedup, similarity
from mex_extractors_spark.operators.aggregates import (
    distinct_value_set,
    group_collect,
    group_minmax,
    union_of_key_sets,
)
from mex_extractors_spark.operators.filters import filter_cascade, keep_singletons
from mex_extractors_spark.operators.joins import synonym_lookup, topological_levels
from mex_extractors_spark.operators.lww import apply_deletes, lww_latest
from mex_extractors_spark.sources.readers import columnar_pivot


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    covers: str  # SURVEY.md §2 operator ids


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def _scratch_dir(sf_dir: str, prefix: str) -> str:
    """Fresh scratch path under the system tempdir for a lake-backed
    query, tagged by sf_dir so evaluations at different scales (and the
    pid-suffixed callers that add their own tag) never collide; any
    leftover from a prior run is removed so every evaluation replays
    from an empty table."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    return path


def _scratch_lake(sf_dir: str, prefix: str, **table_kwargs):
    """Scratch LakeTable (fresh dir via ``_scratch_dir``) with the
    shared defaults the cdc_* queries use: 4 buckets keyed on
    user_id."""
    from mex_extractors_spark.lake.table import LakeTable

    table_kwargs.setdefault("num_buckets", 4)
    table_kwargs.setdefault("key_cols", ["user_id"])
    return LakeTable(_scratch_dir(sf_dir, prefix), **table_kwargs)


def _cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared CDC projection of the driver ``events`` table: key
    user_id, seq = event_id, a latest 'error' event acts as a tombstone
    — the op mapping every lake-backed cdc_* query replays."""
    return _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("seq"),
        "event_type",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )


# Oracle builders for the approximate (LSH/simhash) operators. The
# trick that makes these EXACTLY oracle-checkable: every source of
# "randomness" (hyperplanes, hash values, centroid sample) is either
# computed in pure Python on the driver and embedded as literals into
# BOTH the Spark plan and the generated SQL, or uses md5 — which Spark
# and DuckDB compute identically (``functions/hashing.py``).


def _plane_array_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(w) for w in plane) + "]"


def _bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """Sign-LSH bucket id of ``vec_expr`` as a DuckDB expression using
    the same literal planes the Spark plan embeds."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_array_sql(plane)}) > 0"
        f" THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def _jaccard_pairs_parts(
    k: int, threshold: float, max_shingle_df: int | None
) -> tuple[str, str]:
    """(cte_block, pair_select) for exact k-gram jaccard pairs,
    mirroring ngram_jaccard_pairs semantics exactly: stop-shingles
    (document frequency > max_shingle_df) leave the UNIVERSE — per-doc
    set sizes AND intersections are both counted over the surviving
    shingle space, so jaccard stays a true |A∩B| / |A∪B| of that
    space. Split so _d6_oracle can reuse the block under WITH
    RECURSIVE."""
    guard = (
        f"""
    , hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > {max_shingle_df})
    , exf AS (SELECT * FROM ex WHERE s NOT IN (SELECT s FROM hot))
    """
        if max_shingle_df is not None
        else ", exf AS (SELECT * FROM ex)"
    )
    ctes = f"""sets AS (
      SELECT doc_id,
             list_distinct([substr(text, i, {k})
                            for i in generate_series(1, greatest(length(text) - {k - 1}, 1))]) AS sh
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(sh) AS s FROM sets
    ){guard}
    , szs AS (SELECT doc_id, count(*) AS n FROM exf GROUP BY doc_id)
    , exn AS (SELECT exf.doc_id, szs.n, exf.s FROM exf JOIN szs USING (doc_id))"""
    select = f"""
    SELECT l.doc_id AS id_a, r.doc_id AS id_b,
           round(count(*) * 1.0 / (any_value(l.n) + any_value(r.n) - count(*)), 6) AS jaccard
    FROM exn l JOIN exn r ON l.s = r.s AND l.doc_id < r.doc_id
    GROUP BY l.doc_id, r.doc_id
    HAVING round(count(*) * 1.0 / (any_value(l.n) + any_value(r.n) - count(*)), 6) >= {threshold}
    """
    return ctes, select


def _jaccard_pairs_oracle(k: int, threshold: float, max_shingle_df: int | None) -> str:
    ctes, select = _jaccard_pairs_parts(k, threshold, max_shingle_df)
    return f"WITH {ctes}{select}"


def _d6_oracle(k: int, threshold: float, max_shingle_df: int | None) -> str:
    """Connected components over the exact-jaccard pair graph via a
    recursive transitive closure; component id = min reachable doc id
    (self included), singleton docs map to themselves — mirroring
    dedup_components' min-label-propagation fixpoint."""
    ctes, select = _jaccard_pairs_parts(k, threshold, max_shingle_df)
    return f"""
    WITH RECURSIVE {ctes},
    pairs AS ({select}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    step(v, u) AS (
      SELECT s, d FROM edges
      UNION
      SELECT step.v, e.d FROM step JOIN edges e ON step.u = e.s
    )
    SELECT d.doc_id,
           least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component_id
    FROM documents d
    LEFT JOIN (SELECT v, min(u) AS mn FROM step GROUP BY v) m ON d.doc_id = m.v
    """


def _simhash_pairs_oracle(max_hamming: int) -> str:
    """Full 60-bit md5 simhash + BRUTE-FORCE all-pairs hamming in SQL.
    The engine computes the same pairs via pigeonhole chunk bucketing,
    so equality against this oracle PROVES the bucketing loses no pair
    within the hamming budget (the recall contract)."""
    h = hashing.md5_long60_sql("tok")
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), hashes AS (
      SELECT doc_id, {h} AS h FROM toks
    ), votes AS (
      SELECT doc_id, g.i AS i,
             sum(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashes CROSS JOIN generate_series(0, 59) AS g(i)
      GROUP BY doc_id, g.i
    ), sig AS (
      SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS s
      FROM votes GROUP BY doc_id
    )
    SELECT l.doc_id AS id_a, r.doc_id AS id_b,
           CAST(bit_count(xor(l.s, r.s)) AS INT) AS hamming
    FROM sig l JOIN sig r ON l.doc_id < r.doc_id
    WHERE bit_count(xor(l.s, r.s)) <= {max_hamming}
    """


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _d5b_oracle(threshold: float, num_planes: int, dim: int = 64, seed: int = 42) -> str:
    planes = hashing.lsh_planes(num_planes, dim, seed)
    bucket = _bucket_sql("embedding::DOUBLE[]", planes)
    cos = _cos_sql("l.v", "r.v")
    return f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bk
      FROM embeddings
    )
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           round({cos}, 6) AS cosine_sim
    FROM b l JOIN b r ON l.bk = r.bk AND l.vec_id < r.vec_id
    WHERE round({cos}, 6) >= {threshold}
    """


def _sim2_oracle(qvec: list[float], k: int, num_planes: int, seed: int = 42) -> str:
    planes = hashing.lsh_planes(num_planes, len(qvec), seed)
    q_bucket = hashing.sign_bucket_of(qvec, planes)
    probe = sorted({q_bucket} | {q_bucket ^ (1 << p) for p in range(num_planes)})
    bucket = _bucket_sql("embedding::DOUBLE[]", planes)
    qarr = "[" + ", ".join(repr(float(x)) for x in qvec) + "]"
    cos = _cos_sql("embedding::DOUBLE[]", qarr)
    return f"""
    SELECT vec_id, round({cos}, 6) AS cosine_sim
    FROM embeddings
    WHERE {bucket} IN ({", ".join(map(str, probe))})
    ORDER BY cosine_sim DESC, vec_id ASC LIMIT {k}
    """


def _sim3_oracle(num_centroids: int) -> str:
    d = "e.embedding::DOUBLE[]"
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {num_centroids}
    ), scored AS (
      SELECT e.vec_id AS vec_id, c.cid AS cid,
             round(sqrt(list_sum([(({d})[i] - c.cvec[i]) * (({d})[i] - c.cvec[i])
                                   for i in generate_series(1, len(c.cvec))])), 6) AS l2_dist
      FROM embeddings e CROSS JOIN cent c
    )
    SELECT vec_id, cid AS centroid_id, l2_dist
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY l2_dist, cid) = 1
    """


def _sim4_oracle(num_centroids: int, iterations: int, dim: int) -> str:
    """Lloyd's k-means unrolled: iterations is a compile-time constant,
    so each assign+recompute round is one more CTE pair — no recursion
    needed. Mirrors kmeans_refine bit-for-bit (same md5 seed sample,
    same (x-y)*(x-y) fold, same lost-cluster semantics)."""
    l2 = (
        "sqrt(list_sum([((e.embedding::DOUBLE[])[i] - c.cvec[i]) * "
        "((e.embedding::DOUBLE[])[i] - c.cvec[i]) "
        "for i in generate_series(1, len(c.cvec))]))"
    )

    def assign(cent: str, name: str) -> str:
        # tie-break mirrors assign_to_centroids: 6dp-rounded l2, then cid
        return f"""{name} AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.cid, {l2} AS l2
        FROM embeddings e CROSS JOIN {cent} c)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(l2, 6), cid) = 1
    )"""

    def recompute(assigned: str, name: str) -> str:
        return f"""{name} AS (
      SELECT cid, list(val ORDER BY pos) AS cvec FROM (
        SELECT cid, i AS pos, avg(v[i]) AS val
        FROM {assigned}, generate_series(1, {dim}) t(i) GROUP BY cid, i)
      GROUP BY cid
    )"""

    ctes = [
        f"""cent0 AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {num_centroids}
    )"""
    ]
    # `iterations` counts ASSIGNMENT rounds; every round but the last
    # recomputes centroids — the final round's assignment is the result
    # (mirrors kmeans_refine's scan-count contract exactly)
    for it in range(max(iterations, 1) - 1):
        ctes.append(assign(f"cent{it}", f"a{it + 1}"))
        ctes.append(recompute(f"a{it + 1}", f"cent{it + 1}"))
    final = f"""
    SELECT vec_id, cid AS centroid_id, round(l2, 6) AS l2_dist FROM (
      SELECT e.vec_id, c.cid, {l2} AS l2
      FROM embeddings e CROSS JOIN cent{max(iterations, 1) - 1} c)
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(l2, 6), cid) = 1
    """
    return "WITH " + ",\n    ".join(ctes) + final


_BASE62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _sim5_oracle(qvec: list[float], k: int, num_centroids: int, nprobe: int) -> str:
    """IVF nprobe search restated in SQL: same md5-deterministic
    centroid sample, same rounded-argmin assignment tie-break as
    _sim3_oracle, probe list by exact L2 to the literal query."""
    qlit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in qvec) + "]"
    d = "e.embedding::DOUBLE[]"
    l2 = (
        f"sqrt(list_sum([(({d})[i] - c.cvec[i]) * (({d})[i] - c.cvec[i])"
        " for i in generate_series(1, len(c.cvec))]))"
    )
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {num_centroids}
    ), q AS (SELECT {qlit} AS qv),
    probe AS (
      SELECT cid FROM cent, q
      ORDER BY sqrt(list_sum([(cvec[i] - qv[i]) * (cvec[i] - qv[i])
                              for i in generate_series(1, len(cvec))])), cid
      LIMIT {nprobe}
    ), assign AS (
      SELECT e.vec_id AS vec_id, c.cid AS cid
      FROM embeddings e CROSS JOIN cent c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                 ORDER BY round({l2}, 6), c.cid) = 1
    )
    SELECT e.vec_id,
           round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
    FROM embeddings e
    JOIN assign a ON e.vec_id = a.vec_id AND a.cid IN (SELECT cid FROM probe), q
    ORDER BY cosine_sim DESC, e.vec_id ASC LIMIT {k}
    """


def _stable_id_sql(*part_exprs: str, length: int = 22) -> str:
    """functions.ids.stable_id as a DuckDB expression: sha256 over
    chr(31)-joined parts, base62-folded — byte-identical to the Spark
    column (md5/sha256 are engine-independent)."""
    joined = " || chr(31) || ".join(part_exprs)
    return (
        f"array_to_string([substr('{_BASE62}', "
        f"(('0x' || substr(sha256({joined}), 1 + 2*i, 2))::INT % 62) + 1, 1) "
        "for i in generate_series(0, 21)], '')"
    )


def _t3_oracle() -> str:
    langs = sorted(T.LANG_MARKERS)
    counts = ",\n             ".join(
        f"len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in T.LANG_MARKERS[lang])}))) AS c_{lang}"
        for lang in langs
    )
    allc = ", ".join(f"c_{lang}" for lang in langs)
    # mirror detect_lang's tiebreak: alphabetically-first max wins
    cascade = " ".join(f"WHEN c_{lang} = m THEN '{lang}'" for lang in langs[:-1])
    return f"""
    WITH counts AS (
      SELECT doc_id,
             {counts}
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents)
    )
    SELECT doc_id,
           CASE WHEN m = 0 THEN 'und' {cascade} ELSE '{langs[-1]}' END AS detected_lang
    FROM (SELECT *, greatest({allc}) AS m FROM counts)
    """


REGISTRY: dict[str, QueryDef] = {}


def q(name: str, covers: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, covers=covers)
        return fn

    return deco


# ---------------------------------------------------------------- CDC core


@q(
    "w1_lww_latest_event",
    "W1/F4 last-writer-wins kernel",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events) WHERE rn = 1
    """,
)
def w1_lww_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").alias("seq"), "event_type", "value"
    )
    latest = lww_latest(ev, key_cols=["user_id"], seq_col="seq")
    return latest.select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@q(
    "cdc_converged_state",
    "W1+tombstones: LWW merge with delete semantics",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_converged_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events replayed as a CDC stream keyed by user: latest event wins;
    a latest 'error' event acts as a tombstone (the converged-table law
    of the replay engine, over driver data)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        "event_type",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    state = apply_deletes(lww_latest(ev, key_cols=["user_id"], seq_col="seq"))
    return state.select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_changes_feed",
    "CDF between lake snapshots: insert/delete/update_postimage rows "
    "(Iceberg changelog scan shape) from LakeTable.read_changes over a "
    "real two-batch replay of the events stream",
    """
    WITH m AS (SELECT max(event_id) // 2 AS mid FROM events),
    s1 AS (
      SELECT user_id, event_id AS seq, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events WHERE event_id <= (SELECT mid FROM m))
      WHERE rn = 1 AND event_type <> 'error'
    ),
    s2 AS (
      SELECT user_id, event_id AS seq, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT coalesce(s2.user_id, s1.user_id) AS user_id,
           CAST(coalesce(s2.seq, s1.seq) AS BIGINT) AS last_event_id,
           coalesce(s2.event_type, s1.event_type) AS last_event_type,
           CASE WHEN s1.user_id IS NULL THEN 'insert'
                WHEN s2.user_id IS NULL THEN 'delete'
                ELSE 'update_postimage' END AS change_type
    FROM s2 FULL OUTER JOIN s1 ON s1.user_id = s2.user_id
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL
       OR (s1.seq, s1.event_type) IS DISTINCT FROM (s2.seq, s2.event_type)
    """,
)
def cdc_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDF check: replay the events stream into a real
    LakeTable in two committed batches (tombstone law as in
    cdc_converged_state), then diff snapshot 1 vs snapshot 2 with
    ``read_changes``. The oracle restates the diff as a FULL OUTER join
    of the two LWW states. Inserts/updates carry the post-image, deletes
    the pre-image — the Delta-CDF/Iceberg-changelog contract."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_cdf")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "cdf-b1")
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "cdf-b2")
    return table.read_changes(spark, from_version=1, to_version=2).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("_change_type").alias("change_type"),
    )


@q(
    "cdc_mor_converged_state",
    "merge-on-read write mode: delta appends + tombstones + read-side "
    "LWW merge converge to the same state as copy-on-write",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_mor_converged_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same converged-table law as cdc_converged_state, but replayed
    through a LakeTable in merge_mode="mor": batches append delta files
    (deletes as tombstones), one batch escalates to a folding rewrite,
    and the final read merges base+deltas per key. The oracle is the
    plain LWW SQL — mor is a physical write strategy, the table law is
    identical."""


    ev = _cdc_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).first()[0]
    cut1, cut2 = hi // 3, 2 * hi // 3
    table = _scratch_lake(sf_dir, "cdc_mor", merge_mode="mor", max_deltas_per_bucket=2)
    table.apply_batch(spark, ev.where(F.col("seq") <= cut1), "m1")
    table.apply_batch(
        spark, ev.where((F.col("seq") > cut1) & (F.col("seq") <= cut2)), "m2"
    )
    # third batch sees 2 piled deltas per touched bucket -> cow fold
    table.apply_batch(spark, ev.where(F.col("seq") > cut2), "m3")
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_time_travel",
    "Iceberg time travel: tag pinned at the first commit, read back "
    "through ref= after a second batch advanced MAIN — the tagged "
    "snapshot reproduces the mid-replay LWW state exactly",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events
          WHERE event_id <= (SELECT max(event_id) // 2 FROM events))
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay in two batches, pin a tag at v1, read through the tag
    after MAIN has moved past it. Covers tag ref resolution, version
    pinning (``resolve_ref`` -> ``snapshot_at``), and the snapshot-
    immutability guarantee: batch 2's copy-on-write rewrites publish
    NEW bucket files, so v1's manifest still points at the originals
    and the time-travel read is byte-stable no matter how far MAIN has
    advanced. Iceberg semantics per lake/table.py (reference analog:
    mex-extractors keeps only the latest backend state — time travel
    is a capability the lake adds on top)."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_tt")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "tt-b1")
    table.create_tag("after-b1", 1)
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "tt-b2")
    return table.read(spark, ref="after-b1").select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_schema_evolution",
    "schema evolution on apply: batch 2 adds a column and widens "
    "int->bigint; old rows read back as typed nulls / losslessly "
    "widened values through the evolved schema, version history kept",
    """
    WITH m AS (SELECT max(event_id) // 2 AS mid FROM events)
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           CAST(floor(value * 100) AS BIGINT) AS last_v100,
           CASE WHEN event_id <= (SELECT mid FROM m) THEN NULL
                ELSE props END AS last_props,
           2 AS schema_version
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's schema-evolution clause as a driver row: batch 1
    writes (user_id, seq, event_type, v100:int); batch 2 arrives with
    v100 WIDENED to bigint plus a brand-new props column. The merge step
    (lake/schema_evolution.py) widens int->bigint (lossless, Iceberg
    promotion rules) and appends props nullable; the final read presents
    EVERY row through the evolved schema — batch-1 winners carry exact
    widened v100 and a typed-null props. floor() (not a bare cast) on
    both sides because Spark truncates double->int while DuckDB rounds.
    The lit schema_version column pins that evolution actually recorded
    a second schema version (v1 rows reread through v2)."""


    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("seq"),
        "event_type",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.floor(F.col("value") * 100).alias("_v100l"),
        "props",
    )
    mid = ev.agg(F.max("seq")).first()[0] // 2
    b1 = ev.where(F.col("seq") <= mid).select(
        "user_id", "seq", "event_type", "op",
        F.col("_v100l").cast("int").alias("v100"),
    )
    b2 = ev.where(F.col("seq") > mid).select(
        "user_id", "seq", "event_type", "op",
        F.col("_v100l").cast("long").alias("v100"), "props",
    )
    table = _scratch_lake(sf_dir, "cdc_sev")
    table.apply_batch(spark, b1, "sev-b1")
    table.apply_batch(spark, b2, "sev-b2")
    version = int(table.current_snapshot()["schema_version"])
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("v100").alias("last_v100"),
        F.col("props").alias("last_props"),
        F.lit(version).alias("schema_version"),
    )


@q(
    "cdc_expire_vacuum",
    "snapshot expiry + orphan vacuum: expire all but the head after a "
    "3-batch replay; current state untouched, expired version reads "
    "fail loudly instead of resurrecting vacuumed files",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           2 AS expired, TRUE AS v1_unreadable
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_expire_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``expire_snapshots`` + orphan cleanup as a driver row:
    after a 3-commit replay, keep only the head snapshot. The converged
    state must be bit-identical to an unexpired table (the oracle is the
    plain LWW law), exactly 2 of the 3 versions expire, and a time-travel
    read of the vacuumed v1 raises (never silently returns partial data
    from whatever files happen to survive)."""


    ev = _cdc_events(spark, sf_dir)
    hi = ev.agg(F.max("seq")).first()[0]
    cut1, cut2 = hi // 3, 2 * hi // 3
    table = _scratch_lake(sf_dir, "cdc_vac")
    table.apply_batch(spark, ev.where(F.col("seq") <= cut1), "vac-b1")
    table.apply_batch(
        spark, ev.where((F.col("seq") > cut1) & (F.col("seq") <= cut2)), "vac-b2"
    )
    table.apply_batch(spark, ev.where(F.col("seq") > cut2), "vac-b3")
    expired = table.expire_snapshots(keep_last=1)
    try:
        table.read(spark, version=1)
        v1_unreadable = False
    except ValueError:
        v1_unreadable = True
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.lit(int(expired)).alias("expired"),
        F.lit(bool(v1_unreadable)).alias("v1_unreadable"),
    )


@q(
    "cdc_delete_where",
    "predicate DML: DELETE FROM state WHERE event_type='click' "
    "(compliance-purge shape) — stats-pruned bucket rewrite, matched "
    "count pinned, pre-delete snapshot still time-travel readable",
    """
    WITH state AS (
      SELECT user_id, event_id, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           (SELECT count(*) FROM state WHERE event_type = 'click') AS dml_matched,
           TRUE AS v1_full
    FROM state WHERE event_type <> 'click'
    """,
)
def cdc_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE by predicate (``LakeTable.delete_where``) as a
    driver row — the GDPR/revocation shape the CDC feed cannot express
    (a tombstone needs a key + sequence; "purge every click row" names
    neither). Replay the full stream, delete converged rows whose
    last event is a click, read back. ``dml_matched`` pins the engine's
    matched-row count against the oracle's recount; ``v1_full`` pins
    copy-on-write isolation (the pre-delete snapshot still reads the
    full state). Scale shape per delete_where: manifest-stats pruning →
    per-bucket match counts → only matched buckets rewritten."""


    ev = _cdc_events(spark, sf_dir)
    table = _scratch_lake(sf_dir, "cdc_del")
    table.apply_batch(spark, ev, "del-b1")
    pre_rows = table.read(spark).count()
    st = table.delete_where(spark, [("event_type", "=", "click")], "purge-clicks")
    v1_full = table.read(spark, version=1).count() == pre_rows
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.lit(int(st.matched)).alias("dml_matched"),
        F.lit(bool(v1_full)).alias("v1_full"),
    )


@q(
    "cdc_update_where",
    "predicate DML: UPDATE state SET v100=v100*2+1 WHERE "
    "event_type='view' (in-place redaction/correction shape); "
    "non-matching rows byte-identical, matched count pinned",
    """
    WITH state AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS v100
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           CASE WHEN event_type = 'view' THEN v100 * 2 + 1 ELSE v100 END AS last_v100,
           (SELECT count(*) FROM state WHERE event_type = 'view') AS dml_matched
    FROM state
    """,
)
def cdc_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE by predicate (``LakeTable.update_where``): after
    a full replay, rewrite ``v100`` for every converged row whose last
    event is a view — the in-place correction/redaction shape (the CDC
    feed would need a new higher-sequence event per key; UPDATE names a
    predicate instead). The SET expression references the row
    (v100*2+1), so the oracle's CASE restates the whole table state:
    matching rows transformed, everything else byte-identical. floor()
    (not a bare cast) on both sides because Spark truncates
    double->long while DuckDB rounds."""


    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("seq"),
        "event_type",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.floor(F.col("value") * 100).cast("long").alias("v100"),
    )
    table = _scratch_lake(sf_dir, "cdc_upd")
    table.apply_batch(spark, ev, "upd-b1")
    st = table.update_where(
        spark,
        {"v100": F.col("v100") * 2 + 1},
        [("event_type", "=", "view")],
        "fix-views",
    )
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("v100").alias("last_v100"),
        F.lit(int(st.matched)).alias("dml_matched"),
    )


@q(
    "cdc_rollback",
    "rollback_to(v1) after a bad second batch, then re-replay it: the "
    "snapshot's watermarks/batch-ids revert with the ref move, so the "
    "SAME batch id re-applies and the table reconverges to full state",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           TRUE AS reapplied
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``rollback_to_snapshot`` as a driver row, exercised the
    way an operator actually uses it: batch 2 lands, is found bad,
    ``rollback_to(1)`` moves CURRENT back (pure metadata — batch 1's
    files untouched), and the corrected batch 2 replays under its
    ORIGINAL batch id. Because watermarks and applied-batch ids live in
    the snapshot, fencing reverts with the ref move — the re-apply is a
    real merge (``reapplied`` pins ``applied=True``), not an idempotency
    no-op, and the final state equals the straight-through replay (the
    oracle: plain full-stream LWW)."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_rb")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "rb-b1")
    v1 = table.current_snapshot()["version"]
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "rb-b2")
    table.rollback_to(v1)
    st = table.apply_batch(spark, ev.where(F.col("seq") > mid), "rb-b2")
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.lit(bool(st.applied)).alias("reapplied"),
    )


@q(
    "cdc_merge_into",
    "MERGE INTO state USING second-half-LWW source: matched+error "
    "deletes, matched updates event_type (seq kept), not-matched "
    "inserts unless error — all three clauses in one commit",
    """
    WITH m AS (SELECT max(event_id) // 2 AS mid FROM events),
    t AS (
      SELECT user_id, event_id AS seq, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events WHERE event_id <= (SELECT mid FROM m))
      WHERE rn = 1 AND event_type <> 'error'
    ),
    s AS (
      SELECT user_id, event_id AS seq, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events WHERE event_id > (SELECT mid FROM m))
      WHERE rn = 1
    )
    SELECT coalesce(t.user_id, s.user_id) AS user_id,
           CASE WHEN t.user_id IS NOT NULL THEN t.seq ELSE s.seq END AS last_event_id,
           CASE WHEN s.user_id IS NOT NULL THEN s.event_type
                ELSE t.event_type END AS last_event_type
    FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
    WHERE NOT (t.user_id IS NOT NULL AND s.user_id IS NOT NULL
               AND s.event_type = 'error')
      AND NOT (t.user_id IS NULL AND s.event_type = 'error')
    """,
)
def cdc_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MERGE INTO (``LakeTable.merge_into``) as a driver row,
    firing all three clauses in one commit: the table holds the
    first-half LWW state; the source is the second half's per-user LWW
    row. Matched users whose source row is an error are DELETED;
    other matched users get event_type UPDATED in place (sequence
    immutable, so ``last_event_id`` stays the FIRST-half seq — the
    visible difference from a CDC apply, which the oracle's CASE
    encodes); unmatched source users INSERT unless they are errors
    (conditional insert clause). The oracle restates the merge as a
    FULL OUTER JOIN with the clause conditions as WHERE/CASE."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_mrg")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "mrg-b1")
    source = lww_latest(
        ev.where(F.col("seq") > mid), key_cols=["user_id"], seq_col="seq"
    ).select("user_id", "seq", "event_type")
    table.merge_into(
        spark,
        source,
        "mrg-1",
        when_matched_update={"event_type": F.col("s.event_type")},
        when_matched_delete=F.col("s.event_type") == "error",
        when_not_matched_insert=F.col("s.event_type") != "error",
    )
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_txn_purge",
    "cross-table atomic purge: one LakeTransaction deletes a user from "
    "the state table AND a derived per-user index, committed in ONE "
    "catalog CAS; result is both tables' post-purge rows",
    """
    WITH state AS (
      SELECT user_id, event_id, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    ),
    victim AS (SELECT min(user_id) AS u FROM state)
    SELECT 'state' AS src, user_id,
           event_id AS last_event_id, event_type AS last_event_type,
           CAST(-1 AS BIGINT) AS n_events
    FROM state WHERE user_id <> (SELECT u FROM victim)
    UNION ALL
    SELECT 'index' AS src, e.user_id,
           CAST(-1 AS BIGINT) AS last_event_id, '' AS last_event_type,
           count(*) AS n_events
    FROM events e
    WHERE e.user_id IN (SELECT user_id FROM state)
      AND e.user_id <> (SELECT u FROM victim)
    GROUP BY e.user_id
    """,
)
def cdc_txn_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GDPR shape as a driver row: a catalog holds the converged
    state table plus a derived per-user event-count index; ONE
    ``LakeTransaction`` stages ``delete_where(user_id = victim)`` on
    BOTH and commits them in a single catalog CAS — mid-transaction the
    mains still show the victim (asserted), post-commit neither does.
    The returned frame is both tables' post-purge rows tagged by
    ``src``; the oracle recomputes state (full-stream LWW minus the
    victim) and index (per-user counts over live users minus the
    victim) independently. Sentinels (-1 / '') stand in for the
    other table's columns instead of NULL so the driver's row-sort
    comparator never sees mixed None/int."""
    import os

    from mex_extractors_spark.lake.catalog import LakeCatalog
    from mex_extractors_spark.lake.table import LakeTable

    ev = _cdc_events(spark, sf_dir)
    cat_dir = _scratch_dir(sf_dir, "cdc_txp")
    cat = LakeCatalog(cat_dir)
    cat.register(
        "state",
        LakeTable(os.path.join(cat_dir, "state"), num_buckets=4, key_cols=["user_id"]),
    )
    cat.register(
        "index",
        LakeTable(os.path.join(cat_dir, "index"), num_buckets=4, key_cols=["user_id"]),
    )
    with cat.transaction() as txn:
        txn.apply_batch(spark, "state", ev, "tp-b1")
        state_staged = cat.table("state").read(spark, ref=f"txn-{txn.txn_id}")
        idx = (
            ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"), F.max("seq").alias("seq"))
            .join(state_staged.select("user_id"), "user_id")  # live users only
            .withColumn("op", F.lit("U"))
        )
        txn.apply_batch(spark, "index", idx, "tp-i1")
        txn.commit()
    victim = cat.read(spark, "state").agg(F.min("user_id")).first()[0]
    with cat.transaction() as txn:
        txn.delete_where(spark, "state", [("user_id", "=", victim)], "purge-u")
        txn.delete_where(spark, "index", [("user_id", "=", victim)], "purge-u-idx")
        # atomicity window: mains unchanged until the catalog CAS
        assert (
            cat.read(spark, "state").where(F.col("user_id") == victim).count() == 1
        ), "staged purge leaked to main before commit"
        txn.commit()
    state = cat.read(spark, "state").select(
        F.lit("state").alias("src"),
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.lit(-1).cast("long").alias("n_events"),
    )
    index = cat.read(spark, "index").select(
        F.lit("index").alias("src"),
        "user_id",
        F.lit(-1).cast("long").alias("last_event_id"),
        F.lit("").alias("last_event_type"),
        "n_events",
    )
    return state.unionByName(index)


@q(
    "cdc_point_lookup",
    "point lookup (read_key): one key's state from the one bucket it "
    "hashes to, equality pushed to the scan; driver row for K2h",
    """
    WITH state AS (
      SELECT user_id, event_id, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM state WHERE user_id = (SELECT min(user_id) FROM state)
    """,
)
def cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay into a lake, then ``read_key`` the smallest live key: the
    lookup plans a 1-row local bucket probe plus a single-bucket scan
    (1/num_buckets of the table at any size) with the key equality
    pushed down — never a full-table scan. The oracle restates the
    lookup as LWW-state-filtered-to-that-key."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_pl")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "pl-b1")
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "pl-b2")
    key = table.read(spark).agg(F.min("user_id")).first()[0]
    return table.read_key(spark, user_id=int(key)).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_incremental_agg",
    "incremental materialized-view maintenance: derived per-group "
    "aggregates kept in sync by consuming the CDF (preimage retraction),"
    " never rescanning the source",
    """
    WITH state AS (
      SELECT user_id, event_id, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
        FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(event_id) AS BIGINT) AS id_total
    FROM state GROUP BY event_type
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream into a source lake in two batches; after
    each batch, refresh a derived per-event_type aggregate table from
    the change-data-feed (full build, then CDF-only increment with
    pre-image retraction — group-moving updates and tombstone deletes
    included). The oracle aggregates the final LWW state directly: the
    incrementally-maintained view must equal the from-scratch answer."""
    import os

    from mex_extractors_spark.lake.derived import refresh_aggregates
    from mex_extractors_spark.lake.table import LakeTable

    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    base = _scratch_dir(sf_dir, "cdc_ivm")
    source = LakeTable(os.path.join(base, "src"), num_buckets=4, key_cols=["user_id"])
    derived = LakeTable(
        os.path.join(base, "drv"), num_buckets=2,
        key_cols=["event_type"], seq_col="_src_version",
    )

    def refresh():
        refresh_aggregates(
            spark, source, derived, ["event_type"],
            count_alias="cnt", sum_cols={"id_total": "seq"},
        )

    source.apply_batch(spark, ev.where(F.col("seq") <= mid), "ivm-b1")
    refresh()  # initial full build at source v1
    source.apply_batch(spark, ev.where(F.col("seq") > mid), "ivm-b2")
    refresh()  # CDF-only increment v1 -> v2
    return derived.read(spark).select("event_type", "cnt", "id_total")


@q(
    "cdc_stats_skipping_read",
    "data-skipping read: manifest file stats (footer min/max + observe'd "
    "value sets) prune base files before the scan; predicate still "
    "applied to survivors (lake/stats.py)",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type = 'purchase'
      AND event_id > (SELECT max(event_id) // 2 FROM events)
    """,
)
def cdc_stats_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream into a stats-tracking LakeTable in two
    batches, then answer "keys whose CURRENT state is a purchase that
    landed after the midpoint" via ``read(where=...)`` — the pruner
    walks the manifest stats (no file I/O) and drops provably-excluded
    base files before the scan is planned; the oracle restates the
    predicate over the plain LWW state."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_skip", stats_cols=["event_type", "seq"])
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "skip-b1")
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "skip-b2")
    state = table.read(
        spark, where=[("event_type", "=", "purchase"), ("seq", ">", int(mid))]
    )
    return state.select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_bloom_point_lookup",
    "bloom-filter data skipping: per-file blooms over a hash-like column "
    "prune a point lookup min/max bounds never could (a random digest "
    "spans every file); lake/table.py bloom_cols + lake/stats.py "
    "bloom_may_contain — the oracle restates the lookup over plain LWW",
    """
    WITH state AS (
      SELECT user_id, event_id, md5(concat(user_id, ':', event_id)) AS commit
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT user_id, event_id AS last_event_id, commit
    FROM state
    WHERE commit = (SELECT commit FROM state ORDER BY user_id LIMIT 1)
    """,
)
def cdc_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream into a LakeTable with
    ``bloom_cols=["commit"]`` (commit = md5(user:event), a hash-like
    column where footer min/max is useless), then answer "which row
    carries digest X" via ``read(where=...)``: the manifest blooms
    prove absence per file driver-side, so the scan touches ~only the
    file holding the needle. The needle is the smallest user's current
    digest — recomputed identically in the SQL oracle (md5 is
    bit-identical across Spark and DuckDB)."""


    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("seq"),
        F.md5(F.concat_ws(":", F.col("user_id"), F.col("event_id"))).alias(
            "commit"
        ),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_bloom", bloom_cols=["commit"])
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "bloom-b1")
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "bloom-b2")
    needle = (
        table.read(spark).orderBy("user_id").select("commit").first()["commit"]
    )
    state = table.read(spark, where=[("commit", "=", needle)])
    return state.select(
        "user_id", F.col("seq").alias("last_event_id"), "commit"
    )


@q(
    "cdc_zorder_clustered_read",
    "Z-order clustered compaction (Delta OPTIMIZE ZORDER / Iceberg "
    "sort-order rewrite analog): compact(cluster_by=[seq,value], "
    "strategy=zorder) rewrites each hash bucket as range-disjoint "
    "files, so the footer-stats pruner skips files INSIDE buckets for "
    "a 2-d box predicate; the oracle restates the box over plain LWW",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
      AND event_id > (SELECT max(event_id) // 2 FROM events)
      AND value < 10.0
    """,
)
def cdc_zorder_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream into a LakeTable in two batches, Z-order
    the table by (seq, value) via ``compact(cluster_by=...,
    cluster_strategy="zorder")``, then answer a 2-d box query ("recent
    AND low-value current state") via ``read(where=...)``. On a
    hash-bucketed layout every one-file-per-bucket write spans the full
    range of both columns — min/max prunes nothing; after the clustered
    rewrite each bucket holds several files with tight bounds in BOTH
    dimensions and the pruner drops most of them driver-side. The
    clustering is a pure physical rewrite: the oracle is the plain LWW
    state with the same box predicate."""


    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("seq"),
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_zord")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "z-b1")
    table.apply_batch(spark, ev.where(F.col("seq") > mid), "z-b2")
    rows = table.current_snapshot()["total_rows"]
    table.compact(
        spark,
        cluster_by=["seq", "value"],
        cluster_strategy="zorder",
        target_file_rows=max(rows // (4 * 8), 1),
    )
    state = table.read(
        spark, where=[("seq", ">", int(mid)), ("value", "<", 10.0)]
    )
    return state.select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_inverted_index",
    "incrementally-maintained inverted index over the CDF: per-key "
    "pre/post-image term diffs -> I/D index rows, O(changed terms) per "
    "refresh (lake/index.py); the oracle recomputes the index from the "
    "final LWW state from scratch",
    """
    WITH state AS (
      SELECT user_id, props FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
        FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT DISTINCT u.term, s.user_id
    FROM state s, unnest(string_split(coalesce(s.props, ''), ' ')) AS u(term)
    WHERE u.term <> ''
    """,
)
def cdc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream into a source lake in two batches,
    maintaining a (term, user_id) inverted index over the props text
    after each batch (full build at v1, CDF-diff increment at v2). The
    maintained index must equal the from-scratch recompute of the final
    state — updates retract removed terms and add new ones."""
    import os

    from mex_extractors_spark.lake.index import refresh_inverted_index
    from mex_extractors_spark.lake.table import LakeTable

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").cast("long").alias("seq"),
        "event_type",
        "props",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    mid = ev.agg(F.max("seq")).first()[0] // 2
    base = _scratch_dir(sf_dir, "cdc_idx")
    source = LakeTable(os.path.join(base, "src"), num_buckets=4, key_cols=["user_id"])
    index = LakeTable(
        os.path.join(base, "idx"), num_buckets=4,
        key_cols=["term", "user_id"], seq_col="_src_version",
    )

    def terms(df):
        # mirror the oracle exactly: split on single spaces, drop empties
        return F.array_distinct(
            F.filter(
                F.split(F.coalesce(F.col("props"), F.lit("")), " "),
                lambda t: t != "",
            )
        )

    source.apply_batch(spark, ev.where(F.col("seq") <= mid), "idx-b1")
    refresh_inverted_index(spark, source, index, terms)  # full build
    source.apply_batch(spark, ev.where(F.col("seq") > mid), "idx-b2")
    refresh_inverted_index(spark, source, index, terms)  # CDF diff
    return index.read(spark).select("term", "user_id")


@q(
    "cdc_wap_guarded_publish",
    "write-audit-publish: stage the second batch on an audit branch, "
    "validate the POST-commit state (unique keys, non-empty), then "
    "atomically fast-forward main (Iceberg/Nessie WAP; reference "
    "blocking checks pipeline/base.py:107-127)",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_wap_guarded_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream in two batches, the second through
    ``write_audit_publish``: it lands on a throwaway audit branch, the
    validator checks invariants of the WOULD-BE-published state (key
    uniqueness, non-emptiness — checks a batch-level gate cannot
    express), and only then does main fast-forward. The oracle is the
    plain LWW law: WAP changes when readers see a commit, never what
    the table converges to."""


    ev = _cdc_events(spark, sf_dir)
    mid = ev.agg(F.max("seq")).first()[0] // 2
    table = _scratch_lake(sf_dir, "cdc_wap")
    table.apply_batch(spark, ev.where(F.col("seq") <= mid), "wap-b1")

    def audit(state):
        n, n_keys = state.agg(
            F.count(F.lit(1)), F.countDistinct("user_id")
        ).first()
        if n == 0:
            return "published state would be empty"
        if n != n_keys:
            return f"duplicate keys in state ({n} rows, {n_keys} keys)"
        return None

    table.write_audit_publish(spark, ev.where(F.col("seq") > mid), "wap-b2", audit)
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "cdc_catalog_txn",
    "Nessie-style multi-table atomic commit (lake/catalog.py): two "
    "tables staged on txn branches, one catalog CAS, an aborted txn "
    "left invisible, snapshot-isolated cross-table read",
    """
    WITH st AS (
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    ),
    cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS type_total
            FROM events GROUP BY event_type)
    SELECT st.user_id, CAST(st.last_event_id AS BIGINT) AS last_event_id,
           st.last_event_type, cnt.type_total
    FROM st JOIN cnt ON st.last_event_type = cnt.event_type
    """,
)
def cdc_catalog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events stream into TWO tables (converged state keyed
    by user + per-type event counts keyed by event_type) through
    catalog transactions: txn1 commits both halves' batch 1, a middle
    transaction stages poisoned rows on both tables and ABORTS, txn2
    commits batch 2. The returned join reads both tables at ONE pinned
    catalog snapshot — it matches the oracle only if (a) the aborted
    stage never became visible on either table and (b) the two pins
    came from the same atomic commit."""
    import os

    from mex_extractors_spark.lake.catalog import LakeCatalog
    from mex_extractors_spark.lake.table import LakeTable

    ev = _cdc_events(spark, sf_dir)
    mx = ev.agg(F.max("seq")).first()[0]
    mid = mx // 2
    base = _scratch_dir(sf_dir, "cdc_cat")
    cat = LakeCatalog(base)
    cat.register("state", LakeTable(os.path.join(base, "state"), num_buckets=4,
                                    key_cols=["user_id"]))
    cat.register("stats", LakeTable(os.path.join(base, "stats"), num_buckets=2,
                                    key_cols=["event_type"]))

    def stats_as_of(upper_seq: int, as_seq: int) -> DataFrame:
        return (
            ev.where(F.col("seq") <= upper_seq)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("type_total"))
            .select(
                "event_type",
                F.lit(as_seq).cast("long").alias("seq"),
                F.lit("U").alias("op"),
                "type_total",
            )
        )

    with cat.transaction() as t1:
        t1.apply_batch(spark, "state", ev.where(F.col("seq") <= mid), "cat-b1")
        t1.apply_batch(spark, "stats", stats_as_of(mid, mid), "cat-s1")
        t1.commit()
    # a staged-then-aborted transaction must leave no trace on either table
    poison = cat.transaction()
    poison.apply_batch(
        spark,
        "state",
        ev.where(F.col("seq") > mid).withColumn("event_type", F.lit("POISON")),
        "cat-poison",
    )
    poison.apply_batch(
        spark,
        "stats",
        stats_as_of(mx, mx).withColumn("type_total", F.lit(-1).cast("long")),
        "cat-poison-s",
    )
    poison.abort()
    with cat.transaction() as t2:
        t2.apply_batch(spark, "state", ev.where(F.col("seq") > mid), "cat-b2")
        t2.apply_batch(spark, "stats", stats_as_of(mx, mx), "cat-s2")
        t2.commit()
    pinned = cat.current_snapshot()["version"]
    state = cat.read(spark, "state", catalog_version=pinned)
    stats = cat.read(spark, "stats", catalog_version=pinned)
    return state.join(
        F.broadcast(stats.select("event_type", "type_total")),
        state["event_type"] == stats["event_type"],
    ).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        state["event_type"].alias("last_event_type"),
        "type_total",
    )


@q(
    "k2_ndjson_export",
    "K2 checksummed versioned NDJSON sink (sinks/s3.py:52-133): "
    "executor-written ordered parts, driver read-back sha256, "
    "metadata document — the oracle recomputes the exact byte-stream "
    "hash from SQL",
    """
    SELECT CAST(count(*) AS BIGINT) AS item_count,
           sha256(string_agg(
             '{"r_name":"' || r_name || '","r_regionkey":' || r_regionkey || '}',
             chr(10) ORDER BY r_regionkey) || chr(10)) AS sha256_checksum
    FROM region
    """,
)
def k2_ndjson_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export the region dim through the NDJSON sink and return the
    metadata document's (item_count, sha256_checksum); the oracle
    rebuilds the identical canonical byte stream in SQL, so hash
    equality proves sorted-key serialization, total ordering, AND the
    bytes-on-storage read-back."""

    from mex_extractors_spark.sinks.ndjson import export_ndjson

    out = _scratch_dir(sf_dir, "k2_ndjson")
    meta = export_ndjson(
        spark,
        _t(spark, sf_dir, "region").select("r_name", "r_regionkey"),
        out,
        version_label="publisher-1.0",
        order_cols=["r_regionkey"],
    )
    return spark.createDataFrame(
        [(meta["item_count"], meta["sha256_checksum"])],
        "item_count long, sha256_checksum string",
    )


@q(
    "f4_first_wins_dedup",
    "F4 seen-set dedup (first per key in seq order)",
    """
    SELECT user_id, event_type, min(event_id) AS first_event_id
    FROM events GROUP BY user_id, event_type
    """,
)
def f4_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


# ------------------------------------------------------------- relational


@q(
    "a1_pricing_summary",
    "A1/A2 grouped aggregate (TPC-H Q1 shape), exact integer cents",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(_cents("l_extendedprice")).cast("long").alias("sum_base_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "j1_broadcast_dim_join",
    "J1 broadcast hash join through two dims",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    ).agg(
        F.sum(_cents("o_totalprice")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@q(
    "j2_inner_skip_join",
    "J2 inner-join-by-skip (drop unmatched probes)",
    """
    SELECT p.p_brand AS brand, count(*) AS n_lines,
           CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j2_inner_skip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("long").alias("total_qty"),
        )
    )


@q(
    "j3_left_join_fallback",
    "J3 left join with fallback default (coalesce)",
    """
    SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment, count(*) AS n_orders
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY coalesce(c.c_mktsegment, 'UNKNOWN')
    """,
)
def j3_left_join_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return joined.groupBy(
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@q(
    "j6_self_join_link",
    "J6 self-join linking rows by a reference column",
    """
    SELECT a.o_orderkey AS order_key, b.o_orderkey AS linked_order_key
    FROM orders a JOIN orders b
      ON b.o_custkey = a.o_custkey AND b.o_orderkey = a.o_orderkey + 1
    """,
)
def j6_self_join_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a, b = o.alias("a"), o.alias("b")
    return a.join(
        b,
        (F.col("b.o_custkey") == F.col("a.o_custkey"))
        & (F.col("b.o_orderkey") == F.col("a.o_orderkey") + 1),
    ).select(
        F.col("a.o_orderkey").alias("order_key"),
        F.col("b.o_orderkey").alias("linked_order_key"),
    )


@q(
    "anti_join_missing_dim",
    "J5 get-or-create probe: keys with no match (left-anti join)",
    """
    SELECT o_orderkey FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    """,
)
def anti_join_missing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey")


@q(
    "f2_filter_cascade",
    "F1/F2 ordered predicate cascade with drop-reason lineage",
    """
    SELECT coalesce(
             CASE WHEN l_discount > 0.05 THEN 'high_discount'
                  WHEN l_quantity < 5 THEN 'low_qty'
                  WHEN l_tax > 0.07 THEN 'high_tax' END, 'kept') AS reason,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def f2_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    tagged = filter_cascade(
        li,
        [
            ("high_discount", F.col("l_discount") > 0.05),
            ("low_qty", F.col("l_quantity") < 5),
            ("high_tax", F.col("l_tax") > 0.07),
        ],
    )
    return tagged.groupBy(
        F.coalesce("drop_reason", F.lit("kept")).alias("reason")
    ).agg(F.count(F.lit(1)).alias("n"))


@q(
    "f3_keep_singletons",
    "F3 keep-only-singletons dedup (window count)",
    """
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING count(*) = 1
    """,
)
def f3_keep_singletons(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return keep_singletons(li, ["l_orderkey"]).select("l_orderkey")


@q(
    "w6_rank_topn_per_group",
    "W6 ranking window: top-3 orders per customer by price",
    """
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders) WHERE rnk <= 3
    """,
)
def w6_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@q(
    "a3_distinct_value_set",
    "A3 sorted distinct value set per group",
    """
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_set
    FROM events GROUP BY event_type
    """,
)
def a3_distinct_value_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sets = distinct_value_set(ev, ["event_type"], "user_id", alias="user_set_arr")
    return sets.select(
        "event_type", F.concat_ws(",", F.col("user_set_arr")).alias("user_set")
    )


@q(
    "a1_group_minmax",
    "A1 per-group min/max (start/modified contract)",
    """
    SELECT user_id, min(ts) AS start, max(ts) AS modified FROM events GROUP BY user_id
    """,
)
def a1_group_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return group_minmax(ev, ["user_id"], "ts", "start", "modified")


@q(
    "a5_union_key_sets",
    "A5/U2 union of key sets, distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def a5_union_key_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).distinct()


@q(
    "u5_except_values",
    "U5 relational EXCEPT: part sizes never seen as a line number",
    """
    SELECT p_size AS val FROM part
    EXCEPT
    SELECT l_linenumber FROM lineitem
    """,
)
def u5_except_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(F.col("p_size").alias("val"))
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_linenumber").alias("val"))
    # subtract = EXCEPT DISTINCT (set semantics, like the SQL oracle);
    # exceptAll would only cancel one occurrence per match (bag semantics)
    return p.subtract(li)


@q(
    "w2_topological_levels",
    "W2 topological ordering via iterative-join level assignment",
    """
    SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS node_id, 0 AS level FROM region
    UNION ALL
    SELECT 'n' || CAST(n_nationkey AS VARCHAR), 1 FROM nation
    """,
)
def w2_topological_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region→nation as a 2-level DAG run through the GENERIC iterative
    level algorithm (the oracle states the closed form)."""
    r = _t(spark, sf_dir, "region").select(
        F.concat(F.lit("r"), F.col("r_regionkey")).alias("unit_id"),
        F.lit(None).cast("string").alias("parent_unit_id"),
    )
    n = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("unit_id"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("parent_unit_id"),
    )
    edges = r.unionByName(n)
    levels = topological_levels(edges)
    return levels.select(
        F.col("unit_id").alias("node_id"), F.col("level").cast("int").alias("level")
    )


@q(
    "c8_year_extract",
    "C8 date part extraction + grouped count",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month, count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def c8_year_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(F.count(F.lit(1)).alias("n"))


@q(
    "c_scalar_string_pack",
    "C1-C6,C13,C14 scalar string family incl. canonical sha256",
    """
    SELECT doc_id,
           sha256(text) AS text_sha256,
           length(text) AS n_chars,
           substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 40) AS norm_prefix,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower
    FROM documents
    """,
)
def c_scalar_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").alias("n_chars"),
        F.substring(
            F.regexp_replace(F.lower(F.trim("text")), "\\s+", " "), 1, 40
        ).alias("norm_prefix"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias("n_lower"),
    )


@q(
    "c_json_extract",
    "C16/JSON: nested JSON field extraction + grouped count",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def c_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("long").alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))


@q(
    "s8_columnar_pivot",
    "S8 columnar pivot: distinct sorted values per column name",
    """
    SELECT 'event_type' AS column_name,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS value_set
    FROM events
    UNION ALL
    SELECT 'user_id', array_to_string(list_sort(list(DISTINCT CAST(user_id AS VARCHAR))), ',')
    FROM events
    """,
)
def s8_columnar_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    piv = columnar_pivot(ev, ["event_type", "user_id"])
    return piv.select("column_name", F.concat_ws(",", "value_set").alias("value_set"))


@q(
    "s4_style_scan",
    "S4/S5-shape generic vectorized scan: work-unit list → mapInPandas "
    "with declared schema + quarantine, demonstrated with per-file "
    "pandas CSV (s5_excel_multisheet drives the same adapter's real "
    "xlsx branch)",
    """
    SELECT n_name AS name, CAST(n_regionkey AS INT) AS region, count(*) AS n
    FROM nation GROUP BY n_name, n_regionkey
    """,
)
def s4_style_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from mex_extractors_spark.sources.file_scan import (
        read_csv_files_pandas,
        split_scan_errors,
    )

    # deterministic local "workbook" files derived from the nation table
    # (one file per region — the multi-file fan-out the Excel sources have)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = os.path.join(tempfile.gettempdir(), f"s4_scan_{tag}")
    os.makedirs(out_dir, exist_ok=True)
    nation_pd = _t(spark, sf_dir, "nation").toPandas()
    paths = []
    for region, grp in nation_pd.groupby("n_regionkey"):
        p = os.path.join(out_dir, f"region_{region}.csv")
        grp[["n_name", "n_regionkey"]].rename(
            columns={"n_name": "name", "n_regionkey": "region"}
        ).sort_values("name").to_csv(p, index=False)
        paths.append(p)

    schema = StructType(
        [StructField("name", StringType()), StructField("region", IntegerType())]
    )
    scanned = read_csv_files_pandas(spark, sorted(paths), schema)
    good, _bad = split_scan_errors(scanned)
    return good.groupBy("name", "region").agg(F.count(F.lit(1)).alias("n"))


@q(
    "s5_excel_multisheet",
    "S4/S5 real Excel scan: per-region workbooks written by the stdlib "
    "SpreadsheetML writer, read back through read_excel_files with a "
    "two-sheet fan-out (one mapInPandas unit per (file, sheet)) — the "
    "branch the reference drives with pd.read_excel "
    "(biospecimen/extract.py:66-91, odk/extract.py:18-56)",
    """
    SELECT n_name AS name, CAST(n_regionkey AS INT) AS region,
           CAST(n_nationkey % 2 AS INT) AS parity
    FROM nation
    """,
)
def s5_excel_multisheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from mex_extractors_spark.sources.file_scan import (
        read_excel_files,
        split_scan_errors,
    )
    from mex_extractors_spark.sources.xlsx import write_xlsx

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = os.path.join(tempfile.gettempdir(), f"s5_scan_{tag}")
    os.makedirs(out_dir, exist_ok=True)
    nation_pd = (
        _t(spark, sf_dir, "nation")
        .select("n_name", "n_nationkey", "n_regionkey")
        .toPandas()
    )
    paths = []
    for region, grp in nation_pd.groupby("n_regionkey"):
        body = grp.rename(
            columns={"n_name": "name", "n_nationkey": "key", "n_regionkey": "region"}
        ).sort_values("name")
        p = os.path.join(out_dir, f"region_{region}.xlsx")
        write_xlsx(
            p,
            {
                "even": body[body["key"] % 2 == 0],
                "odd": body[body["key"] % 2 == 1],
            },
        )
        paths.append(p)

    schema = StructType(
        [
            StructField("name", StringType()),
            StructField("key", IntegerType()),
            StructField("region", IntegerType()),
        ]
    )
    scanned = read_excel_files(
        spark, sorted(paths), schema, sheet_names=["even", "odd"]
    )
    good, _bad = split_scan_errors(scanned)
    # every nation appears in exactly one sheet of one workbook, so the
    # row set equals the base table iff both sheets of every file were
    # read and aligned correctly
    return good.select(
        "name", "region", (F.col("key") % 2).cast("int").alias("parity")
    )


@q(
    "a2_group_collect_nested",
    "A2 sort+groupby → nested lists (collect_list of structs, array_sort)",
    """
    SELECT o_custkey,
           array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
)
def a2_group_collect_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderkey").cast("string").alias("ok")
    )
    nested = group_collect(o, ["o_custkey"], ["ok"], alias="items")
    return nested.select(
        "o_custkey",
        F.concat_ws(",", F.transform("items", lambda s: s["ok"])).alias("order_keys"),
    )


@q(
    "c7_date_parse_fallback",
    "C7 multi-format date parse with per-format fallback (try_to_timestamp coalesce)",
    """
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                  WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                  ELSE strftime(o_orderdate, '%Y%m%d') END AS ds
      FROM orders
    )
    SELECT CAST(year(coalesce(try_strptime(ds, '%d/%m/%Y'),
                              try_strptime(ds, '%Y-%m-%d'),
                              try_strptime(ds, '%Y%m%d'))) AS INT) AS order_year,
           count(*) AS n
    FROM raw GROUP BY 1
    """,
)
def c7_date_parse_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format date strings (deterministically derived from orders)
    parsed with a per-format fallback chain — the reference tries each
    union member type until one validates (synopse/transform.py:436-444)."""
    o = _t(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "yyyyMMdd"))
        .alias("ds"),
    )
    parsed = F.coalesce(
        F.try_to_timestamp("ds", F.lit("dd/MM/yyyy")),
        F.try_to_timestamp("ds", F.lit("yyyy-MM-dd")),
        F.try_to_timestamp("ds", F.lit("yyyyMMdd")),
    )
    return raw.groupBy(F.year(parsed).alias("order_year")).agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "j4_synonym_lookup",
    "J4 synonym-explode broadcast lookup (unit-by-synonym)",
    """
    WITH dim AS (
      SELECT n_nationkey, unnest([n_name, lower(n_name)]) AS syn FROM nation
    )
    SELECT c.c_custkey, d.n_nationkey AS resolved_nationkey
    FROM (SELECT c_custkey,
                 CASE WHEN c_custkey % 2 = 0 THEN n_name ELSE lower(n_name) END AS cname
          FROM customer JOIN nation ON c_nationkey = n_nationkey) c
    LEFT JOIN dim d ON c.cname = d.syn
    """,
)
def j4_synonym_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text name (mixed case, deterministically derived) resolved
    against a synonym-array dimension (organigram/helpers.py:70-85)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    fact = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 2 == 0, F.col("n_name"))
            .otherwise(F.lower("n_name"))
            .alias("cname"),
        )
    )
    dim = n.select(
        "n_nationkey", F.array(F.col("n_name"), F.lower("n_name")).alias("synonyms")
    )
    resolved = synonym_lookup(fact, dim, fact_name_col="cname", synonyms_col="synonyms")
    return resolved.select(
        "c_custkey", F.col("n_nationkey").alias("resolved_nationkey")
    )


@q(
    "f8_exactly_one_gate",
    "F8/S14 exactly-one semantics: keys with precisely one row pass",
    """
    SELECT o_custkey, min(o_orderkey) AS only_orderkey
    FROM orders GROUP BY o_custkey HAVING count(*) = 1
    """,
)
def f8_exactly_one_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consent-gate / LDAP exactly-one contract (publisher/filter.py:11-54,
    ldap/helpers.py:33-87): a key qualifies only if it has exactly one
    matching row."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("o_orderkey").alias("only_orderkey"),
        )
        .where(F.col("_n") == 1)
        .select("o_custkey", "only_orderkey")
    )


@q(
    "u34_array_intersect_except",
    "U3/U4 set intersection + difference on array columns",
    """
    SELECT o_custkey,
           coalesce(array_to_string(list_sort(list_filter(prios, p -> p IN ('1-URGENT','2-HIGH'))), ','), '')
             AS allowed,
           coalesce(array_to_string(list_sort(list_filter(prios, p -> p NOT IN ('1-URGENT','2-HIGH'))), ','), '')
             AS denied
    FROM (SELECT o_custkey, list_distinct(list(o_orderpriority)) AS prios
          FROM orders GROUP BY o_custkey)
    """,
)
def u34_array_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allowed-actors intersection / substitution difference
    (publisher/transform.py:81-96) as array_intersect / array_except."""
    o = _t(spark, sf_dir, "orders")
    allowed = F.array(F.lit("1-URGENT"), F.lit("2-HIGH"))
    sets = o.groupBy("o_custkey").agg(
        F.array_distinct(F.collect_list("o_orderpriority")).alias("prios")
    )
    return sets.select(
        "o_custkey",
        F.concat_ws(",", F.array_sort(F.array_intersect("prios", allowed))).alias(
            "allowed"
        ),
        F.concat_ws(",", F.array_sort(F.array_except("prios", allowed))).alias(
            "denied"
        ),
    )


@q(
    "a4_first_of_group",
    "A4 deterministic first-of-group via min_by (partial-agg friendly, "
    "no row_number shuffle-sort)",
    """
    SELECT user_id, event_id, event_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1
    """,
)
def a4_first_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.aggregates import first_of_group

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    return first_of_group(ev, ["user_id"], "event_id")


@q(
    "f9_deny_list_filter",
    "F1/F9 global deny-list filter: drop rows where ANY array element "
    "matches ANY deny pattern (one folded regex alternation)",
    """
    SELECT o_custkey,
           array_to_string(list_sort(prios), ',') AS prios
    FROM (SELECT o_custkey, list_distinct(list(o_orderpriority)) AS prios
          FROM orders GROUP BY o_custkey)
    WHERE len(list_filter(prios, p -> regexp_matches(p, 'URGENT|2-HIGH'))) = 0
    """,
)
def f9_deny_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.filters import deny_list_filter

    o = _t(spark, sf_dir, "orders")
    sets = o.groupBy("o_custkey").agg(
        F.array_distinct(F.collect_list("o_orderpriority")).alias("prios")
    )
    kept = deny_list_filter(sets, "prios", ["URGENT", "2-HIGH"])
    return kept.select(
        "o_custkey", F.concat_ws(",", F.array_sort("prios")).alias("prios")
    )


@q(
    "f10_subtree_filter",
    "F10 org-unit subtree membership (iterative broadcast BFS; oracle "
    "is the equivalent recursive CTE): custkey hierarchy parent = "
    "custkey/10",
    """
    WITH RECURSIVE sub AS (
      SELECT CAST(1 AS BIGINT) AS unit_id
      UNION ALL
      SELECT c.c_custkey FROM customer c
      JOIN sub s ON CAST(c.c_custkey // 10 AS BIGINT) = s.unit_id
      WHERE c.c_custkey >= 10
    )
    SELECT DISTINCT unit_id FROM sub
    """,
)
def f10_subtree_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.filters import subtree_members

    c = _t(spark, sf_dir, "customer")
    edges = c.select(
        F.col("c_custkey").cast("long").alias("unit_id"),
        F.when(
            F.col("c_custkey") >= 10, F.floor(F.col("c_custkey") / 10).cast("long")
        ).alias("parent_unit_id"),
    )
    return subtree_members(edges, [1], id_col="unit_id", parent_col="parent_unit_id")


@q(
    "t5_tumbling_window_counts",
    "T5 tumbling event-time window counts (watermarked on a stream; "
    "identical plan as a grouped agg on a static frame)",
    """
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def t5_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.streaming.windows import tumbling_counts

    ev = _t(spark, sf_dir, "events")
    win = tumbling_counts(ev, ts_col="ts", key_col="event_type", window="1 hour")
    return win.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


@q(
    "t5b_session_windows",
    "session windows (F.session_window — native stateful sessionization "
    "on streams; same plan is a merge-agg on a static frame). Oracle is "
    "the classic gaps-and-islands rewrite",
    """
    WITH brk AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS is_new
      FROM events
    ), isl AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM brk
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           count(*) AS n_events
    FROM isl GROUP BY user_id, sid
    """,
)
def t5b_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through the engine's streaming-shaped operator.
    Boundary semantics verified empirically: Spark MERGES two events
    exactly ``gap`` apart (session end = last ts + gap, and an event
    landing on a session's end extends it), so the islands oracle
    breaks on ``diff > gap``, inclusive merge on equality."""
    from mex_extractors_spark.streaming.windows import session_windows

    ev = _t(spark, sf_dir, "events")
    out = session_windows(ev, ts_col="ts", key_col="user_id", gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@q(
    "t5c_sliding_rates",
    "sliding event-time windows (1h window, 15m slide): each event "
    "lands in exactly window/slide overlapping windows. Oracle explodes "
    "each event into its 4 slide-aligned window starts",
    """
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n
    FROM (
      SELECT time_bucket(INTERVAL 15 MINUTE, ts)
               - (g.i * INTERVAL 15 MINUTE) AS ws
      FROM events, generate_series(0, 3) g(i)
    )
    GROUP BY ws
    """,
)
def t5c_sliding_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sliding-window event rate via F.window(ts, '1 hour',
    '15 minutes'). Spark assigns each event to the 4 slide-aligned
    windows covering it; the oracle derives the same 4 starts as
    time_bucket(15m, ts) - i*15m for i in 0..3 (every one satisfies
    ws <= ts < ws + 1h by construction, so no filter is needed)."""
    from mex_extractors_spark.streaming.windows import sliding_rates

    ev = _t(spark, sf_dir, "events")
    out = sliding_rates(ev, ts_col="ts", window="1 hour", slide="15 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
    )


def _m1_oracle(dim: int = 8) -> str:
    feats = ",\n           ".join(
        f"round(('0x' || substr(sha256(hexp || kind), {1 + 2 * i}, 2))::INT / 255.0, 6) AS f{i}"
        for i in range(dim)
    )
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             sha256(text) AS hexp
      FROM documents
    )
    SELECT media_id, kind, sha256(hexp) AS payload_sha256,
           {feats}
    FROM m
    """


@q(
    "m1_multimodal_features",
    "multimodal columns: opaque binary payload + Arrow-batched "
    "mapInPandas feature extraction (operators/multimodal.py). The "
    "deterministic stub decoder is sha256-based, so the ENTIRE "
    "plumbing — binary column, batch shapes, vectorized decode — is "
    "oracle-checked end-to-end; a real codec swaps in without "
    "touching the plan",
    _m1_oracle(),
)
def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        kind.alias("kind"),
        # payload = utf8 bytes of the text's hex digest: opaque binary
        # for the engine, reproducible for the oracle
        F.encode(F.sha2("text", 256), "utf-8").alias("payload"),
    )
    feats = extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "kind",
        "payload_sha256",
        *[
            F.round(F.element_at("feature", i + 1), 6).alias(f"f{i}")
            for i in range(8)
        ],
    )


@q(
    "m2_frame_sample_plan",
    "video frame-sampling fan-out: rows multiply (sequence+explode) "
    "BEFORE the heavy decode so Spark can rebalance the frame work",
    """
    SELECT doc_id AS media_id,
           unnest(generate_series(0, (doc_id % 5) * 1000 + 1000 - 1, 1000)) AS frame_ts_ms
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def m2_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 2, F.lit("video"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        ((F.col("doc_id") % 5) * 1000 + 1000).cast("long").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000)


def _m1b_oracle() -> str:
    """Closed-form restatement of the REAL codec features: every media
    parameter is an integer function of the id (synth_real_media), so
    the decoded width/height/channel means (BMP) and sample-count/
    duration/RMS/zero-crossing-rate (WAV) are exactly computable in SQL
    without touching a byte — integer sums are exact in float64, so the
    engine's numpy means match DuckDB's avg() bit-for-bit."""
    return """
    WITH ids AS (SELECT doc_id::BIGINT AS media_id FROM documents),
    img AS (
      SELECT media_id, 4 + media_id % 5 AS w,
             3 + media_id % 4 AS h
      FROM ids WHERE media_id % 2 = 0
    ),
    px AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, w * h - 1)) AS i
      FROM img
    ),
    img_feat AS (
      SELECT media_id, 'image' AS kind,
             round(max(w)::DOUBLE, 6) AS f0,
             round(max(h)::DOUBLE, 6) AS f1,
             round(avg((media_id + 3 * (i % w) + 7 * (i // w)) % 256), 6) AS f2,
             round(avg((2 * media_id + 5 * (i % w) + (i // w)) % 256), 6) AS f3,
             round(avg((media_id + (i % w) + 13 * (i // w) + 11) % 256), 6) AS f4,
             3.0 AS f5
      FROM px GROUP BY media_id
    ),
    aud AS (
      SELECT media_id, 400 + (media_id % 5) * 100 AS n
      FROM ids WHERE media_id % 2 = 1
    ),
    samples AS (
      SELECT media_id, n, i,
             ((media_id * 31 + i * 17) % 501) - 250 AS s
      FROM (SELECT media_id, n, unnest(generate_series(0, n - 1)) AS i FROM aud)
    ),
    lagged AS (
      SELECT media_id, n, i, s,
             lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
      FROM samples
    ),
    aud_feat AS (
      SELECT media_id, 'audio' AS kind,
             round(max(n)::DOUBLE, 6) AS f0,
             round(max(n) / 8000.0, 6) AS f1,
             round(sqrt(sum((s * s)::DOUBLE) / max(n)), 6) AS f2,
             round(sum(CASE WHEN prev IS NOT NULL
                            AND ((s >= 0) <> (prev >= 0))
                       THEN 1 ELSE 0 END)::DOUBLE / (max(n) - 1), 6) AS f3,
             8000.0 AS f4, 1.0 AS f5
      FROM lagged GROUP BY media_id
    )
    SELECT * FROM img_feat UNION ALL SELECT * FROM aud_feat
    """


@q(
    "m1b_real_codec_features",
    "REAL media decode, no third-party libs: struct-parsed 24-bit BMP "
    "(width/height/channel means) and stdlib-wave-parsed 16-bit PCM WAV "
    "(samples/duration/RMS/zero-crossing rate), payloads synthesized AND "
    "decoded executor-side in Arrow batches (operators/multimodal.py); "
    "the oracle restates every feature in closed form from the id",
    _m1b_oracle(),
)
def m1b_real_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.multimodal import (
        extract_features,
        synth_real_media,
    )

    d = _t(spark, sf_dir, "documents")
    media = synth_real_media(d.select(F.col("doc_id").alias("media_id")))
    feats = extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "kind",
        *[
            F.round(F.element_at("feature", i + 1), 6).alias(f"f{i}")
            for i in range(6)
        ],
    )


def _m1c_oracle() -> str:
    """Closed-form restatement of the PNG codec features: pixel values
    are integer functions of the id (synth_png_media), filters never
    change decoded pixels, and integer channel sums are exact in
    float64 — so DuckDB's avg() over the generated lattice matches the
    engine's inflate + unfilter + numpy mean bit-for-bit."""
    return """
    WITH ids AS (SELECT doc_id::BIGINT AS media_id FROM documents),
    img AS (
      SELECT media_id, 4 + media_id % 6 AS w, 3 + media_id % 5 AS h
      FROM ids
    ),
    px AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, w * h - 1)) AS i
      FROM img
    )
    SELECT media_id, 'image' AS kind,
           round(max(w)::DOUBLE, 6) AS f0,
           round(max(h)::DOUBLE, 6) AS f1,
           round(avg((5 * media_id + 2 * (i % w) + 3 * (i // w)) % 256), 6) AS f2,
           round(avg((media_id + 7 * (i % w) + 2 * (i // w)) % 256), 6) AS f3,
           round(avg((3 * media_id + (i % w) + (i // w) + 23) % 256), 6) AS f4,
           4.0 AS f5
    FROM px GROUP BY media_id
    """


@q(
    "m1c_png_codec_features",
    "REAL compressed-image decode, stdlib only: zlib-inflated 8-bit RGB "
    "PNG with genuine scanline unfiltering (the encoder cycles all five "
    "filter types — None/Sub/Up/Average/Paeth — so the decoder's spec "
    "reconstruction is load-bearing), chunk CRCs verified, zip-bomb "
    "bounded; payloads synthesized AND decoded executor-side in Arrow "
    "batches (operators/multimodal.py); oracle states every feature in "
    "closed form from the id",
    _m1c_oracle(),
)
def m1c_png_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.multimodal import (
        extract_features,
        synth_png_media,
    )

    d = _t(spark, sf_dir, "documents")
    media = synth_png_media(d.select(F.col("doc_id").alias("media_id")))
    feats = extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "kind",
        *[
            F.round(F.element_at("feature", i + 1), 6).alias(f"f{i}")
            for i in range(6)
        ],
    )


def _m2b_oracle() -> str:
    """Closed-form restatement of the AVI per-frame channel means:
    geometry, frame count, and every pixel are integer functions of
    (id, frame, x, y) (synth_avi_media, fps=2 with every_ms=500 → every
    frame sampled, ts = frame * 500 ms)."""
    return """
    WITH ids AS (SELECT doc_id::BIGINT AS media_id FROM documents),
    geo AS (
      SELECT media_id, 4 + media_id % 4 AS w, 3 + media_id % 3 AS h,
             2 + media_id % 4 AS nf
      FROM ids
    ),
    fr AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, nf - 1)) AS f
      FROM geo
    ),
    px AS (
      SELECT media_id, w, h, f,
             unnest(generate_series(0, w * h - 1)) AS i
      FROM fr
    )
    SELECT media_id,
           f::INT AS frame_idx,
           (f * 500)::BIGINT AS ts_ms,
           round(avg((media_id + 2 * f + 3 * (i % w) + 5 * (i // w)) % 256), 6)
             AS mean_r,
           round(avg((2 * media_id + f + (i % w) + 7 * (i // w) + 3) % 256), 6)
             AS mean_g,
           round(avg((media_id + 4 * f + 5 * (i % w) + (i // w) + 9) % 256), 6)
             AS mean_b
    FROM px GROUP BY media_id, f
    """


@q(
    "m2b_avi_frame_means",
    "REAL video frame extraction, stdlib only: uncompressed 24-bit AVI "
    "(RIFF walk: avih/strh/strf + movi 00db DIB frames) parsed and "
    "frame-sampled executor-side in Arrow batches — the frame-sample "
    "plan's decode step made real (operators/multimodal.py "
    "extract_frame_features); oracle states per-frame channel means in "
    "closed form from (id, frame)",
    _m2b_oracle(),
)
def m2b_avi_frame_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.multimodal import (
        extract_frame_features,
        synth_avi_media,
    )

    d = _t(spark, sf_dir, "documents")
    media = synth_avi_media(d.select(F.col("doc_id").alias("media_id")))
    out = extract_frame_features(media, every_ms=500)
    return out.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ------------------------------------------------- J7 publisher rewrite


@q(
    "j7_reference_rewrite",
    "J7 correlated actor-reference rewrite (publisher/transform.py:54-111): "
    "per-field allowed-actor intersect, person→unit substitution via "
    "broadcast dim, contact-point fallback — one melt + broadcast joins + "
    "one re-aggregation shuffle",
    """
    WITH ucust AS (
      SELECT c_custkey,
             'c' || CAST(c_custkey AS VARCHAR) AS pid,
             'n' || CAST(c_nationkey AS VARCHAR) AS uid,
             c_acctbal > 0 AS p_allowed,
             c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
               AS u_ok
      FROM customer
    )
    SELECT 'o' || CAST(o.o_orderkey AS VARCHAR) AS identifier,
           CASE WHEN u.p_allowed THEN u.pid
                WHEN u.u_ok THEN u.uid
                ELSE 'cp-fallback' END AS contact,
           CASE WHEN u.p_allowed THEN u.pid ELSE '' END AS involved_person,
           CASE WHEN u.p_allowed THEN u.pid ELSE '' END AS external_associate,
           u.uid AS responsible_unit
    FROM orders o JOIN ucust u ON o.o_custkey = u.c_custkey
    """,
)
def j7_reference_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.publisher import (
        ACTIVITY_SPECS,
        rewrite_actor_references,
        unit_ids_per_person,
    )

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    pid = F.concat(F.lit("c"), F.col("c_custkey").cast("string"))
    uid_of_cust = F.concat(F.lit("n"), F.col("c_nationkey").cast("string"))
    uid = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))

    persons = c.select(pid.alias("identifier"), F.array(uid_of_cust).alias("memberOf"))
    units = n.select(
        uid.alias("identifier"),
        F.when(F.col("n_regionkey") < 3, F.lit("unit@example.org")).alias("email"),
    )
    allowed = (
        c.where(F.col("c_acctbal") > 0).select(pid.alias("id"))
        .unionByName(n.where(F.col("n_regionkey") < 3).select(uid.alias("id")))
    )
    items = o.join(c, o.o_custkey == c.c_custkey).select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("identifier"),
        F.lit("MergedActivity").alias("entity_type"),
        F.array(pid).alias("contact"),
        F.array(pid).alias("involvedPerson"),
        # 'c-ghost' is never an allowed actor -> always filtered out
        F.array(pid, F.lit("c-ghost")).alias("externalAssociate"),
        F.array(uid_of_cust).alias("responsibleUnit"),
    )
    out, _broken = rewrite_actor_references(
        items,
        ACTIVITY_SPECS,
        allowed,
        unit_ids_per_person(persons, units),
        ["cp-fallback"],
    )
    return out.select(
        "identifier",
        F.concat_ws(",", "contact").alias("contact"),
        F.concat_ws(",", "involvedPerson").alias("involved_person"),
        F.concat_ws(",", "externalAssociate").alias("external_associate"),
        F.concat_ws(",", "responsibleUnit").alias("responsible_unit"),
    )


@q(
    "j7b_publisher_multiclass",
    "J7 full field-spec registry (publisher/fields.py "
    "REFERENCED_ENTITY_TYPES_BY_FIELD_BY_CLASS_NAME): one rewrite pass "
    "over a mixed Resource/Consent/BibliographicResource corpus — "
    "per-class field specs, required-without-fallback keeps broken refs "
    "and reports them in the broken-refs side output",
    """
    WITH ucust AS (
      SELECT c_custkey,
             'c' || CAST(c_custkey AS VARCHAR) AS pid,
             'n' || CAST(c_nationkey AS VARCHAR) AS uid,
             c_acctbal > 0 AS p_allowed,
             c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
               AS u_ok
      FROM customer
    )
    SELECT 'o' || CAST(o.o_orderkey AS VARCHAR) AS identifier,
           'MergedResource' AS entity_type,
           CASE WHEN u.p_allowed THEN u.pid
                WHEN u.u_ok THEN u.uid
                ELSE 'cp-fallback' END AS contact,
           CASE WHEN u.p_allowed THEN u.pid ELSE '' END AS contributor,
           CASE WHEN u.p_allowed THEN u.pid ELSE '' END AS creator,
           '' AS editor,
           '' AS editor_of_series,
           '' AS has_data_subject,
           u.uid AS unit_in_charge,
           CAST(0 AS BIGINT) AS broken_fields
    FROM orders o JOIN ucust u ON o.o_custkey = u.c_custkey
    UNION ALL
    SELECT 'k' || CAST(u.c_custkey AS VARCHAR), 'MergedConsent',
           '', '', '', '', '',
           u.pid,
           '',
           CASE WHEN u.p_allowed THEN 0 ELSE 1 END
    FROM ucust u
    UNION ALL
    SELECT 'b' || CAST(o.o_orderkey AS VARCHAR), 'MergedBibliographicResource',
           '', '',
           u.pid,
           CASE WHEN u.p_allowed THEN u.pid ELSE '' END,
           '', '', '',
           CASE WHEN u.p_allowed THEN 0 ELSE 1 END
    FROM orders o JOIN ucust u ON o.o_custkey = u.c_custkey
    WHERE o.o_orderkey % 3 = 0
    """,
)
def j7b_publisher_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publisher rewrite over THREE merged classes at once, driven
    by the full field-spec registry: MergedResource (contact with
    unit/fallback escalation, person-only contributor/creator, untouched
    unitInCharge), MergedConsent (required hasDataSubject with NO
    fallback type — blocked persons stay as broken refs), and
    MergedBibliographicResource (required creator, optional editor).
    ``broken_fields`` counts the broken-refs side-output rows per item,
    proving the lineage output against the oracle too."""
    from mex_extractors_spark.operators.publisher import (
        person_bearing_specs,
        rewrite_actor_references,
        unit_ids_per_person,
    )

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    pid = F.concat(F.lit("c"), F.col("c_custkey").cast("string"))
    uid_of_cust = F.concat(F.lit("n"), F.col("c_nationkey").cast("string"))
    uid = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    nul = F.lit(None).cast("array<string>")

    persons = c.select(pid.alias("identifier"), F.array(uid_of_cust).alias("memberOf"))
    units = n.select(
        uid.alias("identifier"),
        F.when(F.col("n_regionkey") < 3, F.lit("unit@example.org")).alias("email"),
    )
    allowed = (
        c.where(F.col("c_acctbal") > 0).select(pid.alias("id"))
        .unionByName(n.where(F.col("n_regionkey") < 3).select(uid.alias("id")))
    )
    oc = o.join(c, o.o_custkey == c.c_custkey)
    resources = oc.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("identifier"),
        F.lit("MergedResource").alias("entity_type"),
        F.array(pid).alias("contact"),
        F.array(pid, F.lit("c-ghost")).alias("contributor"),
        F.array(pid).alias("creator"),
        nul.alias("editor"),
        nul.alias("editorOfSeries"),
        nul.alias("hasDataSubject"),
        F.array(uid_of_cust).alias("unitInCharge"),
    )
    consents = c.select(
        F.concat(F.lit("k"), F.col("c_custkey").cast("string")).alias("identifier"),
        F.lit("MergedConsent").alias("entity_type"),
        nul.alias("contact"),
        nul.alias("contributor"),
        nul.alias("creator"),
        nul.alias("editor"),
        nul.alias("editorOfSeries"),
        F.array(pid).alias("hasDataSubject"),
        nul.alias("unitInCharge"),
    )
    biblio = oc.where(F.col("o_orderkey") % 3 == 0).select(
        F.concat(F.lit("b"), F.col("o_orderkey").cast("string")).alias("identifier"),
        F.lit("MergedBibliographicResource").alias("entity_type"),
        nul.alias("contact"),
        nul.alias("contributor"),
        F.array(pid).alias("creator"),
        F.array(pid, F.lit("c-ghost")).alias("editor"),
        nul.alias("editorOfSeries"),
        nul.alias("hasDataSubject"),
        nul.alias("unitInCharge"),
    )
    items = resources.unionByName(consents).unionByName(biblio)
    out, broken = rewrite_actor_references(
        items,
        person_bearing_specs(
            "MergedResource", "MergedConsent", "MergedBibliographicResource"
        ),
        allowed,
        unit_ids_per_person(persons, units),
        ["cp-fallback"],
    )
    bc = broken.groupBy("identifier").agg(F.count(F.lit(1)).alias("_nb"))
    return out.join(bc, "identifier", "left").select(
        "identifier",
        "entity_type",
        F.concat_ws(",", "contact").alias("contact"),
        F.concat_ws(",", "contributor").alias("contributor"),
        F.concat_ws(",", "creator").alias("creator"),
        F.concat_ws(",", "editor").alias("editor"),
        F.concat_ws(",", "editorOfSeries").alias("editor_of_series"),
        F.concat_ws(",", "hasDataSubject").alias("has_data_subject"),
        F.concat_ws(",", "unitInCharge").alias("unit_in_charge"),
        F.coalesce(F.col("_nb"), F.lit(0)).cast("long").alias("broken_fields"),
    )


@q(
    "n2_multi_source_union",
    "§3.2 all_extractors composition: two heterogeneous sources → "
    "common model (deterministic identity) → ONE shared get-or-create "
    "org dimension → union; same org key from different sources "
    "resolves to the same minted id",
    f"""
    WITH orgs AS (
      SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS org_key,
             CASE WHEN n_regionkey < 2
                  THEN {_stable_id_sql("'org-pre'", "'n' || CAST(n_nationkey AS VARCHAR)")}
                  ELSE {_stable_id_sql("'org'", "'n' || CAST(n_nationkey AS VARCHAR)")}
             END AS org_id
      FROM nation
    ), src AS (
      SELECT 'crm' AS ps, CAST(c_custkey AS VARCHAR) AS nk, c_name AS title,
             'n' || CAST(c_nationkey AS VARCHAR) AS org_key
      FROM customer
      UNION ALL
      SELECT 'hr', CAST(s_suppkey AS VARCHAR), s_name,
             'n' || CAST(s_nationkey AS VARCHAR)
      FROM supplier
    )
    SELECT {_stable_id_sql("'identifier'", "ps", "nk")} AS identifier,
           {_stable_id_sql("'stableTargetId'", "ps", "nk")} AS stable_target_id,
           ps AS had_primary_source,
           nk AS identifier_in_primary_source,
           title AS title_text,
           o.org_id AS org_id
    FROM src JOIN orgs o USING (org_key)
    """,
)
def n2_multi_source_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.functions.ids import stable_id
    from mex_extractors_spark.plans.compose import SourceSpec, compose_sources

    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    org_of = lambda k: F.concat(F.lit("n"), F.col(k).cast("string"))  # noqa: E731
    crm = c.select(
        F.col("c_custkey").alias("proj_id"),
        F.col("c_name").alias("proj_name"),
        org_of("c_nationkey").alias("org"),
    )
    hr = s.select(
        F.col("s_suppkey").alias("code"),
        F.col("s_name").alias("label"),
        org_of("s_nationkey").alias("owner_org"),
    )
    org_key = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    org_dim = n.where(F.col("n_regionkey") < 2).select(
        org_key.alias("org_key"),
        stable_id(F.lit("org-pre"), org_key).alias("org_id"),
    )
    items, _dim = compose_sources(
        [
            (crm, SourceSpec("crm", "proj_id", "proj_name", "org")),
            (hr, SourceSpec("hr", "code", "label", "owner_org")),
        ],
        org_dim,
    )
    return items.select(
        "identifier",
        F.col("stableTargetId").alias("stable_target_id"),
        F.col("hadPrimarySource").alias("had_primary_source"),
        F.col("identifierInPrimarySource").alias("identifier_in_primary_source"),
        "title_text",
        "org_id",
    )


# -------------------------------------------------------- text analysis


@q(
    "t1_token_stats",
    "token counting: whitespace + BPE-ish regex",
    f"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{T.TOKEN_RE}')) AS BIGINT) AS n_re_tokens
    FROM documents
    """,
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_ws_tokens"),
        T.regex_token_count("text").alias("n_re_tokens"),
    )


@q(
    "t2_quality_scores",
    "document quality scoring (length/alpha/punct/stopword ratios)",
    """
    SELECT doc_id,
      round(
        0.25 * least(length(text) / 500.0, 1.0)
      + 0.35 * (CASE WHEN length(text) = 0 THEN 0.0
                ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) END)
      + 0.2 * (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
               ELSE length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) * 1.0 / length(text) END) * 5.0, 1.0))
      + 0.2 * least((CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) = 0 THEN 0.0
               ELSE len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                        t -> t IN ('the','and','of','is','to','a'))) * 1.0
                     / len(regexp_split_to_array(trim(text), '\\s+')) END) * 5.0, 1.0),
      6) AS quality
    FROM documents
    """,
)
def t2_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score("text").alias("quality"))


@q(
    "t3_lang_id",
    "n-gram heuristic language identification (argmax CASE cascade "
    "generated from the same LANG_MARKERS table the engine uses)",
    _t3_oracle(),
)
def t3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.detect_lang("text").alias("detected_lang"))


@q(
    "t4_fingerprint",
    "document fingerprint: min-md5 over k-gram shingles",
    """
    SELECT doc_id,
           list_min([md5(substr(norm, i, 8))
                     for i in generate_series(1, greatest(length(norm) - 7, 1))]) AS fp
    FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
          FROM documents)
    """,
)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint("text", k=8).alias("fp"))


@q(
    "t8_pii_redaction",
    "PII scrub: emails / IPv4 / long digit runs replaced with typed "
    "placeholders, one codegen'd regexp_replace chain (reference regex "
    "scrubbing loops, SURVEY.md C2/C6, at corpus scale)",
    """
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,}|([0-9]{1,3}\\.){3}[0-9]{1,3})',
                 '<EMAIL>', 'g'),
               '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
             '[0-9]([ .-]?[0-9]){8,}', '<NUM>', 'g') AS clean
    FROM documents
    """,
)
def t8_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import redact_pii

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", redact_pii("text").alias("clean"))


@q(
    "t9_hash_sample",
    "deterministic corpus sampling: keep rows whose md5(id) hex prefix "
    "sorts below a cutoff — reproducible across re-runs, partitionings "
    "and engines, unlike rand(seed) (artificial/main.py:22-33 seed "
    "discipline, scaled)",
    """
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
    """,
)
def t9_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import hash_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    return hash_sample(d, "doc_id", "28")


@q(
    "t10_shard_packing",
    "token-budget shard packing: shard = floor(exclusive cumulative "
    "cost / budget) in deterministic id order — computed as a "
    "DISTRIBUTED prefix sum (per-range-bucket windows + an offsets "
    "window over ~n_buckets rows), never a single-partition global "
    "sort; the oracle states the equivalent global window",
    """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS cost,
           CAST(floor((cum - n_chars) / 50000.0) AS BIGINT) AS shard
    FROM (SELECT doc_id, n_chars,
                 SUM(n_chars) OVER (ORDER BY doc_id) AS cum
          FROM documents)
    """,
)
def t10_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import pack_shards

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("cost")
    )
    return pack_shards(d, "doc_id", "cost", budget=50_000, range_width=500).select(
        "doc_id", "cost", "shard"
    )


@q(
    "t15_sequence_packing",
    "GPT-pretraining sequence packing (concat-and-chunk): the corpus as "
    "one token stream in doc_id order, chunked into fixed-length "
    "training sequences, documents straddling boundaries — per doc: "
    "stream offset, first/last sequence id, in-sequence offset, span "
    "count; same distributed prefix-sum kernel as t10 (the only "
    "shuffle), arithmetic after",
    """
    SELECT doc_id,
           CAST(cum - n_chars AS BIGINT) AS token_start,
           CAST((cum - n_chars) // 4096 AS BIGINT) AS seq_first,
           CAST((cum - 1) // 4096 AS BIGINT) AS seq_last,
           CAST((cum - n_chars) % 4096 AS BIGINT) AS seq_offset,
           CAST((cum - 1) // 4096 - (cum - n_chars) // 4096 + 1
                AS BIGINT) AS n_seqs
    FROM (SELECT doc_id, n_chars,
                 SUM(n_chars) OVER (ORDER BY doc_id) AS cum
          FROM documents
          WHERE n_chars > 0)
    """,
)
def t15_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import pack_sequences

    d = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0).select(
        "doc_id", F.col("n_chars").cast("long").alias("cost")
    )
    return pack_sequences(
        d, "doc_id", "cost", seq_len=4096, range_width=500
    ).select(
        "doc_id", "token_start", "seq_first", "seq_last", "seq_offset", "n_seqs"
    )


@q(
    "t11_vocab_build",
    "corpus vocabulary for tokenizer/BPE training: lowercase + "
    "non-alphanumeric split into adjacent bigrams (the unit a BPE merge "
    "ranks), per-unit tf + df, df-band filter (drop hapaxes and "
    "stop-word ubiquity), top-k by tf — explode rides map-side partial "
    "agg over the zipf head, orderBy+limit compiles to TakeOrdered (no "
    "global sort)",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ), toks AS (
      SELECT doc_id,
             unnest([t[i] || ' ' || t[i+1]
                     for i in generate_series(1, len(t) - 1)]) AS token
      FROM base WHERE len(t) >= 2
    ), stats AS (
      SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM toks GROUP BY token
    )
    SELECT token, tf, df FROM stats
    WHERE df >= 2 AND df <= 0.5 * (SELECT count(*) FROM documents)
    ORDER BY tf DESC, token LIMIT 200
    """,
)
def t11_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import vocab_build

    d = _t(spark, sf_dir, "documents")
    return vocab_build(
        d,
        "text",
        "doc_id",
        n_docs=d.count(),
        min_df=2,
        max_df_frac=0.5,
        top_k=200,
        ngram=2,
    )


@q(
    "t12_stratified_sample",
    "exact-quota stratified sampling: first 20 docs per language in "
    "md5(id) order, computed with a counts-derived prefilter + "
    "short-stratum fallback so the rank window sees ~margin*quota rows "
    "per stratum instead of the full corpus; the prefilter is "
    "result-invariant, so the oracle states the naive global window",
    """
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) WHERE rk <= 20
    """,
)
def t12_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import stratified_sample_exact

    d = _t(spark, sf_dir, "documents")
    return stratified_sample_exact(d, "lang", "doc_id", quota=20).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@q(
    "t13_corpus_mix",
    "training-data mixture sampling: a 60-row budget split 4:2:1:1 "
    "across four sources (largest-remainder rounding), each source's "
    "allocation taken deterministically in md5(id) order and capped at "
    "its population (src0's 30-row allocation meets only 25 docs) — "
    "per-source quotas ride the stratified two-scan prefilter plan; the "
    "oracle states the equivalent naive window with a CASE quota",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
    ) WHERE rk <= CASE source WHEN 'src0' THEN 30 WHEN 'src1' THEN 15
                              WHEN 'src2' THEN 8 ELSE 7 END
    """,
)
def t13_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.sampling import corpus_mix

    d = _t(spark, sf_dir, "documents")
    return corpus_mix(
        d,
        "source",
        "doc_id",
        weights={"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0},
        target_rows=60,
    ).select("doc_id", "source")


@q(
    "t14_unicode_nfc",
    "Unicode NFC normalization before hashing/dedup (no Spark builtin: "
    "Arrow-batched pandas UDF over Series.str.normalize — §2.10's "
    "sanctioned vectorized escape hatch); the corpus text is ASCII, so "
    "both sides append the same decomposed combining sequences "
    "(e+U+0301, o+U+0302, u+U+0308) and must collapse them identically "
    "— lengths shrink by exactly 3 code points",
    """
    WITH raw AS (
      SELECT doc_id,
             substr(text, 1, 40) || 'e' || chr(769) || 'o' || chr(770)
               || 'u' || chr(776) AS decomposed
      FROM documents
    )
    SELECT doc_id,
           nfc_normalize(decomposed) AS norm,
           length(decomposed)::BIGINT AS len_raw,
           length(nfc_normalize(decomposed))::BIGINT AS len_norm
    FROM raw
    """,
)
def t14_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.functions.text import nfc_normalize

    d = _t(spark, sf_dir, "documents")
    decomposed = F.concat(
        F.substring("text", 1, 40), F.lit("e\u0301o\u0302u\u0308")  # decomposed e/o/u + combining marks
    )
    raw = d.select("doc_id", decomposed.alias("decomposed"))
    # normalize ONCE, derive len_norm from the result: two nfc_normalize
    # expressions would cross the Arrow boundary twice per row
    return raw.select(
        "doc_id",
        nfc_normalize("decomposed").alias("norm"),
        F.length("decomposed").cast("long").alias("len_raw"),
    ).select(
        "doc_id", "norm", "len_raw", F.length("norm").cast("long").alias("len_norm")
    )


@q(
    "t6_repetition_signals",
    "Gopher-style repetition quality signals: duplicate-token fraction "
    "(pure expression) + top-bigram occupancy (explode → two partial-"
    "aggregated shuffles keyed by doc id, the shingle-pipeline shape)",
    """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n FROM base
    ), bgc AS (
      SELECT doc_id, b, count(*) AS c FROM (
        SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                               for i in generate_series(1, n - 1)]) AS b
        FROM sized WHERE n >= 2)
      GROUP BY doc_id, b
    ), top AS (
      SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS f
      FROM bgc GROUP BY doc_id
    )
    SELECT sized.doc_id,
           CASE WHEN n = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(t)) * 1.0 / n, 6)
           END AS dup_token_fraction,
           coalesce(top.f, 0.0) AS top_bigram_fraction
    FROM sized LEFT JOIN top ON sized.doc_id = top.doc_id
    """,
)
def t6_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    rep = d.select(
        "doc_id", T.dup_token_fraction("text").alias("dup_token_fraction")
    )
    return rep.join(T.top_bigram_fraction(d), "doc_id")


# -------------------------------------------------------------- dedup

@q(
    "d1_exact_duplicates",
    "exact dedup: sha256 hash-groupBy duplicate groups",
    """
    SELECT sha256(props) AS text_sha256, count(*) AS dup_count,
           min(event_id) AS keep_id
    FROM events WHERE props IS NOT NULL
    GROUP BY sha256(props) HAVING count(*) > 1
    """,
)
def d1_exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    groups = dedup.exact_duplicates(ev, text_col="props", id_col="event_id")
    return groups.select("text_sha256", "dup_count", "keep_id")


@q(
    "d2_ngram_jaccard",
    "n-gram jaccard near-dup pair scoring (explode + equi-join), "
    "stop-shingle guard ON (document-frequency cutoff keeps the join "
    "linear in corpus size; the oracle mirrors the same cutoff)",
    _jaccard_pairs_oracle(k=16, threshold=0.5, max_shingle_df=100),
)
def d2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        d, text_col="text", id_col="doc_id", k=16, threshold=0.5, max_shingle_df=100
    )


@q(
    "d6_dedup_components",
    "connected components over the near-dup pair graph (survivor "
    "selection): iterative min-label propagation to fixpoint, edges "
    "from the d2 jaccard pairs; oracle = recursive transitive closure",
    _d6_oracle(k=16, threshold=0.5, max_shingle_df=100),
)
def d6_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        d, text_col="text", id_col="doc_id", k=16, threshold=0.5, max_shingle_df=100
    )
    return dedup.dedup_components(d, pairs)


@q(
    "d7_incremental_neardup",
    "INCREMENTAL near-dup at lake scale: the corpus's MinHash band keys "
    "live in a persistent (term, doc_id) index maintained over the CDF "
    "(lake/index.py + minhash_band_terms, built here in two refreshes: "
    "full at v1, diff at v2); a new batch probes the index and "
    "exact-verifies only candidates — the corpus is never re-LSHed. "
    "The oracle is the EXACT cross-set jaccard pair set, so equality "
    "proves both total LSH recall (d3's regime: k=12, 4x4 bands) and "
    "the maintained index's correctness",
    """
    WITH sets AS (
      SELECT doc_id,
             list_distinct([substr(text, i, 12)
                            for i in generate_series(1, greatest(length(text) - 11, 1))]) AS sh
      FROM documents
    ), ex AS (SELECT doc_id, unnest(sh) AS s FROM sets),
    szs AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    exn AS (SELECT ex.doc_id, szs.n, ex.s FROM ex JOIN szs USING (doc_id))
    SELECT l.doc_id + 10000 AS id_a, r.doc_id AS id_b,
           round(count(*) * 1.0 /
                 (any_value(l.n) + any_value(r.n) - count(*)), 6) AS jaccard
    FROM exn l JOIN exn r ON l.s = r.s
    WHERE l.doc_id % 7 = 3
    GROUP BY l.doc_id, r.doc_id
    HAVING round(count(*) * 1.0 /
                 (any_value(l.n) + any_value(r.n) - count(*)), 6) >= 0.5
    """,
)
def d7_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lake built in two halves with a band-key index refresh
    after each (full build, then CDF diff); the probe batch re-uses
    corpus texts under shifted ids, so every batch doc has at least its
    identical twin in the corpus (jaccard 1.0) plus whatever genuine
    near-dups exist across the set."""
    import os

    from mex_extractors_spark.lake.index import refresh_inverted_index
    from mex_extractors_spark.lake.table import LakeTable

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.col("doc_id").cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    mid = docs.agg(F.max("doc_id")).first()[0] // 2
    base = _scratch_dir(sf_dir, "d7_neardup")
    corpus = LakeTable(os.path.join(base, "src"), num_buckets=4, key_cols=["doc_id"])
    index = LakeTable(
        os.path.join(base, "idx"), num_buckets=4,
        key_cols=["term", "doc_id"], seq_col="_src_version",
    )

    def terms(df):
        return dedup.minhash_band_terms("text", num_hashes=16, bands=4, k=12)

    def bulk(df):
        return dedup.minhash_band_pairs(
            df, "text", "doc_id", num_hashes=16, bands=4, k=12
        )

    corpus.apply_batch(spark, docs.where(F.col("doc_id") <= mid), "d7-b1")
    # full build takes the bulk explode+agg path; the diff keeps the
    # row-local terms (equivalence pinned in test_index.py)
    refresh_inverted_index(spark, corpus, index, terms, bulk_pairs_fn=bulk)
    corpus.apply_batch(spark, docs.where(F.col("doc_id") > mid), "d7-b2")
    refresh_inverted_index(spark, corpus, index, terms, bulk_pairs_fn=bulk)
    batch = docs.where(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 10000).cast("long").alias("doc_id"), "text"
    )
    return dedup.probe_near_duplicates(
        spark, index, corpus, batch,
        text_col="text", id_col="doc_id",
        threshold=0.5, num_hashes=16, bands=4, k=12,
    )


@q(
    "d3_minhash_lsh_neardup",
    "MinHash+LSH near-dup (shingle→minhash→band→bucket-join); the "
    "oracle is the EXACT k=12 jaccard pair set — equality proves LSH "
    "recall is total on this corpus (candidates are already verified "
    "with exact jaccard, so precision is 1 by construction)",
    _jaccard_pairs_oracle(k=12, threshold=0.5, max_shingle_df=None),
)
def d3_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # 4 bands × 4 rows: band-collision prob = j^4 (tight enough that
    # same-vocabulary corpora don't flood the verify join); k=12 shingles
    # push baseline jaccard of unrelated docs down
    return dedup.minhash_near_duplicates(
        d, text_col="text", id_col="doc_id", threshold=0.5, num_hashes=16, bands=4, k=12
    )


@q(
    "d4_simhash_neardup",
    "SimHash near-dup with pigeonhole chunk bucketing (chunk count "
    "derived from the hamming budget); oracle = brute-force all-pairs "
    "hamming over the same md5-based simhash, so equality proves the "
    "bucketing's recall contract",
    _simhash_pairs_oracle(max_hamming=6),
)
def d4_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(
        d,
        text_col="text",
        id_col="doc_id",
        max_hamming=6,
        token_hash=hashing.md5_long60,
    )


@q(
    "d5_embedding_cosine_pairs",
    "embedding-cosine near-dup, brute-force exact (baseline)",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
             AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
           * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.45
    """,
)
def d5_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = similarity.cosine(F.col("_va"), F.col("_vb"))
    return pairs.select("id_a", "id_b", F.round(sim, 6).alias("cosine_sim")).where(
        sim >= 0.45
    )


@q(
    "d5b_embedding_lsh_neardup",
    "embedding-cosine near-dup, sign-LSH bucketed (scale path); "
    "planes are driver-computed literals, so the oracle reproduces the "
    "bucketing exactly (at scale pass num_planes=None to derive the "
    "plane count from corpus size — see derive_num_planes)",
    _d5b_oracle(threshold=0.45, num_planes=6),
)
def d5b_embedding_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return similarity.pairwise_cosine_near_duplicates(
        e, threshold=0.45, num_planes=6
    )


# ---------------------------------------------------------- similarity


@q(
    "sim1_cosine_topk",
    "brute-force cosine top-k to a fixed query vector",
    """
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], q)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q, q))), 6) AS cosine_sim
    FROM embeddings, (SELECT [CAST(((i * 37) % 19) - 9 AS DOUBLE) / 10.0
                              for i in generate_series(0, 63)] AS q)
    ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
    """,
)
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qvec = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    return similarity.cosine_topk(e, qvec, k=10)


@q(
    "sim2_ann_lsh_topk",
    "ANN: sign-LSH bucketed top-k (approximate scale path); the probe "
    "bucket set and planes are driver-computed literals embedded in "
    "both the plan and the oracle, so the approximate result is still "
    "exactly reproducible",
    _sim2_oracle([((i * 37) % 19 - 9) / 10.0 for i in range(64)], k=10, num_planes=6),
)
def sim2_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qvec = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    return similarity.ann_lsh_topk(e, qvec, k=10, num_planes=6)


@q(
    "sim5_ivf_topk",
    "IVF nprobe search: probe the nearest inverted lists, exact cosine "
    "top-k within — the recall/cost dial of IVF indexes; probe ids are "
    "driver-computed literals so the candidate filter pushes down",
    _sim5_oracle([((i * 37) % 19 - 9) / 10.0 for i in range(64)], k=10,
                 num_centroids=8, nprobe=3),
)
def sim5_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qvec = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    return similarity.ivf_topk(e, qvec, k=10, num_centroids=8, nprobe=3)


@q(
    "sim6_ivf_indexed_topk",
    "PERSISTED IVF index (lake/ann.py): assignments materialized once "
    "as a covering LakeTable, files sort-clustered by centroid_id so "
    "the probe read PRUNES to ~nprobe/num_centroids of the files "
    "(stats-sidecar skipping) — the 100 TB replacement for sim5's "
    "inline re-assignment; same closed-form oracle as sim5",
    _sim5_oracle([((i * 37) % 19 - 9) / 10.0 for i in range(64)], k=10,
                 num_centroids=8, nprobe=3),
)
def sim6_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    from mex_extractors_spark.lake.ann import IvfIndex

    e = _t(spark, sf_dir, "embeddings")
    qvec = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    # per-(sf_dir, pid) scratch dir: concurrent evaluators (parity
    # pytest next to the correctness driver) must not rmtree each
    # other's live index; reuse within one process keeps the build
    # idempotent (applied-batch no-op), and atexit reclaims the disk.
    # The returned DataFrame lazily scans these files, so cleanup must
    # outlive the caller's collect — process exit, not function exit.
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"ivf_idx_{tag}_{os.getpid()}"
    )
    if not os.path.exists(idx_dir):
        atexit.register(shutil.rmtree, idx_dir, ignore_errors=True)
    idx = IvfIndex(idx_dir, num_buckets=4)
    idx.build(spark, e, num_centroids=8)
    return idx.topk(spark, qvec, k=10, nprobe=3)


@q(
    "sim3_ivf_assignments",
    "IVF coarse quantization: centroid assignment via broadcast join; "
    "centroids = md5-smallest ids (md5 is engine-independent), argmin "
    "ties broken by centroid id — fully oracle-checkable",
    _sim3_oracle(num_centroids=8),
)
def sim3_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_assignments(e, num_centroids=8)


@q(
    "sim4_kmeans_refine",
    "IVF with TRAINED centroids: distributed Lloyd's k-means (assign via "
    "broadcast argmin, recompute via dim codegen'd avg aggregates in one "
    "groupBy — the MLlib shape); oracle unrolls both iterations as CTEs",
    _sim4_oracle(num_centroids=8, iterations=2, dim=64),
)
def sim4_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return similarity.kmeans_refine(e, num_centroids=8, iterations=2)


# ---------------------------------------------------------- normalization


@q(
    "n1_common_model_identity",
    "§1.1 deterministic identity + common-model normalization",
    """
    SELECT CAST(doc_id AS VARCHAR) AS identifierInPrimarySource,
           'documents-src' AS hadPrimarySource,
           sha256('identifier' || chr(31) || 'documents-src' || chr(31)
                  || CAST(doc_id AS VARCHAR)) AS identifier_sha,
           source AS source_system
    FROM documents
    """,
)
def n1_common_model_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    out = d.withColumns(
        {
            "identifierInPrimarySource": F.col("doc_id").cast("string"),
            "hadPrimarySource": F.lit("documents-src"),
        }
    ).withColumn(
        "identifier_sha",
        F.sha2(
            F.concat_ws(
                "\x1f",
                F.lit("identifier"),
                "hadPrimarySource",
                "identifierInPrimarySource",
            ),
            256,
        ),
    )
    return out.select(
        "identifierInPrimarySource",
        "hadPrimarySource",
        "identifier_sha",
        F.col("source").alias("source_system"),
    )


@q(
    "j5way_regional_revenue",
    "J1/J2 multi-join reordering (TPC-H Q5 shape): Catalyst reorders a "
    "6-table join, broadcasts every dim, shuffles only the fact agg",
    """
    SELECT n.n_name AS nation,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND s.s_nationkey = c.c_nationkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def j5way_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "ASIA")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(rev).alias("revenue_cents"), F.count(F.lit(1)).alias("n_items")
    )


@q(
    "subq_above_brand_avg",
    "decorrelated scalar subquery (parts above their brand's average "
    "retail price) — window-based, single shuffle on the group key",
    """
    SELECT p_partkey, p_brand,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
    FROM (
      SELECT p_partkey, p_brand, p_retailprice,
             avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
      FROM part
    ) WHERE p_retailprice > brand_avg
    """,
)
def subq_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .where(F.col("p_retailprice") > F.col("brand_avg"))
        .select(
            "p_partkey", "p_brand", _cents("p_retailprice").alias("price_cents")
        )
    )


@q(
    "a9_rollup_order_totals",
    "A9 grouping sets / rollup (absent in the reference, free in Spark): "
    "order totals by (status, priority) with subtotal and grand-total rows",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def a9_rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(_cents("o_totalprice")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "total_cents",
            "n_orders",
        )
    )


@q(
    "t7_decontamination",
    "benchmark decontamination: corpus docs sharing k-gram shingles "
    "with an eval set (broadcast distinct bench shingles, position-"
    "explode corpus, one count-distinct aggregate — no doc x doc join)",
    """
    WITH bsets AS (
      SELECT list_distinct([substr(text, i, 20)
                            for i in generate_series(1, greatest(length(text) - 19, 1))]) AS sh
      FROM documents WHERE doc_id % 50 = 0
    ), bsh AS (
      SELECT DISTINCT unnest(sh) AS s FROM bsets
    ), csets AS (
      SELECT doc_id,
             list_distinct([substr(text, i, 20)
                            for i in generate_series(1, greatest(length(text) - 19, 1))]) AS sh
      FROM documents WHERE doc_id % 50 <> 0
    ), csh AS (
      SELECT doc_id, unnest(sh) AS s FROM csets
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS matched_shingles
    FROM csh c JOIN bsh b ON c.s = b.s
    GROUP BY c.doc_id
    HAVING count(*) >= 1
    """,
)
def t7_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 50th document plays the benchmark/eval set; the rest is
    the training corpus. A corpus doc sharing any 20-gram with the
    benchmark is flagged with its distinct-match count (the planted
    near-duplicate pairs in the synthetic corpus guarantee hits)."""
    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 50 == 0)
    corpus = d.where(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(
        corpus, bench, text_col="text", id_col="doc_id", k=20, min_matches=1
    )

# ------------------------------------------------- paginated / scrape / sinks


@q(
    "s9_paginated_scan",
    "S9/S12 paginated bearer-token REST scan: count-probe then parallel "
    "page fan-out through mapInPandas, constant-interval retry on "
    "rate-limit (open_data/connector.py:29-72, blueant/connector.py:13-45)",
    """
    SELECT CAST(i AS BIGINT) AS id,
           'rec-' || CAST(i AS VARCHAR) AS title,
           CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 4) AS INT) AS INT) AS value,
           CAST(i % 7 AS BIGINT) AS grp
    FROM range(403) t(i)
    """,
)
def s9_paginated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.paginated import (
        EXPECTED_TOKEN,
        RECORD_SCHEMA,
        paginated_scan,
        synthetic_api_fetch,
        synthetic_api_total,
    )

    conf = {"bearer_token": EXPECTED_TOKEN, "page_size": 25, "n_records": 403}
    total = synthetic_api_total(conf)  # the size=1 count probe
    return paginated_scan(
        spark, synthetic_api_fetch, conf, RECORD_SCHEMA,
        total_records=total, page_size=25,
    )


@q(
    "s10_child_page_scan",
    "S10 until-empty child-page scan: O(log n) geometric page-count probe "
    "replaces the serial until-empty loop, then a second per-parent "
    "detail fan-out (confluence_vvt/extract.py:20-76)",
    """
    SELECT CAST(p AS BIGINT) AS parent_id,
           CAST(p * 10 + j AS BIGINT) AS child_id,
           md5(CAST(p AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS payload
    FROM range(137) t(p), range(1, 4) u(j)
    WHERE j <= p % 4
    """,
)
def s10_child_page_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.paginated import (
        CHILD_SCHEMA,
        EXPECTED_TOKEN,
        child_page_scan,
        paginated_scan,
        synthetic_child_fetch,
        synthetic_parent_ids,
    )

    conf = {"bearer_token": EXPECTED_TOKEN, "page_size": 100, "n_parents": 137}
    parents = paginated_scan(
        spark, synthetic_parent_ids, conf, "parent_id long", total_records=None
    )
    return child_page_scan(parents, synthetic_child_fetch, conf, CHILD_SCHEMA)


@q(
    "s11_html_scrape",
    "S11 HTML scrape as codegen'd expressions: index-page href harvest → "
    "per-item field-table parse, zero Python in the loop "
    "(datscha_web/connector.py:18-50, extract.py:18-31)",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS item_id,
           n_name AS name,
           CAST(n_regionkey AS INT) AS region
    FROM nation
    """,
)
def s11_html_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.functions.html import (
        extract_field,
        extract_item_urls,
        url_item_id,
    )

    nation = _t(spark, sf_dir, "nation")
    # synthesize the pages the reference would fetch: one index page with
    # one href per item, one field-table page per item
    index_html = nation.agg(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(
                    F.concat(
                        F.lit('<a href="item_show.php?id='),
                        F.col("n_nationkey").cast("string"),
                        F.lit('">x</a>'),
                    )
                )
            ),
        ).alias("html")
    )
    urls = index_html.select(
        F.explode(extract_item_urls("html")).alias("url")
    ).select(url_item_id("url").alias("item_id"))
    pages = nation.select(
        F.col("n_nationkey").cast("long").alias("item_id"),
        F.concat(
            F.lit('<table><td id="name">'), F.col("n_name"),
            F.lit('</td><td id="region">'), F.col("n_regionkey").cast("string"),
            F.lit("</td></table>"),
        ).alias("page_html"),
    )
    return urls.join(pages, "item_id").select(
        "item_id",
        extract_field("page_html", "name").alias("name"),
        extract_field("page_html", "region").cast("int").alias("region"),
    )


@q(
    "s19_debezium_envelope",
    "S19 binlog/WAL envelope normalization: Debezium JSON change "
    "envelopes (before/after images, c|r|u|d op codes, wrapped-or-flat "
    "payload nesting, lsn|pos|ts_ms seq derivation) AND Maxwell wire "
    "shape (type/data/ts/xid), compaction-tombstone drop, "
    "malformed/unknown-op quarantine -> flat (key..., op I/U/D, seq) "
    "change rows, pure from_json expressions (sources/cdc_envelope.py)",
    """
    WITH e AS (
      SELECT event_id, user_id, event_id * 13 + 100000 AS ts_ms,
             event_id % 20 AS h
      FROM events
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(CASE WHEN h BETWEEN 13 AND 15
                     THEN CASE WHEN event_id % 2 = 1 THEN user_id + 1000 END
                     ELSE user_id END AS BIGINT) AS user_id,
           CASE WHEN h BETWEEN 13 AND 15
                THEN CASE WHEN event_id % 2 = 1
                          THEN 'w_' || CAST(user_id % 89 AS VARCHAR) END
                ELSE 'v_' || CAST(user_id % 97 AS VARCHAR) END AS val,
           CASE WHEN h < 9 OR h = 16 THEN 'I'
                WHEN h < 13 THEN 'U' ELSE 'D' END AS op,
           CAST(CASE WHEN h BETWEEN 5 AND 8
                     THEN event_id * 3 * 65536 + event_id % 7
                     WHEN event_id % 4 IN (0, 1) THEN event_id * 7 + 1
                     WHEN event_id % 4 = 2 THEN event_id * 11 + 3
                     ELSE ts_ms * 1000 + event_id % 5 END AS BIGINT) AS seq
    FROM e
    WHERE h <= 16
    """,
)
def s19_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesizes the wire stream a binlog tailer would publish — every
    op class, both payload nestings, minimal-replica-identity deletes,
    all four seq sources (lsn / pos / Maxwell xid / ts fallback), the
    Maxwell type/data/ts/xid dialect (h in 5..8), plus tombstones /
    malformed JSON / unknown ops — then proves ``parse_cdc_envelope``
    inverts it: the oracle computes the expected flat change rows
    directly from the events table with no JSON anywhere."""
    from mex_extractors_spark.sources.cdc_envelope import parse_cdc_envelope

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    h = F.pmod(F.col("event_id"), F.lit(20))
    is_d = (h >= 13) & (h <= 15)
    after = F.struct(
        F.col("event_id"),
        F.col("user_id"),
        F.format_string("v_%d", F.pmod(F.col("user_id"), F.lit(97))).alias("val"),
    )
    before_full = F.struct(
        F.col("event_id"),
        (F.col("user_id") + 1000).alias("user_id"),
        F.format_string("w_%d", F.pmod(F.col("user_id"), F.lit(89))).alias("val"),
    )
    # minimal replica identity: the delete's before image carries only keys
    before_key = F.struct(
        F.col("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("string").alias("val"),
    )
    op_code = (
        F.when(h < 9, "c").when(h < 13, "u").when(h < 16, "d")
        .when(h == 16, "r").when(h == 19, "t")
    )
    m4 = F.pmod(F.col("event_id"), F.lit(4))
    source = F.struct(
        F.lit("postgresql").alias("connector"),
        F.when(m4 < 2, F.col("event_id") * 7 + 1).alias("lsn"),
        F.when(m4 == 2, F.col("event_id") * 11 + 3).alias("pos"),
    )
    env = F.struct(
        F.when(
            is_d,
            F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, before_key)
            .otherwise(before_full),
        ).alias("before"),
        F.when(~is_d, after).alias("after"),
        source.alias("source"),
        op_code.alias("op"),
        # synthetic wall-clock millis — tz-independent in both engines
        (F.col("event_id") * 13 + 100000).alias("ts_ms"),
        F.struct(
            F.pmod(F.col("event_id"), F.lit(5)).alias("total_order")
        ).alias("transaction"),
    )
    # Maxwell wire shape for h in 5..8 (still op I): the row in `data`,
    # op in `type`, ts in SECONDS, ordering from xid*2^16 + xoffset
    maxwell = F.struct(
        after.alias("data"),
        F.lit("insert").alias("type"),
        (F.col("event_id") + 1_400_000_000).alias("ts"),
        (F.col("event_id") * 3).alias("xid"),
        F.pmod(F.col("event_id"), F.lit(7)).alias("xoffset"),
    )
    value = (
        F.when(h == 17, F.lit(None).cast("string"))  # compaction tombstone
        .when(h == 18, F.lit('{"oops": '))  # malformed JSON
        .when((h >= 5) & (h <= 8), F.to_json(maxwell))  # Maxwell dialect
        .when(  # JsonConverter-with-schemas wrapped form
            F.pmod(F.col("event_id"), F.lit(3)) == 0,
            F.to_json(F.struct(env.alias("payload"))),
        )
        .otherwise(F.to_json(env))  # flat form
    )
    # the testdata parquet is a single split; a real binlog tail arrives
    # as many log segments — repartition stands in for that natural
    # source parallelism so the decode runs wide like it would at scale
    stream = ev.select(value.alias("value")).repartition(
        spark.sparkContext.defaultParallelism
    )
    changes, _quarantine = parse_cdc_envelope(
        stream,
        "event_id bigint, user_id bigint, val string",
        key_cols=["event_id"],
    )
    return changes


@q(
    "cdc_envelope_replay",
    "production-shape flagship: Debezium envelope FILES on disk -> one "
    "scan+from_json decode (fused, sources/cdc_envelope.py) -> "
    "exactly-once batched replay (streaming/replay.py) -> predicate "
    "DML purge coexisting on the same lake table -> converged state. "
    "The full binlog-tail->lake pipeline as one driver row",
    """
    WITH state AS (
      SELECT user_id, event_id, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT user_id, CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type
    FROM state WHERE event_type <> 'purchase'
    """,
)
def cdc_envelope_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end production shape: the events table becomes the wire
    stream a binlog tailer would publish (Debezium JSON envelopes,
    wrapped-or-flat nesting, minimal-replica-identity deletes, lsn seq),
    written to disk as text segments and read back through a REAL scan —
    ``parse_cdc_envelope`` is pure ``from_json`` expressions, so the
    decode fuses into the scan stage (plan-gated in
    test_cdc_envelope.py::test_envelope_replay_decode_fused). The flat
    change rows replay through ``ReplayEngine`` in four seq-range
    micro-batches (ledger-fenced exactly-once), then a predicate DELETE
    purges 'purchase' rows — DML coexisting with CDC ingest on one
    table. The oracle recomputes the converged state from the raw
    events with no JSON anywhere: latest event per user wins, a latest
    'error' tombstones, purged type excluded."""
    from mex_extractors_spark.sources.cdc_envelope import parse_cdc_envelope
    from mex_extractors_spark.streaming.replay import ReplayEngine

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    is_d = F.col("event_type") == "error"
    after = F.struct(F.col("user_id"), F.col("event_type"))
    # minimal replica identity: the delete's before image carries keys only
    before_key = F.struct(
        F.col("user_id"), F.lit(None).cast("string").alias("event_type")
    )
    env = F.struct(
        F.when(is_d, before_key).alias("before"),
        F.when(~is_d, after).alias("after"),
        F.struct(
            F.lit("postgresql").alias("connector"),
            F.col("event_id").cast("long").alias("lsn"),
        ).alias("source"),
        F.when(is_d, "d")
        .when(F.pmod(F.col("event_id"), F.lit(2)) == 0, "c")
        .otherwise("u")
        .alias("op"),
    )
    value = F.when(  # JsonConverter-with-schemas wrapped form, 1 in 3
        F.pmod(F.col("event_id"), F.lit(3)) == 0,
        F.to_json(F.struct(env.alias("payload"))),
    ).otherwise(F.to_json(env))
    # the tail arrives as many log segments on disk — a real scan, so
    # the from_json decode has a scan stage to fuse into
    src = _scratch_dir(sf_dir, "cdc_env_src")
    ev.select(value.alias("value")).repartition(
        spark.sparkContext.defaultParallelism
    ).write.text(src)
    stream = spark.read.text(src)
    changes, _quarantine = parse_cdc_envelope(
        stream, "user_id bigint, event_type string", key_cols=["user_id"]
    )
    # the testdata's event_id (= the envelope lsn = seq) starts at 0 —
    # replaying from 1 would silently drop event 0's change row
    mn, mx = (
        int(v)
        for v in ev.agg(F.min("event_id"), F.max("event_id")).first()
    )
    table = _scratch_lake(sf_dir, "cdc_env_lake")
    ReplayEngine(table).replay(
        spark, changes, mn, mx, batch_size=max(1, -(-(mx - mn + 1) // 4))
    )
    table.delete_where(spark, [("event_type", "=", "purchase")], "purge-purchase")
    return table.read(spark).select(
        "user_id",
        F.col("seq").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@q(
    "k3_group_reports",
    "K3 per-group report sink: groupBy(group).applyInPandas renders and "
    "writes each group's file on the executor; only a (file_name, n_rows, "
    "sha256) manifest returns (sinks/s3.py:136-193)",
    """
    WITH body AS (
      SELECT n_regionkey AS grp,
             count(*) AS n_rows,
             'name,region' || chr(10) ||
             string_agg(n_name || ',' || CAST(n_regionkey AS VARCHAR),
                        chr(10) ORDER BY n_name) AS content
      FROM nation GROUP BY n_regionkey
    )
    SELECT 'nation_' || CAST(grp AS VARCHAR) || '.csv' AS file_name,
           n_rows, sha256(content) AS content_sha256
    FROM body
    """,
)
def k3_group_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from mex_extractors_spark.sinks.report import write_group_reports

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = os.path.join(tempfile.gettempdir(), f"k3_reports_{tag}")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("long").alias("region"),
    )
    return write_group_reports(
        nation, out_dir, group_col="region", entity_name="nation",
        row_cols=["name", "region"], order_col="name",
    )


@q(
    "k6_consent_emails",
    "K6 consent-email sink transform: in-domain address filter → "
    "array_join To: field → template fill, all codegen'd expressions "
    "(consent_mailer/transform.py:15-61)",
    """
    SELECT lower(replace(c_name, '#', '-')) || '@rki.de' AS to_field,
           'Your consent is required' AS subject,
           'Dear ' || c_name || ', please confirm your consent to be listed.'
             AS body
    FROM customer WHERE c_custkey % 3 <> 0
    """,
)
def k6_consent_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sinks.mailer import consent_emails

    slug = F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("-")))
    persons = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.array(
            F.concat(slug, F.lit("@example.org")),
            F.concat(
                slug,
                F.when(F.col("c_custkey") % 3 == 0, F.lit("@other.de")).otherwise(
                    F.lit("@rki.de")
                ),
            ),
        ).alias("emails"),
    )
    return consent_emails(persons)


# ------------------------------------------------- long-tail §2 rows (round 4)
#
# These give the last COVERAGE.md rows that were pytest-only a driver-checkable
# oracle query each: A7, F13, S6, C10, C17, S13, S18.


@q(
    "a7_outbound_connections",
    "A7 outbound-connection count: non-null reference fields per row "
    "(utils.py:18-28), aggregated into a histogram",
    """
    SELECT CAST((CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
              + (CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
            AS INT) AS n_refs,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def a7_outbound_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.aggregates import outbound_connection_count

    o = _t(spark, sf_dir, "orders").withColumns(
        {
            # nullable "reference" fields derived from the testdata: the
            # operator itself is the null-aware counting expression
            "ref_cust": F.col("o_custkey").cast("string"),
            "ref_status": F.nullif(F.col("o_orderstatus"), F.lit("F")),
            "ref_prio": F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
        }
    )
    return (
        o.select(
            outbound_connection_count("ref_cust", "ref_status", "ref_prio").alias(
                "n_refs"
            )
        )
        .groupBy("n_refs")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "f13_author_cutoff",
    "F13 author-count cutoff: drop records with too many authors "
    "(endnote/extract.py:36-44)",
    """
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_authors
    FROM documents WHERE len(string_split(text, ' ')) < 40
    """,
)
def f13_author_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.filters import author_count_cutoff

    d = _t(spark, sf_dir, "documents").withColumn(
        "authors", F.split(F.col("text"), " ")
    )
    return author_count_cutoff(d, "authors", 40).select(
        "doc_id", F.size("authors").alias("n_authors")
    )


@q(
    "s6_xml_roundtrip",
    "S6 XML record parse (from_xml) proven as the inverse of a rendered "
    "XML payload column (open_data/extract.py rowTag scan semantics)",
    """
    SELECT o_orderkey AS id, o_orderstatus AS status, o_orderpriority AS prio
    FROM orders
    """,
)
def s6_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.readers import parse_xml_column

    raw = _t(spark, sf_dir, "orders").select(
        F.format_string(
            "<rec><id>%d</id><status>%s</status><prio>%s</prio></rec>",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        ).alias("raw")
    )
    parsed = parse_xml_column(raw, "raw", "id BIGINT, status STRING, prio STRING")
    return parsed.select("parsed.id", "parsed.status", "parsed.prio")


@q(
    "c10_path_to_uri",
    "C10 windows-path → file URI normalization "
    "(synopse/transform.py:617-625 PureWindowsPath.as_uri)",
    """
    SELECT doc_id,
           'file:///C:/data/' || source || '/' || doc_id || '.txt' AS win_uri,
           'file:///srv/' || source || '/' || doc_id || '.txt' AS posix_uri
    FROM documents
    """,
)
def c10_path_to_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.normalize import windows_path_to_uri

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    win = F.concat(F.lit("C:\\data\\"), F.col("source"), F.lit("\\"), sid, F.lit(".txt"))
    posix = F.concat(F.lit("/srv/"), F.col("source"), F.lit("/"), sid, F.lit(".txt"))
    return d.select(
        "doc_id",
        windows_path_to_uri(win).alias("win_uri"),
        windows_path_to_uri(posix).alias("posix_uri"),
    )


@q(
    "c17_person_parse",
    "C17 analyse_person_string: vectorized pandas-UDF person-string "
    "split into (surname, givenname) pairs (synopse/extract.py:118-124)",
    """
    SELECT c_custkey, 0 AS person_idx, c_name AS surname,
           CAST('Ada' AS VARCHAR) AS givenname
    FROM customer
    UNION ALL
    SELECT c_custkey, 1 AS person_idx, c_mktsegment AS surname,
           CAST('' AS VARCHAR) AS givenname
    FROM customer
    """,
)
def c17_person_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.normalize import analyse_person_string

    # controlled two-person strings: titles stripped, "given surname" and a
    # bare single-token name — the irregular edge cases live in unit tests,
    # this row proves the UDF's batch plumbing + parse on 2x corpus rows
    c = _t(spark, sf_dir, "customer").withColumn(
        "person_str",
        F.concat(
            F.lit("Dr. Ada "), F.col("c_name"), F.lit(", Prof. "), F.col("c_mktsegment")
        ),
    )
    return c.select(
        "c_custkey", F.posexplode(analyse_person_string(F.col("person_str")))
    ).select(
        "c_custkey",
        F.col("pos").cast("int").alias("person_idx"),
        F.col("col.surname").alias("surname"),
        # single-token names parse to a null givenname; projected to '' so
        # the row set is totally ordered for the parity harness (the null
        # contract itself is unit-tested in test_functions.py)
        F.coalesce(F.col("col.givenname"), F.lit("")).alias("givenname"),
    )


_S13_SPEC = {
    "components": {
        "schemas": {
            "Pathogen": {
                "properties": {"id": {}, "name": {}, "family": {}},
                "required": ["id", "name"],
            },
            "ReportStatus": {"enum": ["open", "closed", "pending"]},
            "Untyped": {"description": "neither enum nor properties"},
            "Mixed": {"enum": ["a"], "properties": {"x": {}}, "required": ["x"]},
        }
    }
}


@q(
    "s13_openapi_classify",
    "S13 OpenAPI components.schemas classification into enum vs "
    "properties schema rows (igs/extract.py:31-46). Array columns are "
    "comma-joined to scalars for the driver harness (its pandas "
    "canonicalization cannot sort list cells — CORRECTNESS_r04's only "
    "err); the array-typed API itself is unit-tested in "
    "test_sources.py",
    """
    SELECT * FROM (VALUES
      ('Mixed', 'properties', 'x', 'x', ''),
      ('Pathogen', 'properties', 'family,id,name', 'id,name', ''),
      ('ReportStatus', 'enum', '', '', 'open,closed,pending')
    ) AS t(schema_name, kind, fields, required, enum_values)
    """,
)
def s13_openapi_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.openapi import openapi_schemas_df

    return openapi_schemas_df(spark, _S13_SPEC).select(
        "schema_name",
        "kind",
        F.array_join("fields", ",").alias("fields"),
        F.array_join("required", ",").alias("required"),
        F.array_join("enum_values", ",").alias("enum_values"),
    )


@q(
    "s18_mapping_rules",
    "S18 YAML mapping-rule engine: forValues→setValues conditional map "
    "with default, compiled to one codegen'd expression "
    "(seq_repo/transform.py:93-118, utils.py:12-15)",
    """
    SELECT c_custkey,
           CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY') THEN 'industrial'
                WHEN c_mktsegment = 'AUTOMOBILE' THEN 'mobility'
                ELSE 'general' END AS theme
    FROM customer
    """,
)
def s18_mapping_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.sources.mapping_rules import apply_mapping

    doc = {
        "fields": {
            "theme": {
                "fieldInPrimarySource": "c_mktsegment",
                "mappingRules": [
                    {"forValues": ["BUILDING", "MACHINERY"], "setValues": "industrial"},
                    {"forValues": ["AUTOMOBILE"], "setValues": "mobility"},
                    {"setValues": "general"},
                ],
            }
        }
    }
    return apply_mapping(_t(spark, sf_dir, "customer"), doc).select(
        "c_custkey", "theme"
    )


# ------------------------------------------------------------ temporal joins


@q(
    "j10_asof_join",
    "J10 as-of join (absent in reference — kdb aj / pandas merge_asof "
    "shape): each click enriched with the user's latest purchase at or "
    "before it. Union+running-window formulation: ONE shuffle on the "
    "key, no non-equi join, no range explosion (operators/asof.py)",
    """
    WITH p AS (SELECT user_id, ts, max(value) AS purchase_value
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id, ts),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts, p.purchase_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def j10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    # pre-aggregate: asof_join requires right-side (key, time) uniqueness
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(clicks, purchases, on="user_id", left_time="ts")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_matched").alias("purchase_ts"),
        "purchase_value",
    )


@q(
    "j11_interval_join",
    "J11 banded interval join (absent in reference): events assigned to "
    "the 1-hour session window opened by each signup. Banding turns the "
    "range join into an equi-join on (user, band) — never a nested loop "
    "(operators/asof.py)",
    """
    WITH s AS (SELECT event_id AS session_id, user_id,
                      ts AS session_start,
                      ts + INTERVAL 1 HOUR AS session_end
               FROM events WHERE event_type = 'signup'),
         e AS (SELECT user_id, ts, value FROM events
               WHERE event_type <> 'signup')
    SELECT s.session_id, count(*) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM e JOIN s ON e.user_id = s.user_id
                 AND e.ts BETWEEN s.session_start AND s.session_end
    GROUP BY s.session_id
    """,
)
def j11_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mex_extractors_spark.operators.asof import interval_join

    ev = _t(spark, sf_dir, "events")
    sessions = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("session_id"),
        "user_id",
        F.col("ts").alias("session_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("session_end"),
    )
    points = ev.filter(F.col("event_type") != "signup").select(
        "user_id", "ts", "value"
    )
    joined = interval_join(
        points,
        sessions,
        on="user_id",
        point_time="ts",
        start_col="session_start",
        end_col="session_end",
        band_seconds=3600.0,
    )
    return joined.groupBy("session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("value_cents"),
    )


@q(
    "cdc_metadata_snapshots",
    "Iceberg metadata tables: inspect('snapshots') over a 4-batch "
    "replay — version / parent / batch count / row count per retained "
    "snapshot, answered from the manifest without a data scan "
    "(lake/table.py inspect)",
    """
    WITH m AS (SELECT max(event_id) AS mx FROM events),
         vs AS (SELECT * FROM (VALUES (1), (2), (3), (4)) t(version)),
         pre AS (
           SELECT v.version AS version, e.user_id, e.event_type,
                  row_number() OVER (PARTITION BY v.version, e.user_id
                                     ORDER BY e.event_id DESC) rn
           FROM events e CROSS JOIN vs v CROSS JOIN m
           WHERE e.event_id <= (v.version * m.mx) // 4
         )
    SELECT CAST(version AS BIGINT) AS version,
           CAST(version - 1 AS BIGINT) AS parent_version,
           CAST(version AS BIGINT) AS n_batches,
           CAST(count(*) FILTER (WHERE rn = 1 AND event_type <> 'error')
                AS BIGINT) AS total_rows
    FROM pre GROUP BY version
    """,
)
def cdc_metadata_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ledger as a queryable DataFrame: replay the event stream in
    four equal seq-range batches, then answer "what snapshots exist and
    how did the table grow" from inspect('snapshots') alone. The oracle
    recomputes each snapshot's expected row count independently from
    the raw events (live keys at each seq prefix — copy-on-write totals
    equal state rows), so the manifest bookkeeping itself is what gets
    checked. Iceberg metadata-table analog; absent in the reference
    (mex-extractors keeps only the latest backend state)."""


    ev = _cdc_events(spark, sf_dir)
    mx = ev.agg(F.max("seq")).first()[0]
    table = _scratch_lake(sf_dir, "cdc_meta")
    # seq (= event_id) starts at 0 in the testdata: the first slice's
    # exclusive lower bound must sit BELOW it or event 0 never replays
    # (the oracle counts it; LWW only masks the loss when that user has
    # a later event)
    lo = -1
    for v in range(1, 5):
        hi = mx * v // 4
        table.apply_batch(
            spark,
            ev.where((F.col("seq") > lo) & (F.col("seq") <= hi)),
            f"md-b{v}",
        )
        lo = hi
    return table.inspect(spark, "snapshots").select(
        "version", "parent_version", "n_batches", "total_rows"
    )


# ---------------------------------------------------------------- driver window
#
# The correctness driver evaluates only the FIRST 50 entries of the registry
# (dict iteration order), so ordering is the gate.  Round-robin coverage note:
#   r1 window = first 43 in definition order; r2 window = first 50; r3 window
#   = never-driver-green first (all 50 rows green, see CORRECTNESS_r03.json).
#   r4 window (below): the queries r3 rotated OUT plus the round-4 additions
#   (sim6_ivf_indexed_topk, m1b_real_codec_features, and the seven long-tail
#   §2 rows a7/f13/s6/c10/c17/s13/s18) go first — after this round every
#   registered query has a driver-green row, and all but seven untouched
#   r1/r2-green rows have one within the last two rounds. The permanent
#   canaries (w1_lww_latest_event, cdc_converged_state, f4_first_wins_dedup)
#   stay in-window every round.
#   The remaining slots re-verify r3-green queries whose implementation
#   changed in round 4: the k-means recompute (sim3/sim4/sim5 share the
#   refactored assignment), the real-codec dispatch (m1), the XLSX writer
#   (s5/k3), and the file-stats pruning change in lake/stats.py (the whole
#   cdc read/skipping family). Queries outside the window stay covered every
#   run by tests/test_queries_parity.py at sf0.001.
#   Round-4 continuation: thirteen new never-checked queries (m1c/m2b
#   real PNG+AVI codecs, t11-t14 curation/normalization, d7 incremental
#   near-dup, cdc time-travel/schema-evolution/expire-vacuum, t5b/t5c
#   session+sliding windows) take the head slots and displace twelve
#   r3-green insurance re-checks past 50 (s5, k3, and the cdc_* rows
#   from cdc_stats_skipping_read onward) — each keeps its r3 driver row
#   + per-run pytest parity, so the "driver row within the last two
#   rounds" invariant holds for every registry entry. Every rotated
#   r1/r2-green entry (which NEEDS an r4 row for that invariant) sits
#   inside the first 50.
_DRIVER_WINDOW_PRIORITY = [
    # ROUND-5 WINDOW (executes the plan written at the end of round 4,
    # reconciled against CORRECTNESS_r04.json). Slots 1-12: the twelve
    # entries with NO driver row within the last two rounds —
    # s13_openapi_classify (r4 FAIL, scalar-projection fix this round),
    # j11_interval_join (never driver-checked), and the ten r2-green
    # rotations. Slot 13: the round-5 flagship addition. Slots 14-16:
    # the permanent canaries. Slots 17-50: r3-green re-checks — first
    # the paths whose code rounds 4/5 touched (prefix-sum kernel → t10,
    # subtree frontier type → f10, to_common_model null gate → n1/n2,
    # k-means/IVF assignment → sim*, codec dispatch → m1/m2, XLSX →
    # s5/k3, stats pruning → the cdc_* read family), then the dedup
    # family (d6 is this round's perf-A/B subject). Fifteen r3-green
    # entries whose code nothing touched since r3 rotate past 50 (j1,
    # a4, f9, t3, t8, t9, j5way, subq, a9, t7, s9, s10, s11, k6, j7b) —
    # each keeps its r3 driver row + per-run DuckDB parity via
    # tests/test_queries_parity.py; with 109+ registered queries and a
    # 50-slot window, 50/round is the coverage ceiling and the stale-
    # first rotation is what keeps every entry's last green row recent.
    "s13_openapi_classify",
    "j11_interval_join",
    "t1_token_stats",
    "t4_fingerprint",
    "t2_quality_scores",
    "j2_inner_skip_join",
    "a1_group_minmax",
    "u5_except_values",
    "c8_year_extract",
    "c_json_extract",
    "s4_style_scan",
    "u34_array_intersect_except",
    # round-5 addition — the production-shape flagship (envelope files
    # -> fused decode -> exactly-once replay -> coexisting DML)
    "cdc_envelope_replay",
    # permanent canaries
    "w1_lww_latest_event",
    "cdc_converged_state",
    "f4_first_wins_dedup",
    # r3-green re-checks, round-4/5-touched code paths first
    "t10_shard_packing",       # r5: prefix-sum kernel keeps source type
    "t15_sequence_packing",    # r5: same kernel (r4-green, re-verified)
    "f10_subtree_filter",      # r5: frontier type derived from edges
    "n1_common_model_identity",  # r5: to_common_model null-key gate
    "n2_multi_source_union",     # r5: same normalize path
    "sim4_kmeans_refine",      # r4: posexplode centroid recompute
    "sim3_ivf_assignments",
    "sim5_ivf_topk",
    "sim1_cosine_topk",
    "sim2_ann_lsh_topk",
    "m1_multimodal_features",  # r4: decode_features dispatch
    "m2_frame_sample_plan",
    "s5_excel_multisheet",     # r4: XLSX writer hardening
    "k3_group_reports",
    "cdc_stats_skipping_read",  # r4: file_may_match evidence intersection
    "cdc_bloom_point_lookup",
    "cdc_zorder_clustered_read",
    "cdc_wap_guarded_publish",
    "cdc_catalog_txn",
    "cdc_mor_converged_state",
    "cdc_changes_feed",
    "cdc_incremental_agg",
    "cdc_inverted_index",
    "k2_ndjson_export",
    # dedup family (d6 = this round's perf-A/B subject) + remaining
    # r3-green re-checks
    "d6_dedup_components",
    "d1_exact_duplicates",
    "d2_ngram_jaccard",
    "d3_minhash_lsh_neardup",
    "d4_simhash_neardup",
    "d5_embedding_cosine_pairs",
    "d5b_embedding_lsh_neardup",
    "t5_tumbling_window_counts",
    "t6_repetition_signals",
    "j7_reference_rewrite",
]


def _reorder_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"driver-window priority names not registered: {missing}")
    rest = [n for n in REGISTRY if n not in set(_DRIVER_WINDOW_PRIORITY)]
    ordered = {n: REGISTRY[n] for n in [*_DRIVER_WINDOW_PRIORITY, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle.strip()
        for name, qd in REGISTRY.items()
        if qd.oracle is not None
    }
