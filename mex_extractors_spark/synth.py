"""Deterministic synthetic data: repo-change event streams.

Mirrors the reference's seeded synthetic corpus discipline
(mex/extractors/artificial/main.py:22-33, faker ``seed=42``) but is
generated entirely with Spark column expressions over ``spark.range``,
so the same generator scales from 1e3 rows (unit tests) to 1e10 rows
(cluster benchmarks) with zero driver-side data.

Event shape (BASELINE input_hint / FIXTURES.md §2):
    seq:long, op:string(I/U/D), repo:string, path:string,
    commit:string(40-hex), lang:string(nullable), content:string

Properties:
- ``seq`` strictly increasing, the global LWW total order;
- ~60% I / 30% U / 10% D (I and U are both upserts under MERGE
  semantics; D on an absent key is a no-op — well-defined replay);
- zipf-ish repo skew: repo ids are log-uniform, so repo 0 is hot
  (top 1% of repos carry ~half the events) — exercises salting/AQE;
- ``commit`` / ``content`` are seeded hashes of (repo, path, seq):
  byte-reproducible across runs, the substrate for the per-row
  sha256 invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "rs", "go", "ts", "java", "md", "yaml"]
DEFAULT_SEED = 42


def _unit_hash(tag: str, seed: int) -> Column:
    """Deterministic uniform double in [0, 1) derived from (tag, seq, seed)."""
    h = F.xxhash64(F.lit(tag), F.col("seq"), F.lit(seed))
    return F.pmod(h, F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)


def events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 50,
    seed: int = DEFAULT_SEED,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate a deterministic change-event stream.

    Fully distributed: ``spark.range`` partitions the sequence space, and
    every column is a pure expression of ``seq`` — no shuffle, no driver
    data, safe at 1e10 rows.

    ``n_repos`` bounds the repo keyspace: the log-uniform derivation
    emits ids in ``[0, n_repos-2]`` (the zipf-ish density is the
    contract, not the exact cardinality — kept as-is deliberately so
    every pinned bench corpus across rounds regenerates byte-identical).
    """
    df = spark.range(1, n_events + 1, numPartitions=num_partitions).withColumnRenamed(
        "id", "seq"
    )

    # zipf-ish: log-uniform repo id => density ~ 1/x, repo 0 hottest
    u_repo = _unit_hash("repo", seed)
    repo_id = F.floor(F.exp(u_repo * F.log(F.lit(float(n_repos))))) - F.lit(1)
    repo = F.format_string("org-%d/repo-%d", (repo_id % 10).cast("int"), repo_id.cast("int"))

    path_id = F.pmod(F.xxhash64(F.lit("path"), F.col("seq"), F.lit(seed)), F.lit(paths_per_repo))
    path = F.format_string(
        "src/pkg_%d/mod_%d.py", (path_id % 8).cast("int"), path_id.cast("int")
    )

    op_h = F.pmod(F.xxhash64(F.lit("op"), F.col("seq"), F.lit(seed)), F.lit(100))
    op = F.when(op_h < 60, "I").when(op_h < 90, "U").otherwise("D")

    commit = F.sha1(F.concat_ws("|", repo, path, F.col("seq").cast("string")))

    lang_h = F.pmod(F.xxhash64(F.lit("lang"), F.col("seq"), F.lit(seed)), F.lit(100))
    lang = F.when(
        lang_h < 95,
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (lang_h % len(LANGS) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    base = F.sha2(F.concat_ws("|", repo, path, F.col("seq").cast("string"), F.lit(seed)), 256)
    body_reps = (F.pmod(F.xxhash64(F.lit("len"), F.col("seq"), F.lit(seed)), F.lit(4)) + 1).cast(
        "int"
    )
    content = F.when(
        op != "D",
        F.concat(
            F.lit("def fn_"),
            F.substring(base, 1, 8),
            F.lit("():\n    return '"),
            F.repeat(F.substring(base, 9, 32), body_reps),
            F.lit("'\n"),
        ),
    )

    return df.select(
        F.col("seq"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def with_duplicate_delivery(df: DataFrame, copies_mod: int = 3, seed: int = DEFAULT_SEED) -> DataFrame:
    """Redeliver a deterministic subset of events 1–3 times (at-least-once
    delivery). The engine's idempotent LWW apply must converge to the same
    table as the clean stream (FIXTURES.md §2 duplicated-delivery variant).
    """
    h = F.pmod(F.xxhash64(F.lit("dup"), F.col("seq"), F.lit(seed)), F.lit(copies_mod))
    once_more = df.where(h >= 1)
    twice_more = df.where(h >= 2)
    return df.unionAll(once_more).unionAll(twice_more)


def shuffled(df: DataFrame, seed: int = DEFAULT_SEED) -> DataFrame:
    """Bounded out-of-order delivery: scramble physical order, keep ``seq``.
    LWW by ``seq`` must re-establish the logical order."""
    return (
        df.withColumn("_r", F.xxhash64(F.col("seq"), F.lit(seed)))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, "_r")
        .sortWithinPartitions("_r")
        .drop("_r")
    )


def with_evolution_columns(df: DataFrame, size_type: str = "int") -> DataFrame:
    """Schema-evolution variant (FIXTURES.md §2): events after a cut-over
    carry ``content_sha`` (content-derived) and ``size_bytes`` — generated
    first as ``int`` and later widened to ``long`` to exercise the
    schema-merge step (SURVEY.md §7 Phase 4).

    Semantics match ``normalize_change_events`` for the same column
    names (NULL content → NULL sha; byte length via ``octet_length``) —
    evolution events merged without renormalization must not violate
    the table's documented sha/size invariants on multi-byte content.
    """
    return df.withColumns(
        {
            "content_sha": F.when(
                F.col("content").isNotNull(), F.sha2(F.col("content"), 256)
            ),
            "size_bytes": F.octet_length(F.col("content")).cast(size_type),
        }
    )
