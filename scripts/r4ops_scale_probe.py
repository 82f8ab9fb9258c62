#!/usr/bin/env python
"""Growth curves for the round-4 operators, one decade up (sf1-scale).

The per-round bench pins these at sf0.1 only; this probe measures how
their cost GROWS, which is the property that decides 100 TB viability:

- **d7 incremental near-dup** (`lake/index.py` + `probe_near_duplicates`):
  corpus N grows 10x (5k -> 50k docs, i.e. sf0.1 -> sf1) while the probe
  batch stays fixed at 500 docs. The claim to verify: probe cost is
  driven by the batch and its candidates, NOT the corpus — candidates
  per batch doc stay ~flat, probe wall grows far slower than N. The
  full index BUILD is allowed to be ~linear in N (it writes N rows).
- **sim6 IVF indexed top-k** (`lake/ann.py`): index N vectors, query
  top-10 at nprobe=2/16. The claim: the probe read stays pruned — files
  scanned ~ nprobe/num_centroids of the index regardless of N, query
  wall ~flat (driver-side centroid argmin + a pruned scan).
- **t15 sequence packing** (`operators/sampling.py: pack_sequences`):
  N grows 100x (5k -> 500k docs). The claim: one bucket-partitioned
  shuffle, wall ~linear (exponent ~<=1).
- **DML merge_into** (`lake/table.py`): state N grows 10x (100k -> 1M
  rows), merge source fixed at 500 rows. CoW honesty check: the
  rewrite is bounded by TOUCHED BUCKETS, so with a fixed 16-bucket
  layout the wall grows with bucket size — sublinear vs N only through
  manifest pruning of untouched buckets; at real scale the mitigation
  is more buckets (bounded bucket size) or merge-on-read. The probe
  records wall, matched counts, and files rewritten so the growth term
  is named, not guessed.

Growth exponents are log-log slopes between successive sizes. All
corpora are deterministic md5-expression synthetics (no external data,
no RNG). Writes BENCH/R4OPS_SCALE.md + BENCH/r4ops_scale.json.

Usage: python scripts/r4ops_scale_probe.py  (quiet box; ~10 min)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mex_extractors_spark.operators import dedup  # noqa: E402
from mex_extractors_spark.operators.sampling import pack_sequences  # noqa: E402
from mex_extractors_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(
    os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/spark-bench"), "r4ops"
)


def synth_docs(spark, n: int):
    """Deterministic corpus with built-in near-dup structure: every
    doc_id % 10 == 7 repeats its predecessor's 40-word text plus a tiny
    suffix (k=12 jaccard ~0.9), everything else is hash-unique."""
    base = F.when(
        F.pmod(F.col("id"), F.lit(10)) == 7, F.col("id") - 1
    ).otherwise(F.col("id"))
    words = [
        F.substring(
            F.md5(F.concat(F.lit(f"w{i}_"), (base * 7919 + i).cast("string"))),
            1,
            8,
        )
        for i in range(40)
    ]
    text = F.concat_ws(" ", *words)
    text = F.when(
        F.pmod(F.col("id"), F.lit(10)) == 7, F.concat(text, F.lit(" zz"))
    ).otherwise(text)
    return spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"), text.alias("text")
    )


def synth_vectors(spark, n: int, dim: int = 64, n_clusters: int = 32):
    """Clustered vectors: 32 md5-derived centroids + per-vector noise."""
    c = F.pmod(F.col("id"), F.lit(n_clusters)).cast("string")
    comps = []
    for i in range(dim):
        cent = (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"c{i}_"), c)), 1, 6), 16, 10)
            .cast("double")
            % 1000
        ) / 500.0 - 1.0
        noise = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"n{i}_"), F.col("id").cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("double")
            % 1000
        ) / 5000.0
        comps.append((cent + noise).cast("float"))
    return spark.range(n).select(
        F.col("id").cast("long").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, round(time.monotonic() - t0, 3)


def probe_d7(spark, n: int) -> dict:
    from mex_extractors_spark.lake.index import refresh_inverted_index
    from mex_extractors_spark.lake.table import LakeTable

    base = os.path.join(SCRATCH, f"d7_{n}")
    shutil.rmtree(base, ignore_errors=True)
    docs = synth_docs(spark, n).select(
        "doc_id", "text", F.col("doc_id").alias("seq"), F.lit("U").alias("op")
    )
    corpus = LakeTable(os.path.join(base, "src"), num_buckets=8, key_cols=["doc_id"])
    index = LakeTable(
        os.path.join(base, "idx"), num_buckets=8,
        key_cols=["term", "doc_id"], seq_col="_src_version",
    )
    corpus.apply_batch(spark, docs, f"d7s-{n}")

    def terms(df):
        return dedup.minhash_band_terms("text", num_hashes=16, bands=4, k=12)

    def bulk(df):
        return dedup.minhash_band_pairs(
            df, "text", "doc_id", num_hashes=16, bands=4, k=12
        )

    _, build_s = _timed(
        lambda: refresh_inverted_index(
            spark, corpus, index, terms, bulk_pairs_fn=bulk
        )
    )
    # fixed 500-doc probe batch: 250 twins of corpus docs (spread across
    # the corpus via modulo, so the twin COUNT stays fixed as N grows)
    # + 250 fresh docs
    batch = (
        spark.range(500)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.when(
                F.pmod("id", F.lit(2)) == 0, F.pmod(F.col("id") * 7919, F.lit(n))
            )
            .otherwise(F.lit(None))
            .alias("twin"),
            F.col("id").alias("i"),
        )
    )
    twin_text = synth_docs(spark, n).withColumnRenamed("doc_id", "twin")
    fresh_words = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"f{i}_"), F.col("i").cast("string"))), 1, 8
            )
            for i in range(40)
        ],
    )
    batch = (
        batch.join(twin_text, "twin", "left")
        .select("doc_id", F.coalesce("text", fresh_words).alias("text"))
        .localCheckpoint(eager=True)
    )
    pairs, probe_s = _timed(
        lambda: dedup.probe_near_duplicates(
            spark, index, corpus, batch,
            text_col="text", id_col="doc_id",
            threshold=0.5, num_hashes=16, bands=4, k=12,
        ).count()
    )
    return {"n": n, "index_build_s": build_s, "probe_s": probe_s, "probe_pairs": pairs}


def probe_sim6(spark, n: int) -> dict:
    from mex_extractors_spark.lake.ann import IvfIndex

    base = os.path.join(SCRATCH, f"sim6_{n}")
    shutil.rmtree(base, ignore_errors=True)
    vecs = synth_vectors(spark, n)
    idx = IvfIndex(base, num_buckets=8)
    # pruning granularity = files per bucket x centroid span per file;
    # 64 lists with ~n/128-row files keeps each file a narrow centroid
    # band at every size, so scanned/total should track nprobe/lists
    _, build_s = _timed(
        lambda: idx.build(
            spark, vecs, num_centroids=64, target_file_rows=max(64, n // 128)
        )
    )
    qvec = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    total_files = len(idx.table.read(spark).inputFiles())
    res = idx.topk(spark, qvec, k=10, nprobe=2)
    scanned_files = len(res.inputFiles())
    _, query_s = _timed(lambda: res.count())
    return {
        "n": n,
        "index_build_s": build_s,
        "query_s": query_s,
        "files_total": total_files,
        "files_scanned": scanned_files,
    }


def probe_t15(spark, n: int) -> dict:
    docs = spark.range(n).select(
        F.col("id").cast("long").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(900)) + 100).alias("tokens"),
    )
    out, pack_s = _timed(
        lambda: pack_sequences(
            docs, "doc_id", "tokens", seq_len=2048, range_width=max(1000, n // 256)
        ).count()
    )
    return {"n": n, "pack_s": pack_s, "rows": out}


def probe_merge(spark, n: int) -> dict:
    from mex_extractors_spark.lake.table import LakeTable

    base = os.path.join(SCRATCH, f"merge_{n}")
    shutil.rmtree(base, ignore_errors=True)
    state = spark.range(n).select(
        F.col("id").cast("long").alias("user_id"),
        F.lit("seed").alias("event_type"),
        F.col("id").cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    table = LakeTable(base, num_buckets=16, key_cols=["user_id"])
    table.apply_batch(spark, state, f"seed-{n}")
    source = spark.range(500).select(
        # half matched (existing keys), half new
        F.when(F.pmod("id", F.lit(2)) == 0, F.col("id") * (n // 500))
        .otherwise(F.col("id") + n * 2)
        .cast("long")
        .alias("user_id"),
        F.lit("merged").alias("event_type"),
        F.lit(n + 1).cast("long").alias("seq"),
    )
    st, merge_s = _timed(
        lambda: table.merge_into(
            spark, source, f"mrg-{n}",
            when_matched_update={"event_type": F.lit("merged")},
        )
    )
    return {
        "n": n,
        "merge_s": merge_s,
        "matched": int(st.matched),
        "buckets_rewritten": int(st.buckets_rewritten),
    }


def _exponents(points: list[dict], xkey: str, ykey: str) -> list[float]:
    out = []
    for a, b in zip(points, points[1:]):
        if a[ykey] and b[ykey]:
            out.append(
                round(
                    math.log(b[ykey] / a[ykey]) / math.log(b[xkey] / a[xkey]), 2
                )
            )
    return out


def main() -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(cores=16, shuffle_partitions=32)
    results: dict[str, list[dict]] = {}
    partial = os.path.join(REPO, "BENCH", "r4ops_scale_partial.json")

    def _checkpoint() -> None:
        with open(partial, "w") as f:
            json.dump(results, f, indent=1)

    for family, probe, sizes in (
        ("d7", probe_d7, (5_000, 15_000, 50_000)),
        ("sim6", probe_sim6, (2_000, 6_000, 20_000)),
        ("t15", probe_t15, (5_000, 50_000, 500_000)),
        ("merge", probe_merge, (100_000, 300_000, 1_000_000)),
    ):
        results[family] = []
        for n in sizes:
            results[family].append(probe(spark, n))
            print(family, results[family][-1], flush=True)
            _checkpoint()

    summary = {
        "d7_probe_exponents": _exponents(results["d7"], "n", "probe_s"),
        "d7_build_exponents": _exponents(results["d7"], "n", "index_build_s"),
        "sim6_query_exponents": _exponents(results["sim6"], "n", "query_s"),
        "t15_exponents": _exponents(results["t15"], "n", "pack_s"),
        "merge_exponents": _exponents(results["merge"], "n", "merge_s"),
    }
    with open(os.path.join(REPO, "BENCH", "r4ops_scale.json"), "w") as f:
        json.dump({"results": results, "summary": summary}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
