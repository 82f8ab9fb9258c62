"""Measured ANN quality: recall@k vs scanned-fraction for the sign-LSH
and IVF search paths against brute-force ground truth.

The LSH candidate-growth study (BENCH/LSH.md) measures the *cost* side
of the near-dup pipeline; this probe measures the *quality* side of the
similarity-search operators (sim2 `ann_lsh_topk`, sim5/sim6 IVF):
recall@10 against the exact `cosine_topk` oracle, paired with the
fraction of the corpus each method actually scores — the axis a 100 TB
user tunes (`nprobe`, `num_planes`, `multiprobe`).

Two corpora:
- the driver's real testdata (`$SPARK_GRAFT_SF_DIR` embeddings, 64-dim)
- a larger deterministic mixture-of-Gaussians corpus (clustered, the
  shape real embedding spaces have) so the curves are not an artifact
  of a 2k-row table.

Ground truth is computed in numpy on the driver from ONE collected copy
of the corpus (bounded: n·dim doubles); the *measured systems* are the
actual Spark operators — each config's per-query top-k plans are
unioned into a single job so the probe is a handful of Spark actions,
not Q×configs of them.

Usage:
    python scripts/ann_recall_probe.py [--synth-n 20000] [--queries 20]
        [--out BENCH/ann_recall.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mex_extractors_spark.functions import hashing
from mex_extractors_spark.lake.ann import IvfIndex
from mex_extractors_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    derive_num_planes,
)

K = 10


def session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ann-recall-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def synth_corpus(n: int, dim: int, clusters: int, seed: int = 7) -> np.ndarray:
    """Deterministic mixture-of-Gaussians — the cluster structure real
    embedding models produce, which is what IVF/LSH exploit."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, size=(clusters, dim))
    assign = rng.integers(0, clusters, size=n)
    return (centers[assign] + rng.normal(0.0, 0.35, size=(n, dim))).astype(np.float64)


def exact_topk_ids(mat: np.ndarray, ids: np.ndarray, q: np.ndarray, k: int) -> list[int]:
    """Ground-truth oracle: same cosine + (desc sim, asc id) tiebreak
    the Spark operators use, at the same 6-decimal rounding."""
    sims = np.round(
        (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-300), 6
    )
    order = np.lexsort((ids, -sims))
    return ids[order[:k]].tolist()


def union_per_query(plans: list[DataFrame]) -> list[set[int]]:
    """Tag each per-query plan with its query index, union into ONE
    Spark action, split the collected rows back out."""
    tagged = [p.select(F.lit(i).alias("_q"), "vec_id") for i, p in enumerate(plans)]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    got: list[set[int]] = [set() for _ in plans]
    for r in out.collect():
        got[r["_q"]].add(int(r["vec_id"]))
    return got


def recall(got: list[set[int]], truth: list[list[int]]) -> float:
    return float(
        np.mean([len(g & set(t)) / len(t) for g, t in zip(got, truth)])
    )


def lsh_scan_fraction(
    mat: np.ndarray, queries: np.ndarray, planes: list[list[float]], multiprobe: int
) -> float:
    """Exact candidate fraction, computed from the same literal planes
    the Spark expression embeds — no extra Spark job needed."""
    pl = np.asarray(planes)
    corpus_bits = (mat @ pl.T) > 0
    corpus_buckets = corpus_bits @ (1 << np.arange(pl.shape[0]))
    fracs = []
    for q in queries:
        qb = int(hashing.sign_bucket_of([float(x) for x in q], planes))
        probe = {qb}
        if multiprobe >= 1:
            probe |= {qb ^ (1 << p) for p in range(pl.shape[0])}
        fracs.append(np.isin(corpus_buckets, list(probe)).mean())
    return float(np.mean(fracs))


def ivf_scan_fraction(
    idx: IvfIndex, n: int, assignments: np.ndarray,
    queries: np.ndarray, nprobe: int,
) -> float:
    # centroid ids are corpus vec_ids (arbitrary values) — count by key
    cids, counts = np.unique(assignments, return_counts=True)
    by_cid = dict(zip(cids.tolist(), counts.tolist()))
    fracs = []
    for q in queries:
        probe = idx.probe_ids([float(x) for x in q], nprobe)
        fracs.append(sum(by_cid.get(c, 0) for c in probe) / n)
    return float(np.mean(fracs))


def eval_corpus(
    spark: SparkSession, name: str, mat: np.ndarray, n_queries: int,
    ids: np.ndarray | None = None,
) -> dict:
    n, dim = mat.shape
    if ids is None:
        ids = np.arange(n)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    ).repartition(32).cache()
    df.count()

    # deterministic query set: every (n // n_queries)-th corpus vector.
    # stride floor of 1 + unique: a corpus smaller than --queries must
    # shrink the query set, not silently measure vector 0 twenty times
    stride = max(1, n // n_queries)
    q_idx = np.unique((np.arange(min(n_queries, n)) * stride) % n)
    n_queries = len(q_idx)
    queries = mat[q_idx]
    truth = [exact_topk_ids(mat, ids, q, K) for q in queries]

    results: dict[str, dict] = {}

    # --- sign-LSH sweep ------------------------------------------------
    derived = derive_num_planes(n)
    for planes_n in sorted({max(4, derived - 2), derived, derived + 2}):
        planes = hashing.lsh_planes(planes_n, dim, seed=42)
        for multiprobe in (0, 1):
            t0 = time.monotonic()
            plans = [
                ann_lsh_topk(
                    df, [float(x) for x in q], k=K,
                    num_planes=planes_n, multiprobe_bits=multiprobe,
                )
                for q in queries
            ]
            got = union_per_query(plans)
            results[f"lsh_p{planes_n}_mp{multiprobe}"] = {
                "recall_at_10": round(recall(got, truth), 4),
                "scan_fraction": round(
                    lsh_scan_fraction(mat, queries, planes, multiprobe), 4
                ),
                "wall_sec": round(time.monotonic() - t0, 2),
            }

    # --- IVF sweep ------------------------------------------------------
    num_centroids = max(8, min(64, int(math.sqrt(n))))
    idx_dir = tempfile.mkdtemp(prefix=f"ann_recall_{name}_")
    try:
        idx = IvfIndex(idx_dir, num_buckets=4)
        idx.build(spark, df, num_centroids=num_centroids)
        # driver-side assignment histogram for exact scan fractions
        cents = idx.centroids()
        cvecs = np.asarray([v for _c, v in cents])
        cids = np.asarray([c for c, _v in cents])
        d2 = ((mat[:, None, :] - cvecs[None, :, :]) ** 2).sum(axis=2)
        assignments = cids[np.argmin(d2, axis=1)]

        full_files = len(set(idx.table.read(spark).inputFiles()))
        for nprobe in (1, 2, 4, 8, min(16, num_centroids)):
            t0 = time.monotonic()
            plans = [
                idx.topk(spark, [float(x) for x in q], k=K, nprobe=nprobe)
                for q in queries
            ]
            got = union_per_query(plans)
            probe_files = len(
                set(
                    idx.probe_read(
                        spark, idx.probe_ids([float(x) for x in queries[0]], nprobe)
                    ).inputFiles()
                )
            )
            results[f"ivf_c{num_centroids}_np{nprobe}"] = {
                "recall_at_10": round(recall(got, truth), 4),
                "scan_fraction": round(
                    ivf_scan_fraction(idx, n, assignments, queries, nprobe), 4
                ),
                "files_read": probe_files,
                "files_total": full_files,
                "wall_sec": round(time.monotonic() - t0, 2),
            }
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    df.unpersist()
    return {"n": n, "dim": dim, "n_queries": n_queries, "configs": results}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--synth-n", type=int, default=20000)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="BENCH/ann_recall.json")
    args = ap.parse_args()

    spark = session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    real = (
        spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .toPandas()
    )
    real = real.sort_values("vec_id").reset_index(drop=True)
    real_mat = np.asarray([list(v) for v in real["embedding"]])
    real_ids = real["vec_id"].to_numpy()

    out = {
        "k": K,
        "corpora": {
            "testdata": eval_corpus(
                spark, "testdata", real_mat, args.queries, ids=real_ids
            ),
            "synth_clustered": eval_corpus(
                spark, "synth",
                synth_corpus(args.synth_n, real_mat.shape[1], clusters=48),
                args.queries,
            ),
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
