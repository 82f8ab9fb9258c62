"""Clustered (sort-order / Z-order) compaction.

Contract: ``compact(cluster_by=...)`` rewrites each bucket as multiple
files, each covering a narrow range of the cluster order, so the
existing footer-stats skipping prunes files INSIDE a bucket for range
predicates — without clustering a hash-bucketed layout keeps the whole
value range in every file and min/max prunes nothing. Clustering must
be invisible to every correctness surface: reads, the merge (clustered
files are NOT key-sorted, so the merge view must not claim SORTED BY),
the CDF, and the drift-verified rewrite checksum.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.lake.cluster import (
    ZVALUE_COL,
    code_expr,
    column_cutpoints,
    zvalue_expr,
)
from mex_extractors_spark.lake.stats import validate_predicates
from mex_extractors_spark.lake.table import LakeTable


@pytest.fixture()
def lake_dir(tmp_path):
    d = str(tmp_path / "cluster_lake")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, seq long, ts long, stars long, op string",
    )


def _mk_rows(n, seq0=1):
    # ts and stars deliberately decorrelated from the key hash AND from
    # each other, so pruning power is attributable to clustering alone
    return [
        (
            f"r{i % 37}",
            f"p{i}",
            seq0 + i,
            (i * 7919) % 100_000,
            (i * 104_729) % 50_000,
            "U",
        )
        for i in range(n)
    ]


def _mk_table(lake_dir, **kw):
    kw.setdefault("key_cols", ["repo", "path"])
    kw.setdefault("num_buckets", 4)
    return LakeTable(lake_dir, **kw)


def _files_of(table, bucket_meta):
    return list(bucket_meta["files"])


def _pruned(table, preds):
    """Base files the manifest pruner would skip for ``preds``."""
    snap = table.current_snapshot()
    return table._prune_base_files(snap, None, validate_predicates(preds))


def test_sort_clustering_splits_buckets_into_range_files(spark, lake_dir):
    table = _mk_table(lake_dir)
    table.apply_batch(spark, _events(spark, _mk_rows(4000)), "b1")
    v = table.compact(spark, cluster_by=["ts"], target_file_rows=250)
    snap = table.current_snapshot()
    assert snap["version"] == v
    for meta in snap["buckets"].values():
        files = _files_of(table, meta)
        assert len(files) > 1, "clustered bucket must hold multiple files"
        assert meta["cluster"] == {"by": ["ts"], "strategy": "sort"}
        # per-file ranges must be (near-)disjoint and tight
        bounds = []
        for rel in files:
            st = table.file_stats(rel)
            assert st and "ts" in st
            bounds.append((st["ts"]["min"], st["ts"]["max"]))
        bounds.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
            assert hi1 <= lo2, "sorted files must not overlap in ts"


def test_clustered_read_prunes_inside_buckets_and_stays_correct(
    spark, lake_dir
):
    table = _mk_table(lake_dir)
    df = _events(spark, _mk_rows(4000))
    table.apply_batch(spark, df, "b1")
    before = table.read(spark).orderBy("repo", "path").collect()
    assert not _pruned(table, [("ts", ">", 90_000)]), (
        "unclustered single-file buckets span the full ts range — "
        "nothing is prunable before clustering"
    )
    table.compact(spark, cluster_by=["ts"], target_file_rows=250)
    skipped = _pruned(table, [("ts", ">", 90_000)])
    snap = table.current_snapshot()
    total_files = sum(len(m["files"]) for m in snap["buckets"].values())
    assert len(skipped) >= total_files // 2, (
        f"selective range predicate should prune most files: "
        f"{len(skipped)}/{total_files}"
    )
    # correctness: clustered read == pre-cluster read, filtered or not
    after = table.read(spark).orderBy("repo", "path").collect()
    assert after == before
    got = sorted(
        (r["repo"], r["path"])
        for r in table.read(spark, where=[("ts", ">", 90_000)]).collect()
    )
    want = sorted(
        (r["repo"], r["path"]) for r in before if r["ts"] > 90_000
    )
    assert got == want


def test_zorder_prunes_on_both_columns(spark, lake_dir):
    table = _mk_table(lake_dir, num_buckets=2)
    table.apply_batch(spark, _events(spark, _mk_rows(8000)), "b1")
    table.compact(
        spark,
        cluster_by=["ts", "stars"],
        cluster_strategy="zorder",
        target_file_rows=250,
    )
    snap = table.current_snapshot()
    total_files = sum(len(m["files"]) for m in snap["buckets"].values())
    for col, hi in (("ts", 100_000), ("stars", 50_000)):
        skipped = _pruned(table, [(col, ">", int(hi * 0.9))])
        assert len(skipped) >= total_files // 3, (
            f"zorder should prune on {col}: {len(skipped)}/{total_files}"
        )
    # lexicographic sort on (ts, stars) would prune ~nothing on stars
    # alone; zorder must. Correctness of a 2-d box query:
    got = sorted(
        (r["repo"], r["path"])
        for r in table.read(
            spark, where=[("ts", "<", 10_000), ("stars", "<", 5_000)]
        ).collect()
    )
    want = sorted(
        (r["repo"], r["path"])
        for r in table.read(spark).collect()
        if r["ts"] < 10_000 and r["stars"] < 5_000
    )
    assert got == want


def test_zorder_value_column_is_invisible_to_reads(spark, lake_dir):
    table = _mk_table(lake_dir, num_buckets=2)
    table.apply_batch(spark, _events(spark, _mk_rows(1000)), "b1")
    table.compact(
        spark,
        cluster_by=["ts", "stars"],
        cluster_strategy="zorder",
        target_file_rows=100,
    )
    df = table.read(spark)
    assert ZVALUE_COL not in df.columns
    # the physical files DO carry it (that is how the sort happened)
    snap = table.current_snapshot()
    rel = next(iter(snap["buckets"].values()))["files"][0]
    import pyarrow.parquet as pq
    import os

    phys = pq.ParquetFile(os.path.join(table.path, rel)).schema_arrow.names
    assert ZVALUE_COL in phys


def test_recluster_same_spec_is_noop(spark, lake_dir):
    table = _mk_table(lake_dir)
    table.apply_batch(spark, _events(spark, _mk_rows(2000)), "b1")
    v1 = table.compact(spark, cluster_by=["ts"], target_file_rows=200)
    v2 = table.compact(spark, cluster_by=["ts"], target_file_rows=200)
    assert v2 == v1, "idempotent maintenance: same spec, no rewrite"
    # a DIFFERENT spec rewrites
    v3 = table.compact(spark, cluster_by=["stars"], target_file_rows=200)
    assert v3 > v2


def test_plain_compact_leaves_clustered_buckets_alone(spark, lake_dir):
    table = _mk_table(lake_dir)
    table.apply_batch(spark, _events(spark, _mk_rows(2000)), "b1")
    v1 = table.compact(spark, cluster_by=["ts"], target_file_rows=200)
    v2 = table.compact(spark)  # plain: multi-file is by design here
    assert v2 == v1
    # but a delta fold DOES rewrite — and drops the spec (honest: the
    # fold is key-ordered again) unless the spec is passed through
    mor = _mk_table(table.path, merge_mode="mor")
    mor.apply_batch(
        spark, _events(spark, _mk_rows(100, seq0=10_000)), "b2"
    )
    v3 = mor.compact(spark)
    snap = mor.current_snapshot()
    assert v3 > v2
    touched = [
        m for m in snap["buckets"].values() if m["schema_version"]
    ]
    assert any("cluster" not in m for m in touched)


def test_maintenance_keeps_clustering_through_delta_folds(spark, lake_dir):
    table = _mk_table(lake_dir, merge_mode="mor", stats_cols=["seq"])
    table.apply_batch(spark, _events(spark, _mk_rows(2000)), "b1")
    table.maintenance(spark, cluster_by=["ts"], target_file_rows=200)
    table.apply_batch(
        spark, _events(spark, _mk_rows(200, seq0=10_000)), "b2"
    )
    table.maintenance(spark, cluster_by=["ts"], target_file_rows=200)
    snap = table.current_snapshot()
    for meta in snap["buckets"].values():
        assert not meta.get("deltas")
        assert meta.get("cluster") == {"by": ["ts"], "strategy": "sort"}
    # converged state unaffected by two cluster rewrites
    assert table.read(spark).count() == 2200 - 200  # b2 overwrites p0..p199


def test_merge_onto_clustered_single_file_bucket_is_correct(spark, lake_dir):
    """The SORTED BY trap: one file per bucket sorted by ts (not key)
    must not let the merge elide its sort. num_buckets=1 + a huge file
    budget forces exactly one clustered file, then an update batch must
    merge correctly."""
    table = _mk_table(lake_dir, num_buckets=1)
    table.apply_batch(spark, _events(spark, _mk_rows(1000)), "b1")
    table.compact(spark, cluster_by=["ts"], target_file_rows=10_000_000)
    snap = table.current_snapshot()
    assert all(len(m["files"]) == 1 for m in snap["buckets"].values())
    upd = _events(
        spark,
        [(f"r{i % 37}", f"p{i}", 5000 + i, 1, 1, "U") for i in range(500)],
    )
    table.apply_batch(spark, upd, "b2")
    state = {
        (r["repo"], r["path"]): r["seq"] for r in table.read(spark).collect()
    }
    assert len(state) == 1000
    for i in range(500):
        assert state[(f"r{i % 37}", f"p{i}")] == 5000 + i, (
            "update lost — merge sort was elided on a non-key-sorted file"
        )
    for i in range(500, 1000):
        assert state[(f"r{i % 37}", f"p{i}")] == 1 + i


def test_cluster_validation_errors(spark, lake_dir):
    table = _mk_table(lake_dir)
    table.apply_batch(spark, _events(spark, _mk_rows(100)), "b1")
    with pytest.raises(ValueError, match="not in schema"):
        table.compact(spark, cluster_by=["nope"])
    with pytest.raises(ValueError, match="zorder needs"):
        table.compact(
            spark, cluster_by=["repo", "ts"], cluster_strategy="zorder"
        )
    with pytest.raises(ValueError, match="cluster_strategy"):
        table.compact(spark, cluster_by=["ts"], cluster_strategy="hilbert")


def test_zvalue_expression_interleaves_codes(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0)],
        "x double, y double",
    )
    cuts = {"x": [50.0], "y": [50.0]}
    got = [
        r["z"]
        for r in df.select(
            zvalue_expr(["x", "y"], cuts, bits=1).alias("z")
        ).collect()
    ]
    # x is the more significant bit at equal significance
    assert got == [0, 2, 1, 3]
    code = df.select(code_expr(F.col("x"), [25.0, 50.0, 75.0]).alias("c"))
    assert [r["c"] for r in code.collect()] == [0, 3, 0, 3]


def test_cutpoints_single_aggregate(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("a").cast("double"),
        F.col("id").cast("double").alias("b"),
    )
    cuts = column_cutpoints(df, ["a", "b"], bits=3)
    assert len(cuts["a"]) <= 7 and len(cuts["b"]) <= 7
    assert cuts["b"] == sorted(cuts["b"])
    assert 0 < cuts["b"][0] < cuts["b"][-1] < 10_000


def test_zorder_on_date_column_works(spark, lake_dir):
    """DateType is advertised as zorderable but cannot cast to double —
    the numeric projection must go through unix_date (regression: the
    percentile/code exprs crashed with DATATYPE_MISMATCH on dates)."""
    rows = [
        ("r", f"f{i}.py", i + 1, f"2024-{(i % 12) + 1:02d}-01", "I")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, seq long, d string, op string"
    ).withColumn("d", F.to_date("d"))
    t = LakeTable(lake_dir, num_buckets=2, stats_cols=["d"])
    t.apply_batch(spark, df, "b1")
    t.compact(
        spark, cluster_by=["d"], cluster_strategy="zorder", target_file_rows=15
    )
    got = sorted(r["path"] for r in t.read(spark).collect())
    assert got == sorted(r[1] for r in rows)


def test_zorder_rejects_morton_overflow(spark, lake_dir):
    """bits*len(cols) > 64 would silently wrap shift amounts (Java
    masks to 6 bits) — must raise instead."""
    cols = [f"c{i}" for i in range(11)]  # 6 bits * 11 = 66 > 64
    with pytest.raises(ValueError, match="64 bits|<= 64"):
        zvalue_expr(cols, {c: [0.5] for c in cols})
    ddl = ", ".join(["repo string", "path string", "seq long", "op string"]
                    + [f"{c} long" for c in cols])
    df = spark.createDataFrame(
        [tuple(["r", "f.py", 1, "I"] + [0] * 11)], ddl
    )
    t = LakeTable(lake_dir, num_buckets=2)
    t.apply_batch(spark, df, "b1")
    with pytest.raises(ValueError, match="64 bits"):
        t.compact(spark, cluster_by=cols, cluster_strategy="zorder")
