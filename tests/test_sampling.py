"""Corpus curation operators: PII redaction, deterministic hash
sampling, token-budget shard packing (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.operators.sampling import (
    hash_sample,
    pack_shards,
    redact_pii,
)


def test_redact_pii_planted(spark):
    rows = [
        (1, "mail me at jane.doe+x@example.org please"),
        (2, "server 192.168.0.1 answered"),
        (3, "card 12345678901234 and phone 123456789"),
        (4, "mixed a@b.co at 10.0.0.255 ref 9876543210"),
        (5, "clean text, short num 12345, version 1.2.3.4.5"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["clean"]
        for r in df.select("id", redact_pii("text").alias("clean")).collect()
    }
    assert got[1] == "mail me at <EMAIL> please"
    assert got[2] == "server <IP> answered"
    assert got[3] == "card <NUM> and phone <NUM>"
    assert got[4] == "mixed <EMAIL> at <IP> ref <NUM>"
    # short numbers and dotted versions (5 octet groups match 4 + tail)
    assert "12345" in got[5]


def test_hash_sample_matches_python_md5_and_is_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    kept = sorted(
        r["doc_id"] for r in hash_sample(df, "doc_id", "28").collect()
    )
    expected = sorted(
        i
        for i in range(2000)
        if hashlib.md5(str(i).encode()).hexdigest()[:2] < "28"
    )
    assert kept == expected
    # ≈ 40/256 of the corpus, and a re-run is byte-identical
    assert 0.10 < len(kept) / 2000 < 0.22
    assert sorted(
        r["doc_id"] for r in hash_sample(df, "doc_id", "28").collect()
    ) == kept


def test_hash_sample_rejects_bad_cutoff(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", "")
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", "xyz")


def test_pack_shards_matches_naive_cumsum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 900)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, cost long")
    got = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(df, "doc_id", "cost", budget=2000, range_width=37).collect()
    }
    cum = 0
    for i, cost in rows:  # rows are already in id order
        assert got[i] == cum // 2000, i
        cum += cost
    # shards are contiguous from 0
    assert sorted(set(got.values())) == list(range(max(got.values()) + 1))


def test_pack_shards_window_is_bucket_partitioned(spark):
    """The full-data window must be partitioned (parallel), never a
    global single-partition sort; only the ~n_buckets offsets row-set
    may sort globally."""
    df = spark.createDataFrame([(i, 10) for i in range(100)], "doc_id long, cost long")
    plan = (
        pack_shards(df, "doc_id", "cost", budget=50, range_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # the per-row cumsum window's partition spec is [_rb#N], order spec
    # [doc_id ASC...] — a global sort of the data would show an EMPTY
    # partition spec on this window
    assert re.search(r"Window \[.*\], \[_rb#\d+L?\], \[doc_id#", plan), plan
