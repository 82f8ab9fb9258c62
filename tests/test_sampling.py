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
    stratified_sample_exact,
)


def test_redact_pii_separators_and_ip_host_emails(spark):
    """Formatted phone/card numbers (space/dot/dash separated) and
    emails whose host is an IP must redact fully; dates (8 digits) and
    short versions must survive."""
    rows = [
        (1, "card 4111 1111 1111 1111 on file"),
        (2, "call 555-123-4567 ext 9"),
        (3, "contact john.smith@10.0.0.1 asap"),
        (4, "released 2026-08-21 version 1.2.3"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["clean"]
        for r in df.select("id", redact_pii("text").alias("clean")).collect()
    }
    assert got[1] == "card <NUM> on file"
    assert got[2] == "call <NUM> ext 9"
    assert got[3] == "contact <EMAIL> asap"
    assert got[4] == "released 2026-08-21 version 1.2.3"


def test_stratified_sample_drops_null_ids(spark):
    """md5(NULL) has no position in hash order: NULL-id rows are dropped
    upfront so a row's fate can never depend on whether its stratum hit
    the all-rows fallback path."""
    rows = [(None, "a"), *[(i, "a") for i in range(10)]]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample_exact(df, "lang", "doc_id", quota=20)
    ids = [r.doc_id for r in out.collect()]
    assert None not in ids and sorted(ids) == list(range(10))


def test_prefix_sum_rejects_null_and_negative_costs(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, -3), (2, 4)], "doc_id long, cost long"
    )
    with pytest.raises(Exception, match="costs must be >= 0"):
        pack_shards(df, "doc_id", "cost", budget=10, range_width=2).collect()
    df2 = spark.createDataFrame(
        [(0, 5), (1, None), (2, 4)], "doc_id long, cost long"
    )
    with pytest.raises(Exception, match="costs must be >= 0"):
        pack_shards(df2, "doc_id", "cost", budget=10, range_width=2).collect()


def test_sampling_reserved_columns_raise(spark):
    df = spark.createDataFrame([(1, 2, "a")], "doc_id long, _rb long, lang string")
    with pytest.raises(ValueError, match="internal working columns"):
        pack_shards(df, "doc_id", "_rb", budget=10)
    df2 = spark.createDataFrame([(1, 0.5, "a")], "doc_id long, _frac double, lang string")
    with pytest.raises(ValueError, match="internal working columns"):
        stratified_sample_exact(df2, "lang", "doc_id", quota=1)


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


def test_prefix_sum_keeps_fractional_costs(spark):
    """The prefix-sum kernel keeps the SOURCE numeric type: a double
    cost column must yield double, untruncated _cum0 values (a long
    cast would floor every prefix — costs here are 0.25 multiples, so
    all partial sums are exact in binary and association-independent)."""
    from mex_extractors_spark.operators.sampling import _exclusive_prefix_sum

    rows = [(i, 0.25) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, cost double")
    out = _exclusive_prefix_sum(df, "doc_id", "cost", range_width=4)
    assert out.schema["_cum0"].dataType.typeName() == "double"
    got = {r["doc_id"]: r["_cum0"] for r in out.collect()}
    assert got == {i: 0.25 * i for i in range(10)}


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


def _naive_stratified(rows, quota):
    """Reference selection: first `quota` ids per stratum in
    (md5-hex, id) order, whole stratum when smaller."""
    by_stratum: dict[str, list[int]] = {}
    for sid, stratum in rows:
        by_stratum.setdefault(stratum, []).append(sid)
    keep = set()
    for stratum, ids in by_stratum.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        keep.update((i, stratum) for i in ids[:quota])
    return keep


@pytest.mark.parametrize("margin", [1.02, 4.0])
def test_stratified_sample_exact_matches_naive_window(spark, margin):
    from mex_extractors_spark.operators.sampling import stratified_sample_exact

    # 3 strata of very different sizes, incl. one smaller than the quota
    rows = [(i, "big") for i in range(300)]
    rows += [(1000 + i, "mid") for i in range(40)]
    rows += [(2000 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        (r.doc_id, r.lang)
        for r in stratified_sample_exact(
            df, "lang", "doc_id", quota=5, margin=margin
        ).collect()
    }
    # margin=1.02 makes the prefilter genuinely tight (thresh ~1.7% on
    # the big stratum), so the short-stratum fallback path is load-
    # bearing for at least some strata — the result must be invariant
    assert got == _naive_stratified(rows, 5)
    tiny = {k for k in got if k[1] == "tiny"}
    assert len(tiny) == 3  # stratum smaller than quota kept whole


def test_stratified_sample_null_stratum_is_a_partition(spark):
    from mex_extractors_spark.operators.sampling import stratified_sample_exact

    # NULL lang is a stratum like any other (the naive window keeps a
    # NULL partition; a null-rejecting equi-join would silently drop it)
    rows = [(i, "a" if i % 3 == 0 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        (r.doc_id, r.lang)
        for r in stratified_sample_exact(df, "lang", "doc_id", quota=4).collect()
    }
    assert got == _naive_stratified(rows, 4)
    assert sum(1 for _, s in got if s is None) == 4


def test_stratified_sample_rejects_bad_params(spark):
    from mex_extractors_spark.operators.sampling import stratified_sample_exact

    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample_exact(df, "lang", "doc_id", quota=0)
    with pytest.raises(ValueError):
        stratified_sample_exact(df, "lang", "doc_id", quota=5, margin=1.0)


def test_vocab_build_tf_df_band_and_ngrams(spark):
    from mex_extractors_spark.operators.sampling import vocab_build

    rows = [
        (1, "the cat sat, The CAT!"),
        (2, "the dog sat"),
        (3, "the bird"),
        (4, "unique-token"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.token: (r.tf, r.df)
        for r in vocab_build(
            df, "text", "doc_id", n_docs=4, min_df=2, max_df_frac=0.6, top_k=10
        ).collect()
    }
    # 'the': df=3 > 0.6*4=2.4 -> dropped (stop-word band)
    # 'cat' tf=3 df=1 -> dropped (hapax df); 'sat' tf=2 df=2 -> kept
    assert got == {"sat": (2, 2)}

    got2 = {
        r.token: (r.tf, r.df)
        for r in vocab_build(
            df, "text", "doc_id", n_docs=4, min_df=2, max_df_frac=1.0,
            top_k=10, ngram=2,
        ).collect()
    }
    # bigrams per doc (case-folded): doc1 'the cat','cat sat','sat the',
    # 'the cat'; doc2 'the dog','dog sat'; doc3 'the bird' — no bigram
    # is shared across documents, so min_df=2 keeps nothing
    assert got2 == {}

    with pytest.raises(ValueError):
        vocab_build(df, "text", "doc_id", n_docs=4, ngram=3)
    with pytest.raises(ValueError):
        vocab_build(df, "text", "doc_id", n_docs=4, min_df=0)


def test_stratified_sample_quota_dict_mode(spark):
    from mex_extractors_spark.operators.sampling import stratified_sample_exact

    rows = [(i, f"s{i % 4}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = [
        (r.doc_id, r.src)
        for r in stratified_sample_exact(
            df, "src", "doc_id", quota={"s0": 3, "s1": 7}
        ).collect()
    ]
    # strata absent from the dict are excluded entirely
    assert {s for _, s in got} == {"s0", "s1"}
    assert sum(1 for _, s in got if s == "s0") == 3
    assert sum(1 for _, s in got if s == "s1") == 7
    # selection matches the naive per-stratum window at each quota
    expect = {
        (i, s)
        for i, s in _naive_stratified(rows, 3)
        if s == "s0"
    } | {(i, s) for i, s in _naive_stratified(rows, 7) if s == "s1"}
    assert set(got) == expect

    with pytest.raises(ValueError):
        stratified_sample_exact(df, "src", "doc_id", quota={})
    with pytest.raises(ValueError):
        stratified_sample_exact(df, "src", "doc_id", quota={"s0": 0})


def test_corpus_mix_allocation_and_caps(spark):
    from mex_extractors_spark.operators.sampling import corpus_mix

    # s0 has only 5 rows: its 12-row allocation is capped, not rebalanced
    rows = [(i, "s0") for i in range(5)]
    rows += [(100 + i, "s1") for i in range(50)]
    rows += [(200 + i, "s2") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = corpus_mix(
        df, "src", "doc_id", weights={"s0": 2.0, "s1": 1.0, "s2": 1.0},
        target_rows=24,
    ).collect()
    by_src = {}
    for r in got:
        by_src[r.src] = by_src.get(r.src, 0) + 1
    # raw: s0 12, s1 6, s2 6 -> s0 capped at 5
    assert by_src == {"s0": 5, "s1": 6, "s2": 6}

    # largest-remainder rounding sums exactly to target when no cap hits
    got2 = corpus_mix(
        df, "src", "doc_id", weights={"s1": 1.0, "s2": 2.0}, target_rows=25
    ).collect()
    by2 = {}
    for r in got2:
        by2[r.src] = by2.get(r.src, 0) + 1
    # raw: s1 8.33 -> 8, s2 16.67 -> 17
    assert by2 == {"s1": 8, "s2": 17}

    # deterministic: identical selection on re-run
    again = corpus_mix(
        df, "src", "doc_id", weights={"s1": 1.0, "s2": 2.0}, target_rows=25
    ).collect()
    assert sorted(map(str, got2)) == sorted(map(str, again))

    with pytest.raises(ValueError):
        corpus_mix(df, "src", "doc_id", weights={}, target_rows=10)
    with pytest.raises(ValueError):
        corpus_mix(df, "src", "doc_id", weights={"s1": 1.0}, target_rows=0)


def test_pack_sequences_matches_naive_chunking(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 300)) for i in range(400)]  # includes zeros
    df = spark.createDataFrame(rows, "doc_id long, cost long")
    from mex_extractors_spark.operators.sampling import pack_sequences

    got = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, "doc_id", "cost", seq_len=512, range_width=29
        ).collect()
    }
    cum = 0
    for i, cost in rows:
        r = got[i]
        assert r["token_start"] == cum, i
        if cost == 0:
            assert r["n_seqs"] == 0
            assert r["seq_first"] is None and r["seq_last"] is None
            assert r["seq_offset"] is None
        else:
            assert r["seq_first"] == cum // 512, i
            assert r["seq_last"] == (cum + cost - 1) // 512, i
            assert r["seq_offset"] == cum % 512, i
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
        cum += cost
    # a document longer than seq_len spans > 1 sequences somewhere
    assert any(r["n_seqs"] > 1 for r in got.values())


def test_pack_sequences_window_is_bucket_partitioned(spark):
    from mex_extractors_spark.operators.sampling import pack_sequences
    import re

    df = spark.createDataFrame([(i, 10) for i in range(100)], "doc_id long, cost long")
    plan = (
        pack_sequences(df, "doc_id", "cost", seq_len=64, range_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"Window \[.*\], \[_rb#\d+L?\], \[doc_id#", plan), plan


def test_pack_sequences_rejects_bad_params(spark):
    from mex_extractors_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(0, 1)], "doc_id long, cost long")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "cost", seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "cost", seq_len=8, range_width=0)
