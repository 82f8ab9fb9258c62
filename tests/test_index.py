"""Incrementally-maintained inverted index (lake/index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.lake.index import (
    default_terms,
    full_index,
    last_indexed_version,
    refresh_inverted_index,
)
from mex_extractors_spark.lake.table import LakeTable


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, seq long, text string, op string"
    )


@pytest.fixture()
def tables(tmp_path):
    source = LakeTable(str(tmp_path / "src"), key_cols=["repo", "path"], num_buckets=4)
    index = LakeTable(
        str(tmp_path / "idx"),
        key_cols=["term", "repo", "path"],
        seq_col="_src_version",
        num_buckets=4,
    )
    return source, index


def _terms(df):
    return default_terms("text")


def _idx_state(spark, index):
    return sorted(
        tuple(r)
        for r in index.read(spark).select("term", "repo", "path").collect()
    )


def _oracle(spark, source):
    return sorted(tuple(r) for r in full_index(spark, source, _terms).collect())


def test_full_build_then_incremental_updates(spark, tables):
    source, index = tables
    source.apply_batch(
        spark,
        _mk(
            spark,
            [
                ("r1", "a.py", 1, "alpha beta", "U"),
                ("r2", "b.py", 2, "beta gamma", "U"),
                ("r3", "c.py", 3, "delta", "U"),
            ],
        ),
        "b1",
    )
    st = refresh_inverted_index(spark, source, index, _terms)
    assert st.full_build and st.applied and st.to_version == 1
    assert _idx_state(spark, index) == _oracle(spark, source)

    # update changes SOME terms, one delete, one unchanged row rewritten
    source.apply_batch(
        spark,
        _mk(
            spark,
            [
                ("r1", "a.py", 10, "alpha GAMMA", "U"),  # -beta +GAMMA
                ("r3", "c.py", 11, None, "D"),           # all terms retract
                ("r2", "b.py", 12, "beta gamma", "U"),   # terms unchanged
            ],
        ),
        "b2",
    )
    st2 = refresh_inverted_index(spark, source, index, _terms)
    assert st2.applied and not st2.full_build and (st2.from_version, st2.to_version) == (1, 2)
    got = _idx_state(spark, index)
    assert got == _oracle(spark, source)
    assert ("beta", "r1", "a.py") not in got
    assert ("GAMMA", "r1", "a.py") in got
    assert not any(r[1] == "r3" for r in got)

    # re-added after deletion wins again
    source.apply_batch(
        spark, _mk(spark, [("r3", "c.py", 20, "delta echo", "U")]), "b3"
    )
    refresh_inverted_index(spark, source, index, _terms)
    assert _idx_state(spark, index) == _oracle(spark, source)


def test_refresh_is_idempotent_and_noop_when_current(spark, tables):
    source, index = tables
    source.apply_batch(spark, _mk(spark, [("r1", "a.py", 1, "x y", "U")]), "b1")
    refresh_inverted_index(spark, source, index, _terms)
    v = index.current_snapshot()["version"]
    again = refresh_inverted_index(spark, source, index, _terms)
    assert not again.applied
    assert index.current_snapshot()["version"] == v
    assert last_indexed_version(index) == 1


def test_unchanged_update_writes_no_index_rows(spark, tables):
    """An update that doesn't touch indexed content must cost zero
    index writes (the per-key pre/post term diff is empty)."""
    source, index = tables
    source.apply_batch(spark, _mk(spark, [("r1", "a.py", 1, "same words", "U")]), "b1")
    refresh_inverted_index(spark, source, index, _terms)
    rows_before = index.current_snapshot()["total_rows"]
    source.apply_batch(spark, _mk(spark, [("r1", "a.py", 2, "same words", "U")]), "b2")
    refresh_inverted_index(spark, source, index, _terms)
    assert index.current_snapshot()["total_rows"] == rows_before
    assert _idx_state(spark, index) == _oracle(spark, source)


def test_expired_base_snapshot_falls_back_to_full_rebuild(spark, tables):
    """When retention expires the last-indexed source snapshot, the
    refresh must NOT wedge (last_indexed_version stays high, so the
    bootstrap branch is unreachable) — it rebuilds from the current
    state, retracting stale entries, then resumes incrementally."""
    source, index = tables
    source.apply_batch(
        spark,
        _mk(spark, [("r1", "a.py", 1, "alpha beta", "U"),
                    ("r2", "b.py", 2, "gamma", "U")]),
        "b1",
    )
    refresh_inverted_index(spark, source, index, _terms)
    # advance the source twice, then expire everything but the head
    source.apply_batch(
        spark,
        _mk(spark, [("r1", "a.py", 10, "alpha delta", "U"),  # -beta +delta
                    ("r2", "b.py", 11, None, "D")]),          # retract gamma
        "b2",
    )
    source.apply_batch(
        spark, _mk(spark, [("r3", "c.py", 20, "epsilon", "U")]), "b3"
    )
    source.expire_snapshots(keep_last=1)
    assert source.snapshot_at(last_indexed_version(index)) is None

    st = refresh_inverted_index(spark, source, index, _terms)
    assert st.applied and st.full_build
    assert _idx_state(spark, index) == _oracle(spark, source)
    # stale entries (beta, gamma) were retracted, not just shadowed
    assert "beta" not in {t for t, _, _ in _idx_state(spark, index)}

    # next refresh is incremental again
    source.apply_batch(
        spark, _mk(spark, [("r3", "c.py", 30, "epsilon zeta", "U")]), "b4"
    )
    st2 = refresh_inverted_index(spark, source, index, _terms)
    assert st2.applied and not st2.full_build
    assert _idx_state(spark, index) == _oracle(spark, source)


def test_index_schema_validated(spark, tables, tmp_path):
    source, _ = tables
    bad = LakeTable(str(tmp_path / "bad"), key_cols=["term"], seq_col="_src_version")
    source.apply_batch(spark, _mk(spark, [("r1", "a.py", 1, "x", "U")]), "b1")
    with pytest.raises(ValueError, match="key_cols"):
        refresh_inverted_index(spark, source, bad, _terms)


def test_term_lookup_prunes_to_term_bucket(spark, tables):
    """term leads the index key, so a term-equality lookup with the
    bucket id pinned by read_key-style hashing scans a fraction of the
    index (here: via where= on a stats-tracking index)."""
    source, _ = tables
    index = LakeTable(
        str(source.path) + "_idx2",
        key_cols=["term", "repo", "path"],
        seq_col="_src_version",
        num_buckets=8,
        stats_cols=["term"],
    )
    rows = [
        (f"r{i}", f"f{i}.py", i + 1, f"common word{i % 40}", "U") for i in range(200)
    ]
    source.apply_batch(spark, _mk(spark, rows), "b1")
    refresh_inverted_index(spark, source, index, _terms)
    hits = index.read(spark, where=[("term", "=", "word7")])
    assert {r["term"] for r in hits.collect()} == {"word7"}
    assert len(hits.inputFiles()) <= len(index.read(spark).inputFiles())


def test_incremental_neardup_probe_tracks_updates(spark, tmp_path):
    """The band-key index + probe pipeline: a probe batch finds its
    identical twin in the indexed corpus at jaccard 1.0; after an
    UPDATE rewrites a corpus doc's text, the CDF refresh retracts the
    old band keys and the probe reflects the NEW corpus state only."""
    from mex_extractors_spark.operators.dedup import (
        minhash_band_terms,
        probe_near_duplicates,
    )

    corpus = LakeTable(str(tmp_path / "src"), key_cols=["doc_id"], num_buckets=2)
    index = LakeTable(
        str(tmp_path / "idx"),
        key_cols=["term", "doc_id"],
        seq_col="_src_version",
        num_buckets=2,
    )
    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "a completely different document about spark physical plans",
        3: "yet another unrelated text concerning parquet row groups",
    }
    rows = [(i, t, i, "U") for i, t in texts.items()]
    corpus.apply_batch(
        spark,
        spark.createDataFrame(rows, "doc_id long, text string, seq long, op string"),
        "b1",
    )

    def terms(df):
        return minhash_band_terms("text", num_hashes=16, bands=4, k=5)

    refresh_inverted_index(spark, corpus, index, terms)

    batch = spark.createDataFrame([(101, texts[1])], "doc_id long, text string")
    got = probe_near_duplicates(
        spark, index, corpus, batch, threshold=0.5, num_hashes=16, bands=4, k=5
    ).collect()
    assert {(r.id_a, r.id_b, r.jaccard) for r in got} == {(101, 1, 1.0)}

    # UPDATE doc 1 to unrelated text: the diff refresh must RETRACT its
    # old band keys — the same probe now finds nothing
    corpus.apply_batch(
        spark,
        spark.createDataFrame(
            [(1, "totally new content nothing like before at all", 10, "U")],
            "doc_id long, text string, seq long, op string",
        ),
        "b2",
    )
    st = refresh_inverted_index(spark, corpus, index, terms)
    assert st.applied and not st.full_build
    got2 = probe_near_duplicates(
        spark, index, corpus, batch, threshold=0.5, num_hashes=16, bands=4, k=5
    ).collect()
    assert got2 == []


def test_band_terms_formulations_agree(spark):
    """minhash_band_terms (row-local HOF, the index side) and
    banded_lsh_keys (explode+agg, the probe side) must emit IDENTICAL
    term sets — a probe against a persisted index silently loses all
    recall if the formulations ever drift."""
    from pyspark.sql import functions as F

    from mex_extractors_spark.operators.dedup import (
        banded_lsh_keys,
        minhash_band_terms,
    )

    df = spark.createDataFrame(
        [(i, f"some text body number {i} with shared words") for i in range(20)]
        + [(100, None), (101, "")],
        "doc_id long, text string",
    )
    hof = df.select(
        F.col("doc_id").alias("_id"),
        F.explode(minhash_band_terms("text", num_hashes=16, bands=4, k=5)).alias(
            "term"
        ),
    )
    agg = banded_lsh_keys(df, "text", "doc_id", num_hashes=16, bands=4, k=5)
    assert sorted(map(tuple, hof.collect())) == sorted(map(tuple, agg.collect()))


def test_full_build_bulk_pairs_path_identical(spark, tmp_path):
    """refresh_inverted_index's bulk_pairs_fn fast path (explode+agg
    minhash, used for corpus-sized full builds) must commit a
    byte-identical index to the row-local terms_fn path."""
    from mex_extractors_spark.operators.dedup import (
        minhash_band_pairs,
        minhash_band_terms,
    )

    rows = [
        (i, f"document body number {i} sharing quite a few words", i, "U")
        for i in range(30)
    ]
    # degenerate docs: both formulations must emit ZERO terms for them
    # (the no-signature contract — a shared '' shingle would put every
    # blank doc in the same bucket of every band)
    rows += [(100, None, 100, "U"), (101, "", 101, "U")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, seq long, op string"
    )

    def terms(df):
        return minhash_band_terms("text", num_hashes=16, bands=4, k=5)

    def bulk(df):
        return minhash_band_pairs(df, "text", "doc_id", num_hashes=16, bands=4, k=5)

    out = {}
    for tag, bulk_fn in (("row", None), ("bulk", bulk)):
        corpus = LakeTable(
            str(tmp_path / f"src_{tag}"), key_cols=["doc_id"], num_buckets=2
        )
        index = LakeTable(
            str(tmp_path / f"idx_{tag}"),
            key_cols=["term", "doc_id"],
            seq_col="_src_version",
            num_buckets=2,
        )
        corpus.apply_batch(spark, docs, "b1")
        st = refresh_inverted_index(
            spark, corpus, index, terms, bulk_pairs_fn=bulk_fn
        )
        assert st.applied and st.full_build
        out[tag] = sorted(map(tuple, index.read(spark).collect()))
    assert out["row"] == out["bulk"] and len(out["bulk"]) > 0


def test_probe_near_duplicates_validates_table_shapes(spark, tmp_path):
    from mex_extractors_spark.operators.dedup import probe_near_duplicates

    batch = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    two_key = LakeTable(str(tmp_path / "tk"), key_cols=["repo", "path"])
    idx = LakeTable(
        str(tmp_path / "i"), key_cols=["term", "doc_id"], seq_col="_src_version"
    )
    with pytest.raises(ValueError, match="single-key corpus"):
        probe_near_duplicates(spark, idx, two_key, batch)
    corpus = LakeTable(str(tmp_path / "c"), key_cols=["doc_id"])
    bad_idx = LakeTable(
        str(tmp_path / "bi"), key_cols=["term", "user_id"], seq_col="_src_version"
    )
    with pytest.raises(ValueError, match="key_cols="):
        probe_near_duplicates(spark, bad_idx, corpus, batch)


def test_index_rejects_custom_op_col(spark, tmp_path):
    """_pairs hardcodes 'op'; a custom op_col must fail the upfront
    validation, not die deep inside apply_batch."""
    import pytest

    from mex_extractors_spark.lake.index import refresh_inverted_index
    from mex_extractors_spark.lake.table import LakeTable

    src = LakeTable(str(tmp_path / "src"), key_cols=["k"], num_buckets=2)
    idx = LakeTable(
        str(tmp_path / "idx"), key_cols=["term", "k"],
        seq_col="_src_version", op_col="_op", num_buckets=2,
    )
    with pytest.raises(ValueError, match="op_col='op'"):
        refresh_inverted_index(spark, src, idx, terms_fn=lambda df: df["t"])
