"""Unit tests for operators: filters, joins, aggregates, dedup,
similarity, multimodal (golden-output style, SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.operators import dedup, similarity
from mex_extractors_spark.operators.aggregates import (
    distinct_value_set,
    first_of_group,
    group_collect,
    group_minmax,
    outbound_connection_count,
    union_of_key_sets,
)
from mex_extractors_spark.operators.filters import (
    author_count_cutoff,
    deny_list_filter,
    drop_counts,
    exactly_one_gate,
    filter_cascade,
    keep_singletons,
    kept,
    subtree_members,
    year_floor_filter,
)
from mex_extractors_spark.operators.joins import (
    broadcast_lookup,
    get_or_create_dim,
    lookup_with_fallback,
    self_link_successor,
    synonym_lookup,
    topological_levels,
)
from mex_extractors_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_filter_cascade_first_reason_wins(spark):
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 3, "y"), (3, 3, "denied"), (4, 9, "ok")],
        ["id", "qty", "partner"],
    )
    tagged = filter_cascade(
        df,
        [
            ("deny_partner", F.col("partner") == "denied"),
            ("low_qty", F.col("qty") < 5),
        ],
    )
    got = {r.id: r.drop_reason for r in tagged.collect()}
    # row 3 matches BOTH rules; first rule in order wins
    assert got == {1: None, 2: "low_qty", 3: "deny_partner", 4: None}
    assert kept(tagged).count() == 2
    counts = {r.drop_reason: r.n_dropped for r in drop_counts(tagged).collect()}
    assert counts == {"deny_partner": 1, "low_qty": 1}


def test_keep_singletons(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    assert [r.k for r in keep_singletons(df, ["k"]).collect()] == [2]


def test_deny_list_filter(spark):
    df = spark.createDataFrame(
        [(1, ["Acme Corp", "Uni X"]), (2, ["Globex"])], ["id", "partners"]
    )
    out = deny_list_filter(df, "partners", ["acme", "Acme"])
    assert [r.id for r in out.collect()] == [2]


def test_year_floor_filter(spark):
    df = spark.createDataFrame(
        [(1, "2015-06-01"), (2, "1999-01-01")], ["id", "d"]
    ).withColumn("d", F.to_date("d"))
    assert [r.id for r in year_floor_filter(df, "d", 2000).collect()] == [1]


def test_exactly_one_gate(spark):
    df = spark.createDataFrame(
        [("q1", 1), ("q2", 2), ("q2", 3)], ["query", "person"]
    )
    ok = exactly_one_gate(df, ["query"])
    assert [r.person for r in ok.collect()] == [1]
    violations = exactly_one_gate(df, ["query"], error_if_many=True)
    assert violations.count() == 2


def test_author_count_cutoff(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["a", "b", "c"])], ["id", "authors"])
    assert [r.id for r in author_count_cutoff(df, "authors", 3).collect()] == [1]


def test_subtree_members(spark):
    edges = spark.createDataFrame(
        [("root", None), ("a", "root"), ("b", "a"), ("c", "b"), ("other", None)],
        ["unit_id", "parent_unit_id"],
    )
    got = sorted(r.unit_id for r in subtree_members(edges, ["a"]).collect())
    assert got == ["a", "b", "c"]


def test_subtree_members_numeric_ids(spark):
    """Frontier column type is derived from the edge table — bigint ids
    must join as bigint, never through an implicit string cast (lossy
    above 2^53)."""
    edges = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (9, None)],
        "unit_id bigint, parent_unit_id bigint",
    )
    sub = subtree_members(edges, [2])
    assert sub.schema["unit_id"].dataType.typeName() == "long"
    assert sorted(r.unit_id for r in sub.collect()) == [2, 3]


def test_broadcast_lookup_and_fallback(spark):
    fact = spark.createDataFrame([(1, "u1"), (2, "u9")], ["id", "unit"])
    dim = spark.createDataFrame([("u1", "Unit One")], ["unit", "unit_name"])
    out = broadcast_lookup(fact, dim, "unit").collect()
    assert {r.id: r.unit_name for r in out} == {1: "Unit One", 2: None}
    fb = lookup_with_fallback(fact, dim, "unit", "unit_name", "FALLBACK")
    assert {r.id: r.unit_name for r in fb.collect()} == {1: "Unit One", 2: "FALLBACK"}
    # plan must use broadcast hash join, not sort-merge
    plan = broadcast_lookup(fact, dim, "unit")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_get_or_create_dim(spark):
    dim = spark.createDataFrame([("RKI", "id-1")], ["label", "org_id"])
    needed = spark.createDataFrame([("RKI",), ("WHO",), (None,)], ["label"])
    out = get_or_create_dim(dim, needed, "label", "org_id", "org")
    rows = {r.label: r.org_id for r in out.collect()}
    assert rows["RKI"] == "id-1"
    assert rows["WHO"] is not None and len(rows["WHO"]) == 22
    # deterministic: same id when run twice
    again = get_or_create_dim(dim, needed, "label", "org_id", "org")
    assert {r.label: r.org_id for r in again.collect()} == rows


def test_synonym_lookup(spark):
    fact = spark.createDataFrame([(1, "Abt. 1"), (2, "zzz")], ["id", "unit_name"])
    dim = spark.createDataFrame(
        [("u1", ["Abt. 1", "Abteilung 1"])], ["unit_id", "synonyms"]
    )
    out = {r.id: r.unit_id for r in synonym_lookup(fact, dim, "unit_name").collect()}
    assert out == {1: "u1", 2: None}


def test_self_link_successor(spark):
    df = spark.createDataFrame(
        [("proj-a", None, "ID-A"), ("proj-b", "proj-a", "ID-B")],
        ["shortName", "anschlussprojekt", "stableTargetId"],
    )
    out = self_link_successor(df, "shortName", "anschlussprojekt", "stableTargetId")
    got = {r.shortName: r.succeeds for r in out.collect()}
    assert got == {"proj-a": None, "proj-b": "ID-A"}


def test_topological_levels_and_cycle(spark):
    edges = spark.createDataFrame(
        [("r", None), ("a", "r"), ("b", "a"), ("x", "y"), ("y", "x")],
        ["unit_id", "parent_unit_id"],
    )
    got = {r.unit_id: r.level for r in topological_levels(edges).collect()}
    assert got["r"] == 0 and got["a"] == 1 and got["b"] == 2
    # cycle members never stabilize -> null level (caller can fail loudly)
    assert got["x"] is None and got["y"] is None


def test_group_aggs(spark):
    df = spark.createDataFrame(
        [("k", "2020-01-01"), ("k", "2021-05-05")], ["id", "d"]
    )
    mm = group_minmax(df, ["id"], "d").collect()[0]
    assert mm.start == "2020-01-01" and mm.modified == "2021-05-05"
    sets = distinct_value_set(
        spark.createDataFrame([("g", "b"), ("g", "a"), ("g", "a")], ["k", "v"]),
        ["k"],
        "v",
    ).collect()[0]
    assert sets.value_set == ["a", "b"]
    fog = first_of_group(
        spark.createDataFrame([("g", 2, "x"), ("g", 1, "y")], ["k", "o", "v"]),
        ["k"],
        "o",
    ).collect()[0]
    assert fog.v == "y"
    uks = union_of_key_sets(
        spark.createDataFrame([("a", "b"), ("a", "c")], ["k1", "k2"]), "k1", "k2"
    )
    assert sorted(r.key for r in uks.collect()) == ["a", "b", "c"]
    occ = spark.createDataFrame(
        [("x", None, "z")], "r1 string, r2 string, r3 string"
    ).select(outbound_connection_count("r1", "r2", "r3").alias("n"))
    assert occ.collect()[0].n == 2


def test_group_collect_sorted(spark):
    df = spark.createDataFrame([("g", 2), ("g", 1)], ["k", "v"])
    out = group_collect(df, ["k"], ["v"]).collect()[0]
    assert [x.v for x in out["items"]] == [1, 2]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["doc_id", "text"]
    )
    groups = dedup.exact_duplicates(df).collect()
    assert len(groups) == 1 and groups[0].dup_count == 2 and groups[0].keep_id == 1
    survivors = sorted(r.doc_id for r in dedup.dedup_exact(df).collect())
    assert survivors == [1, 3]


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, "completely different content about spark aggregation plans"),
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.minhash_near_duplicates(df, threshold=0.5, num_hashes=16, bands=8, k=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)


def test_simhash_near_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        # doubled text has identical token-weight *ratios* -> identical
        # simhash (weight-scaling invariance), so (1,2) is hamming 0
        [(1, base), (2, base + " " + base), (3, "unrelated words entirely differ")],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_near_duplicates(df, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got and (2, 3) not in got


def test_simhash_bucketing_recall_at_mid_hamming(spark):
    """Recall contract: bucketed pair search equals brute-force all-pairs
    hamming for max_hamming=6, on a corpus that CONTAINS pairs at
    hamming 4-6 (the regime the old fixed 4x16-bit chunking silently
    dropped — pigeonhole over 4 chunks only guarantees hamming <= 3)."""
    from pyspark.sql import functions as F

    base = ("w%d" % i for i in range(40))
    base_words = list(base)
    rows = []
    # perturb j words of the base text -> a spread of hamming distances
    for doc_id in range(30):
        words = list(base_words)
        for j in range(doc_id % 7):
            words[j] = f"x{doc_id}_{j}"
        rows.append((doc_id, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    sigs = df.select("doc_id", dedup.simhash64("text").alias("sig"))
    l, r = sigs.alias("l"), sigs.alias("r")
    brute = (
        l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 6)
    )
    expected = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    # the test corpus must actually exercise hamming 4-6
    assert any(4 <= h <= 6 for _, _, h in expected), sorted(expected)

    got_rows = dedup.simhash_near_duplicates(df, max_hamming=6).collect()
    got = {(r.id_a, r.id_b, r.hamming) for r in got_rows}
    assert got == expected


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame([(1, "abcdef"), (2, "abcdef"), (3, "zzzzzz")], ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(df, k=3, threshold=0.5, max_shingle_df=None).collect()
    assert len(pairs) == 1
    assert pairs[0].id_a == 1 and pairs[0].id_b == 2 and pairs[0].jaccard == 1.0


def test_cosine_topk_and_lsh(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = similarity.cosine_topk(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in top] == [1, 2]
    ann = similarity.ann_lsh_topk(
        df, [1.0, 0.0, 0.0, 0.0], k=2, num_planes=4, multiprobe_bits=1
    ).collect()
    assert 1 in [r.vec_id for r in ann]
    assign = similarity.ivf_assignments(df, num_centroids=2).collect()
    assert len(assign) == 4 and all(r.centroid_id is not None for r in assign)


def test_kmeans_refine_recovers_planted_clusters(spark):
    # three tight, well-separated clusters; seeds land wherever md5 puts
    # them — two Lloyd's iterations must still co-assign each cluster
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = [
        (c * 100 + i, [v + 0.01 * ((i * 7 + d) % 5) for d, v in enumerate(base)])
        for c, base in enumerate(centers)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = similarity.kmeans_refine(df, num_centroids=3, iterations=2).collect()
    assert len(got) == 36
    by_cluster: dict[int, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r.centroid_id, set()).add(r.vec_id // 100)
    # every final centroid serves exactly one planted cluster
    assert all(len(planted) == 1 for planted in by_cluster.values())
    assert len(by_cluster) == 3
    # refined centroids sit near the cluster mean: distances are tiny
    assert all(r.l2_dist < 0.1 for r in got)


def test_kmeans_high_dim_constant_plan_size(spark):
    # a 256-dim embedding must not plan 256 aggregate expressions: the
    # centroid recompute is posexplode + ONE avg at any dimensionality
    dim = 256
    rows = [
        (c * 100 + i, [float(c) * 10 + 0.01 * ((i + d) % 3) for d in range(dim)])
        for c in range(2)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from pyspark.sql import functions as F

    assigned = df.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
        F.lit(0).alias("_cid"),
    )
    plan = similarity.cluster_means(assigned)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("avg(") == 1
    assert "_v[255]" not in plan and "_v[10]" not in plan

    got = similarity.kmeans_refine(df, num_centroids=2, iterations=2).collect()
    assert len(got) == 12
    by_cluster: dict[int, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r.centroid_id, set()).add(r.vec_id // 100)
    assert len(by_cluster) == 2
    assert all(len(planted) == 1 for planted in by_cluster.values())


def test_real_codec_round_trip_and_dispatch():
    import numpy as np

    from mex_extractors_spark.operators.multimodal import (
        bmp_bytes,
        decode_bmp,
        decode_features,
        decode_wav,
        wav_bytes,
    )

    y, x = np.mgrid[0:5, 0:7]
    r = ((3 * x + 7 * y) % 256).astype(np.uint8)
    g = ((5 * x + y + 1) % 256).astype(np.uint8)
    b = ((x + 13 * y + 11) % 256).astype(np.uint8)
    w_, h_, mr, mg, mb = decode_bmp(bmp_bytes(r, g, b))
    assert (w_, h_) == (7, 5)
    assert (mr, mg, mb) == (float(r.mean()), float(g.mean()), float(b.mean()))

    s = (((np.arange(600) * 17) % 501) - 250).astype(np.int64)
    n, dur, rms, zcr, sr = decode_wav(wav_bytes(s, sample_rate=8000))
    assert (n, sr) == (600, 8000) and dur == 600 / 8000
    assert rms == float(np.sqrt((s.astype(np.float64) ** 2).mean()))
    sign = s >= 0
    assert zcr == float(np.count_nonzero(sign[1:] != sign[:-1])) / 599

    # dispatch: magic bytes pick the real codec; opaque -> hash stub
    feat_img = decode_features(bmp_bytes(r, g, b), "image")
    assert feat_img[:2] == [7.0, 5.0] and feat_img[5] == 3.0
    feat_aud = decode_features(wav_bytes(s), "audio")
    assert feat_aud[0] == 600.0 and feat_aud[4] == 8000.0 and feat_aud[5] == 1.0
    feat_hash = decode_features(b"not a media payload", "image")
    assert len(feat_hash) == 8 and all(0.0 <= v <= 1.0 for v in feat_hash)
    with pytest.raises(ValueError, match="NULL payload"):
        decode_features(None, "image")

    # magic-byte FALSE POSITIVES must not kill a corpus-scale job:
    # arbitrary bytes can start with 'BM' (1 in 65,536 sha payloads
    # does) and WebP/AVI share the RIFF magic — each falls back to the
    # hash feature instead of raising out of the task
    import struct

    def _is_hash_feat(feat: list[float]) -> bool:
        return len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)

    bogus_8bpp = b"BM" + struct.pack("<IHHI", 60, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 0, 0
    ) + b"\x00" * 8
    assert _is_hash_feat(decode_features(bogus_8bpp, "image"))
    assert _is_hash_feat(decode_features(b"BM" + b"\x07" * 30, "image"))
    assert _is_hash_feat(decode_features(b"RIFF\x04\x00\x00\x00WEBP", "image"))
    # crafted WAV header with sample_rate=0: stdlib wave parses it
    # happily, so duration would divide by zero without the guard
    zero_sr = (
        b"RIFF$\x00\x00\x00WAVE"
        + b"fmt \x10\x00\x00\x00"
        + struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
        + b"data\x00\x00\x00\x00"
    )
    assert _is_hash_feat(decode_features(zero_sr, "audio"))
    # crafted BMP declaring ~2^31 x 2^31 pixels: frombuffer's count
    # would overflow C ssize_t (OverflowError — NOT a decode error, so
    # it would leak past the fall-through) unless dimensions are
    # bounds-checked against the actual payload first
    huge = b"BM" + struct.pack("<IHHI", 60, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2**31 - 1, 2**31 - 1, 1, 24, 0, 4, 0, 0, 0, 0
    ) + b"\x00" * 8
    assert _is_hash_feat(decode_features(huge, "image"))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(huge)

    # the direct decoders still fail loudly (callers that KNOW the
    # format keep the strict contract)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bogus_8bpp)


def test_png_codec_round_trip_and_filters():
    import struct
    import zlib

    import numpy as np

    from mex_extractors_spark.operators.multimodal import (
        PNG_MAGIC,
        _png_chunk,
        decode_features,
        decode_png,
        png_bytes,
    )

    rng = np.random.RandomState(11)
    # heights >= 5 cycle through ALL five scanline filters on encode,
    # so a passing decode proves Sub/Up/Average/Paeth reconstruction
    for h, w in [(1, 1), (3, 4), (7, 5), (16, 33), (5, 1)]:
        r, g, b = (rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(3))
        w_, h_, mr, mg, mb = decode_png(png_bytes(r, g, b))
        assert (w_, h_) == (w, h)
        assert (mr, mg, mb) == (float(r.mean()), float(g.mean()), float(b.mean()))

    r, g, b = (rng.randint(0, 256, (11, 9)).astype(np.uint8) for _ in range(3))
    good = png_bytes(r, g, b)

    # dispatch: PNG magic -> real decode, tagged 4.0
    feat = decode_features(good, "image")
    assert feat[:2] == [9.0, 11.0] and feat[5] == 4.0

    # corrupted chunk CRC fails loudly in the strict decoder and falls
    # through to the hash feature in the corpus-safe dispatch
    bad = bytearray(good)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))
    fallback = decode_features(bytes(bad), "image")
    assert len(fallback) == 8 and all(0.0 <= v <= 1.0 for v in fallback)

    # truncation, unsupported color type, and zip-bomb headers all die
    # as ValueError (never an allocation or OverflowError)
    with pytest.raises(ValueError):
        decode_png(good[:40])
    gray = PNG_MAGIC + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    ) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="only 8-bit"):
        decode_png(gray)
    bomb = PNG_MAGIC + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2**20, 2**20, 8, 2, 0, 0, 0)
    ) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64)) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="out of bounds"):
        decode_png(bomb)


def test_avi_codec_round_trip_and_frame_features(spark):
    import numpy as np

    from mex_extractors_spark.operators.multimodal import (
        avi_bytes,
        decode_avi,
        decode_features,
        extract_frame_features,
        synth_avi_media,
        synth_png_media,
    )

    rng = np.random.RandomState(13)
    frames = [rng.randint(0, 256, (6, 5, 3)).astype(np.uint8) for _ in range(4)]
    w, h, fps, out = decode_avi(avi_bytes(frames, fps=2))
    assert (w, h, fps) == (5, 6, 2.0)
    assert len(out) == 4 and all((a == b).all() for a, b in zip(frames, out))

    feat = decode_features(avi_bytes(frames, fps=2), "video")
    assert feat[:6] == [4.0, 2.0, 5.0, 6.0, 2.0, 2.0]

    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="at least one frame"):
        avi_bytes([], fps=2)
    # truncated mid-frame: strict decode raises, dispatch falls through
    cut = avi_bytes(frames, fps=2)[:-20]
    with pytest.raises(ValueError):
        decode_avi(cut)
    fallback = decode_features(cut, "video")
    assert len(fallback) == 8 and all(0.0 <= v <= 1.0 for v in fallback)

    # nested-LIST bomb: thousands of nested LISTs must die as ValueError
    # in the iterative walk (a recursive walk raised RecursionError,
    # which escaped decode_features' fall-through contract)
    import struct as _s

    inner = b""
    for _ in range(3000):
        inner = b"LIST" + _s.pack("<I", len(inner) + 4) + b"bomb" + inner
    bomb = b"RIFF" + _s.pack("<I", len(inner) + 4) + b"AVI " + inner
    with pytest.raises(ValueError):
        decode_avi(bomb)
    fallback = decode_features(bomb, "video")
    assert len(fallback) == 8 and all(0.0 <= v <= 1.0 for v in fallback)

    # negative biHeight = top-down DIB: same pixel bytes, opposite row
    # order — the decoder must NOT flip them
    good = avi_bytes(frames, fps=2)
    strf_data = good.index(b"strf") + 8
    assert _s.unpack_from("<i", good, strf_data + 8)[0] == 6  # biHeight
    patched = bytearray(good)
    _s.pack_into("<i", patched, strf_data + 8, -6)
    _, _, _, flipped = decode_avi(bytes(patched))
    assert all((a == b[::-1]).all() for a, b in zip(flipped, frames))

    # Spark plumbing: synth -> real frame decode, means match numpy
    ids = spark.range(6).withColumnRenamed("id", "media_id")
    rows = extract_frame_features(synth_avi_media(ids), every_ms=500).collect()
    mid = 4  # w = 4 + 4%4 = 4, h = 3 + 4%3 = 4, nf = 2 + 4%4 = 2
    got = {r.frame_idx: r for r in rows if r.media_id == mid}
    assert set(got) == {0, 1}
    y, x = np.mgrid[0:4, 0:4]
    for f in (0, 1):
        assert got[f].ts_ms == f * 500
        assert got[f].mean_r == float(((mid + 2 * f + 3 * x + 5 * y) % 256).mean())
        assert got[f].mean_g == float(
            ((2 * mid + f + x + 7 * y + 3) % 256).mean()
        )
        assert got[f].mean_b == float(
            ((mid + 4 * f + 5 * x + y + 9) % 256).mean()
        )

    # PNG synth path end-to-end through the Arrow-batched extractor
    from mex_extractors_spark.operators.multimodal import extract_features

    png_media = synth_png_media(ids)
    feats = {r.media_id: r.feature for r in extract_features(png_media).collect()}
    assert feats[3][:2] == [4.0 + 3 % 6, 3.0 + 3 % 5] and feats[3][5] == 4.0

    # corpus-safe contract: undecodable 'video' payloads (synth_media's
    # hash stubs) yield zero rows instead of killing the job
    from mex_extractors_spark.operators.multimodal import synth_media

    junk = synth_media(spark, 30).where(F.col("kind") == "video")
    assert junk.count() > 0
    assert extract_frame_features(junk, every_ms=500).count() == 0


def test_synth_real_media_features(spark):
    from mex_extractors_spark.operators.multimodal import (
        extract_features,
        synth_real_media,
    )

    ids = spark.range(20).withColumnRenamed("id", "media_id")
    media = synth_real_media(ids)
    rows = {r.media_id: r for r in media.collect()}
    assert rows[4].kind == "image" and rows[4].mime == "image/bmp"
    assert rows[4].width == 4 + 4 % 5 and rows[4].height == 3 + 4 % 4
    assert rows[7].kind == "audio" and rows[7].duration_ms == (400 + 200) * 1000 // 8000
    feats = {r.media_id: r.feature for r in extract_features(media, dim=8).collect()}
    assert feats[4][0] == float(rows[4].width)
    assert feats[7][0] == 400.0 + (7 % 5) * 100
    assert feats[7][4] == 8000.0


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 30)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.payload_sha256 and len(r.payload_sha256) == 64 for r in rows)
    # deterministic across runs
    again = extract_features(media, dim=8).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    frames = frame_sample_plan(media, every_ms=1000)
    per_video = frames.groupBy("media_id").count().collect()
    # frames span [0, duration_ms) — the default 3000 ms plans exactly
    # 0,1000,2000 (a grab at ts=3000 would address a nonexistent frame)
    assert all(r["count"] == 3 for r in per_video)
    # zero-duration videos plan no frames instead of tripping sequence
    zero = media.where("kind = 'video'").withColumn(
        "duration_ms", F.lit(0).cast("long")
    )
    assert frame_sample_plan(zero, every_ms=1000).count() == 0


def test_dedup_components_planted_graph(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
    # components: {1,2,3} via chain 1-2, 2-3; {5,7}; singletons 4, 6, 8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 7)], ["id_a", "id_b"]
    )
    got = {
        r.doc_id: r.component_id
        for r in dedup.dedup_components(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 5, 8: 8}


def test_dedup_components_long_chain_converges(spark):
    n = 12  # diameter > a couple of rounds: 1-2-3-...-12
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["id_a", "id_b"]
    )
    got = dedup.dedup_components(docs, pairs).collect()
    assert all(r.component_id == 1 for r in got) and len(got) == n


def test_dedup_components_thousand_doc_chain(spark):
    """A planted 1,000-doc duplicate chain (diameter 999 >> the default
    20-round cap) must converge — pointer doubling makes rounds scale
    with log2(diameter), not diameter."""
    n = 1000
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["id_a", "id_b"]
    )
    got = dedup.dedup_components(docs, pairs).collect()
    assert len(got) == n
    assert all(r.component_id == 1 for r in got)


def test_repetition_signals(spark):
    from mex_extractors_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # dup tokens 4/6; "a b" 3 of 5 bigrams
            (2, "x y z"),            # all distinct
            (3, ""),                 # degenerate
            (4, "one"),              # no bigrams
        ],
        ["doc_id", "text"],
    )
    rep = {
        r.doc_id: r
        for r in df.select(
            "doc_id", T.dup_token_fraction("text").alias("d")
        ).join(T.top_bigram_fraction(df), "doc_id").collect()
    }
    assert rep[1].d == round(1 - 2 / 6, 6) and rep[1].top_bigram_fraction == 0.6
    assert rep[2].d == 0.0 and rep[2].top_bigram_fraction == round(1 / 2, 6)
    assert rep[3].d == 0.0 and rep[3].top_bigram_fraction == 0.0
    assert rep[4].d == 0.0 and rep[4].top_bigram_fraction == 0.0


def test_decontaminate_planted_overlap(spark):
    """A corpus doc embedding a verbatim benchmark passage is flagged
    with the exact distinct-shingle overlap count; clean docs are not."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the bench passage verbatim -> contaminated
            (1, "prefix text the quick brown fox jumps over the lazy dog tonight suffix"),
            # no 10-gram overlap -> clean
            (2, "completely unrelated content with zero shared character grams at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.matched_shingles)
        for r in dedup.decontaminate(
            corpus, bench, text_col="text", id_col="doc_id", k=10, min_matches=3
        ).collect()
    }
    assert {d for d, _m in got} == {1}
    # overlap = every 10-gram of the 51-char passage = 51-10+1 = 42
    ((doc, m),) = got
    assert m == 42


def test_ivf_topk_full_probe_equals_exact(spark):
    """Probing every inverted list degrades IVF to exact search — the
    recall dial's upper endpoint must equal brute-force cosine top-k."""
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [0.3, -0.2, 0.9, 0.1, -0.5, 0.4, 0.0, 0.7]
    exact = [tuple(r) for r in similarity.cosine_topk(df, q, k=5).collect()]
    full_probe = [
        tuple(r)
        for r in similarity.ivf_topk(
            df, q, k=5, num_centroids=6, nprobe=6
        ).collect()
    ]
    assert full_probe == exact
    # narrow probe returns a subset-quality result: valid ids, k rows
    narrow = similarity.ivf_topk(df, q, k=5, num_centroids=6, nprobe=1).collect()
    assert len(narrow) == 5 and all(0 <= r.vec_id < 60 for r in narrow)


def test_derive_num_planes_scales_with_corpus():
    """The LSH plane count must grow with the corpus so expected bucket
    occupancy (and therefore candidates/doc) stays bounded — a fixed
    plane count makes the candidate join ~n^2/2^planes (BENCH/LSH.md)."""
    from mex_extractors_spark.operators.similarity import derive_num_planes

    assert derive_num_planes(10) == 4  # tiny corpus: floor
    p_small = derive_num_planes(10_000)
    p_mid = derive_num_planes(640_000)
    p_big = derive_num_planes(40_000_000)
    assert p_small < p_mid < p_big
    # expected occupancy bounded by the target wherever unclamped
    for n in (10_000, 1_000_000, 100_000_000):
        p = derive_num_planes(n)
        if p < 24:
            assert n / 2**p <= 64
    assert derive_num_planes(2**60) == 24  # clamp documents the recall floor


def test_derive_ivf_params_tracks_measured_curve():
    """The IVF defaults must encode the measured recall/scan-fraction
    curve (BENCH/ANN.md): num_centroids ~ sqrt(n) balances centroid
    scoring vs list scanning, and nprobe starts at the measured
    0.9-recall point (nprobe=2) with one doubling per halving of the
    allowed missed mass."""
    from mex_extractors_spark.operators.similarity import derive_ivf_params

    c, p = derive_ivf_params(20_000)
    assert c == 141 and p == 2  # sqrt(20k), the 0.91-recall@3.4%-scan point
    assert derive_ivf_params(1_000_000)[0] == 1000
    assert derive_ivf_params(10)[0] == 8  # tiny-corpus floor
    assert derive_ivf_params(10**12)[0] == 4096  # cap: lists stay scannable
    # recall ladder: each halving of missed mass doubles nprobe
    assert derive_ivf_params(20_000, recall_target=0.95)[1] == 4
    assert derive_ivf_params(20_000, recall_target=0.975)[1] == 8
    # nprobe can never exceed the list count (probe-all == exact)
    c, p = derive_ivf_params(70, recall_target=0.999)
    assert p <= c
    # per-query work 2*nprobe*sqrt(n) stays sublinear at 10^10 rows
    c, p = derive_ivf_params(10**10)
    assert c * p < 10**10 / 100


def test_lookup_duplicate_keys_resolve_like_reference_dict(spark):
    """A name/synonym carried by several rows must resolve to exactly
    ONE id (greatest — the deterministic analog of the reference's
    dict-overwrite build), not fan the fact row out per candidate."""
    df = spark.createDataFrame(
        [("A", None, 1), ("A", None, 2), ("B", "A", 3)],
        "shortName string, anschlussprojekt string, stableTargetId long",
    )
    linked = self_link_successor(
        df, "shortName", "anschlussprojekt", "stableTargetId"
    )
    rows = linked.where(F.col("stableTargetId") == 3).collect()
    assert len(rows) == 1 and rows[0]["succeeds"] == 2
    # opt-out keeps SQL fan-out semantics
    fan = self_link_successor(
        df, "shortName", "anschlussprojekt", "stableTargetId",
        unique_names=False,
    )
    assert fan.where(F.col("stableTargetId") == 3).count() == 2

    dim = spark.createDataFrame(
        [(10, ["x"]), (20, ["x"])], "unit_id long, synonyms array<string>"
    )
    fact = spark.createDataFrame([(1, "x")], "id long, unit_name string")
    resolved = synonym_lookup(fact, dim, "unit_name", id_col="unit_id")
    got = resolved.collect()
    assert len(got) == 1 and got[0]["unit_id"] == 20
    assert synonym_lookup(fact, dim, "unit_name").count() == 2  # default: SQL
