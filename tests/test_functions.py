"""Unit tests for functions: ids, canonical, text analysis; plus the
sources layer (readers, mapping rules, normalization adapters)."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from mex_extractors_spark.checks import CheckRule, count_check
from mex_extractors_spark.functions import text as T
from mex_extractors_spark.functions.canonical import (
    canonical_json,
    content_sha256,
    row_sha256,
)
from mex_extractors_spark.functions.ids import identifier_in_primary_source, stable_id
from mex_extractors_spark.sources.mapping_rules import apply_mapping, compile_field
from mex_extractors_spark.sources.normalize import (
    analyse_person_string,
    normalize_raw_events,
    text_value,
    to_common_model,
    windows_path_to_uri,
)
from mex_extractors_spark.sources.readers import columnar_pivot, quarantine_split


def test_stable_id_deterministic_and_distinct(spark):
    df = spark.createDataFrame([("ps-1", "rec-1"), ("ps-1", "rec-2")], ["ps", "rec"])
    out = df.select(stable_id(F.lit("x"), "ps", "rec").alias("id")).collect()
    ids = [r.id for r in out]
    assert len(set(ids)) == 2
    assert all(len(i) == 22 for i in ids)
    again = [r.id for r in df.select(stable_id(F.lit("x"), "ps", "rec").alias("id")).collect()]
    assert ids == again
    # golden value lock (detects accidental derivation changes)
    golden = df.where(F.col("rec") == "rec-1").select(
        stable_id(F.lit("x"), "ps", "rec").alias("id")
    ).collect()[0].id
    assert golden == ids[0]


def test_identifier_in_primary_source(spark):
    df = spark.createDataFrame([("a", "b", 3)], ["x", "y", "z"])
    v = df.select(identifier_in_primary_source("x", "y", "z").alias("k")).collect()[0].k
    assert v == "a-b-3"


def test_canonical_row_sha_matches_python(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "val"])
    got = df.select(row_sha256(df).alias("h")).collect()[0].h
    expected = hashlib.sha256(
        json.dumps({"id": 1, "val": "x"}, separators=(",", ":"), sort_keys=True).encode()
    ).hexdigest()
    assert got == expected


def test_content_sha256_matches_python(spark):
    df = spark.createDataFrame([("hello",)], ["content"])
    got = df.select(content_sha256().alias("h")).collect()[0].h
    assert got == hashlib.sha256(b"hello").hexdigest()


def test_token_counts_and_ratios(spark):
    df = spark.createDataFrame([("Hello, world! 123",), ("",)], ["text"])
    rows = df.select(
        T.token_count("text").alias("ws"),
        T.regex_token_count("text").alias("re"),
        F.round(T.alpha_ratio("text"), 4).alias("alpha"),
    ).collect()
    assert rows[0].ws == 3
    # Hello , world ! 123 -> 5 BPE-ish tokens
    assert rows[0].re == 5
    assert rows[1].ws == 0 and rows[1].re == 0 and rows[1].alpha == 0.0


def test_detect_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und die katze ist nicht da",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    langs = [r.l for r in df.select(T.detect_lang("text").alias("l")).collect()]
    assert langs == ["en", "de", "und"]


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [("hello   world foo",), ("hello world  foo",)], ["text"]
    )
    fps = [r.fp for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is a good dog and it runs to the park",), ("!!!???",)],
        ["text"],
    )
    scores = [r.q for r in df.select(T.quality_score("text").alias("q")).collect()]
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_person_string_udf(spark):
    df = spark.createDataFrame(
        [("Dr. Ada Lovelace, Charles Babbage",), ("",), (None,), ("Prof. Curie",)],
        ["names"],
    )
    rows = df.select(analyse_person_string("names").alias("p")).collect()
    assert [(p.surname, p.givenname) for p in rows[0].p] == [
        ("Lovelace", "Ada"),
        ("Babbage", "Charles"),
    ]
    assert rows[1].p == [] and rows[2].p == []
    # single-token name: surname only, givenname stays null
    assert [(p.surname, p.givenname) for p in rows[3].p] == [("Curie", None)]


def test_windows_path_to_uri(spark):
    df = spark.createDataFrame([("C:\\data\\file.txt",), ("\\\\share\\x",)], ["p"])
    out = [r.u for r in df.select(windows_path_to_uri("p").alias("u")).collect()]
    assert out[0] == "file:///C:/data/file.txt"
    assert out[1].startswith("file://")


def test_text_value_struct(spark):
    df = spark.createDataFrame([("Titel",), (None,)], ["t"])
    rows = df.select(text_value("t", "de").alias("title")).collect()
    assert rows[0].title[0].value == "Titel" and rows[0].title[0].language == "de"
    assert rows[1].title == []


def test_mapping_rules_compile(spark):
    doc = {
        "fields": {
            "theme": {
                "fieldInPrimarySource": "src_theme",
                "mappingRules": [
                    {"forValues": ["A", "B"], "setValues": "https://x/theme-1"},
                    {"setValues": "https://x/theme-default"},
                ],
            },
            "accessRestriction": {
                "mappingRules": [{"setValues": "https://x/open"}]
            },
        }
    }
    df = spark.createDataFrame([("A",), ("Z",), (None,)], ["src_theme"])
    out = apply_mapping(df, doc).collect()
    assert [r.theme for r in out] == [
        "https://x/theme-1",
        "https://x/theme-default",
        "https://x/theme-default",
    ]
    assert all(r.accessRestriction == "https://x/open" for r in out)


def test_compile_field_no_rules():
    c = compile_field([], None)
    assert c is not None


def test_mapping_rules_list_and_text_set_values(spark):
    # seq_repo mapping defaults set vocab LISTS (theme/keyword,
    # seq_repo/transform.py:49,118) and Text objects (description)
    doc = {
        "fields": {
            "theme": {
                "fieldInPrimarySource": "src",
                "mappingRules": [
                    {"forValues": ["A"], "setValues": ["t-1", "t-2"]},
                    {"setValues": ["t-default"]},
                ],
            },
            "description": {
                "mappingRules": [
                    {"setValues": [{"value": "Beschreibung", "language": "de"}]}
                ]
            },
        }
    }
    df = spark.createDataFrame([("A",), ("Z",)], ["src"])
    out = apply_mapping(df, doc).collect()
    assert [r.theme for r in out] == [["t-1", "t-2"], ["t-default"]]
    for r in out:
        assert len(r.description) == 1
        assert r.description[0].value == "Beschreibung"
        assert r.description[0].language == "de"


def test_normalize_raw_events(spark):
    raw = spark.createDataFrame(
        [("r1", "p1", "c1", "py", "body", "7", "i")],
        ["repo-name", "file-path", "commit-sha", "language", "file-content", "sequence", "operation"],
    )
    out = normalize_raw_events(raw).collect()[0]
    assert out.repo == "r1" and out.seq == 7 and out.op == "I"


def test_to_common_model_identity_golden(spark):
    df = spark.createDataFrame([("rec-1", "T"),], ["rid", "t"])
    out = to_common_model(df, "src-sys", "rid", title_col="t").collect()[0]
    assert out.hadPrimarySource == "src-sys"
    assert out.identifierInPrimarySource == "rec-1"
    assert len(out.identifier) == 22 and len(out.stableTargetId) == 22
    assert out.identifier != out.stableTargetId
    assert out.title[0].value == "T"


def test_to_common_model_null_key_raises(spark):
    """stable_id null-propagates, so a NULL natural key would mint a
    NULL identifier that silently vanishes from downstream equi-joins —
    to_common_model must fail loudly instead (the reference's pydantic
    validation rejects a missing identifierInPrimarySource the same
    way)."""
    df = spark.createDataFrame([("rec-1",), (None,)], ["rid"])
    with pytest.raises(Exception, match="total natural key"):
        to_common_model(df, "src-sys", "rid").collect()


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (3, "bad")], ["id", "v"]
    )
    valid, bad = quarantine_split(
        df, ["v"], extra_rules=[("is_bad", F.col("v") == "bad")]
    )
    assert [r.id for r in valid.collect()] == [1]
    reasons = {r.id: r._invalid_reason for r in bad.collect()}
    assert reasons == {2: "null:v", 3: "is_bad"}


def test_columnar_pivot(spark):
    df = spark.createDataFrame([("a", 1), ("b", 1), ("a", 2)], ["x", "y"])
    out = {r.column_name: r.value_set for r in columnar_pivot(df, ["x", "y"]).collect()}
    assert out["x"] == ["a", "b"] and out["y"] == ["1", "2"]


def test_check_rules(spark):
    assert CheckRule("not_exactly_x_items", 3, "c").evaluate(3) is None
    assert CheckRule("not_exactly_x_items", 3, "c").evaluate(4) is not None
    assert CheckRule("fewer_than_x_items", 10, "c").evaluate(5) is not None
    assert CheckRule("x_percent_less_than_history", 50, "c").evaluate(10, [100]) is not None
    assert CheckRule("x_percent_less_than_history", 50, "c").evaluate(80, [100]) is None
    assert CheckRule("x_percent_less_than_history", 50, "c").evaluate(10, None) is None
    df = spark.createDataFrame([(1,), (2,)], ["x"])
    check = count_check(CheckRule("fewer_than_x_items", 5, "batch"))
    assert check(df) is not None
    check_ok = count_check(CheckRule("fewer_than_x_items", 1, "batch"))
    assert check_ok(df) is None


def test_xml_record_scan_with_author_cutoff(spark, tmp_path):
    """S6: native XML source scan + author-count cutoff filter
    (endnote/extract.py:22-60, :36-44)."""
    from mex_extractors_spark.sources.readers import parse_xml_column, read_xml_records

    xml = tmp_path / "refs.xml"
    xml.write_text(
        """<library>
  <record><title>alpha</title><authors><author>a</author></authors></record>
  <record><title>beta</title><authors><author>a</author><author>b</author><author>c</author></authors></record>
  <record><title>gamma</title><authors><author>x</author><author>y</author></authors></record>
</library>"""
    )
    df = read_xml_records(spark, str(xml), row_tag="record")
    assert df.count() == 3
    kept = read_xml_records(
        spark, str(xml), row_tag="record", max_authors=3, authors_col="authors.author"
    )
    assert sorted(r["title"] for r in kept.collect()) == ["alpha", "gamma"]

    # from_xml on a column
    sdf = spark.createDataFrame(
        [("<r><t>hi</t><n>2</n></r>",)], "payload string"
    )
    parsed = parse_xml_column(sdf, "payload", "t STRING, n INT")
    row = parsed.select("parsed.t", "parsed.n").first()
    assert (row["t"], row["n"]) == ("hi", 2)


def test_nfc_normalize_collapses_decomposed_forms(spark):
    from mex_extractors_spark.functions.text import nfc_normalize

    rows = [
        (1, "café"),  # cafe + combining acute -> café
        (2, "café"),  # already composed
        (3, ""),
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {r.id: r.n for r in df.select("id", nfc_normalize("s").alias("n")).collect()}
    assert got[1] == got[2] == "café"
    assert len(got[1]) == 4
    assert got[3] == "" and got[4] is None and got[5] == "plain ascii"


def test_title_regex_never_strips_name_prefixes(spark):
    from mex_extractors_spark.sources.normalize import analyse_person_string

    df = spark.createDataFrame(
        [("Ingrid Curie, Medina Lopez, Drew Barry, Dr. Ada Lovelace",)],
        "s string",
    )
    rows = df.select(analyse_person_string("s").alias("p")).collect()[0]["p"]
    got = [(r["givenname"], r["surname"]) for r in rows]
    assert got == [
        ("Ingrid", "Curie"),
        ("Medina", "Lopez"),
        ("Drew", "Barry"),
        ("Ada", "Lovelace"),  # a real title still strips
    ]


def test_stable_id_null_part_yields_null_not_collision(spark):
    from mex_extractors_spark.functions.ids import stable_id

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", None)], "p string, q string"
    )
    out = df.select(stable_id("p", "q").alias("sid")).collect()
    assert out[0]["sid"] is not None
    # null components do NOT collapse to one shared identity
    assert out[1]["sid"] is None and out[2]["sid"] is None


def test_windows_path_to_uri_unc(spark):
    from mex_extractors_spark.sources.normalize import windows_path_to_uri

    df = spark.createDataFrame(
        [("\\\\server\\share\\f.txt",), ("C:\\data\\f.txt",)], "p string"
    )
    got = [r["u"] for r in df.select(windows_path_to_uri("p").alias("u")).collect()]
    assert got == ["file://server/share/f.txt", "file:///C:/data/f.txt"]


def test_author_cutoff_keeps_null_author_arrays(spark):
    from mex_extractors_spark.operators.filters import author_count_cutoff

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, None), (3, ["a", "b", "c"])],
        "id long, authors array<string>",
    )
    kept = {r["id"] for r in author_count_cutoff(df, "authors", 3).collect()}
    assert kept == {1, 2}  # null authors kept, 3-author record dropped


def test_read_xml_records_accepts_path_list(spark, tmp_path):
    from mex_extractors_spark.sources.readers import read_xml_records

    for i, name in enumerate(["a.xml", "b.xml"]):
        (tmp_path / name).write_text(
            f"<root><rec><id>{i}</id></rec></root>"
        )
    df = read_xml_records(
        spark, [str(tmp_path / "a.xml"), str(tmp_path / "b.xml")], row_tag="rec"
    )
    assert sorted(r["id"] for r in df.collect()) == [0, 1]
