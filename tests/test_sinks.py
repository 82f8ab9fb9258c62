"""Reporting sinks (K3 per-group export, K6 consent mailer) and the
S11 HTML scrape expressions (reference: sinks/s3.py:136-193,
consent_mailer/transform.py:15-61, datscha_web/extract.py:18-31)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from mex_extractors_spark.functions.html import (
    extract_field,
    extract_item_urls,
    url_item_id,
)
from mex_extractors_spark.sinks.mailer import consent_emails, write_outbox
from mex_extractors_spark.sinks.report import render_csv_bytes, write_group_reports


def test_group_reports_write_files_and_manifest(spark, tmp_path):
    df = spark.createDataFrame(
        [("b", 1, 20), ("a", 1, 10), ("c", 2, 30)], "name string, grp int, v int"
    )
    out = str(tmp_path / "reports")
    manifest = {
        r.file_name: r
        for r in write_group_reports(
            df, out, group_col="grp", entity_name="item",
            row_cols=["name", "v"], order_col="name",
        ).collect()
    }
    assert set(manifest) == {"item_1.csv", "item_2.csv"}
    assert manifest["item_1.csv"].n_rows == 2
    payload = open(os.path.join(out, "item_1.csv"), "rb").read()
    # rows sorted by order_col, header first — byte-stable rendering
    assert payload == b"name,v\na,10\nb,20"
    assert manifest["item_1.csv"].content_sha256 == hashlib.sha256(payload).hexdigest()


def test_render_csv_bytes_partition_order_invariant():
    import pandas as pd

    a = pd.DataFrame({"name": ["z", "a"], "v": [1, 2]})
    b = pd.DataFrame({"name": ["a", "z"], "v": [2, 1]})
    assert render_csv_bytes(a, ["name", "v"], "name") == render_csv_bytes(
        b, ["name", "v"], "name"
    )


def test_render_csv_bytes_escapes_delimiters_and_quotes():
    import pandas as pd

    pdf = pd.DataFrame(
        {"name": ['he said "hi"', "a,b", "line\nbreak", "clean"], "v": [1, 2, 3, 4]}
    )
    payload = render_csv_bytes(pdf, ["name", "v"], "v").decode()
    lines = payload.split("\n")
    assert lines[0] == "name,v"
    assert lines[1] == '"he said ""hi""",1'
    assert lines[2] == '"a,b",2'
    # embedded newline stays inside ONE quoted field
    assert '"line\nbreak",3' in payload
    assert lines[-1] == "clean,4"
    # round-trips through a strict CSV parser
    import csv
    import io

    rows = list(csv.reader(io.StringIO(payload)))
    assert rows[1] == ['he said "hi"', "1"]
    assert rows[3] == ["line\nbreak", "3"]


def test_group_reports_xlsx_branch_writes_real_workbooks(spark, tmp_path):
    from mex_extractors_spark.sources.xlsx import read_xlsx

    df = spark.createDataFrame(
        [("b", 1, 20), ("a", 1, 10), ("c", 2, 30)], "name string, grp int, v int"
    )
    out = str(tmp_path / "reports")
    manifest = {
        r.file_name: r
        for r in write_group_reports(
            df, out, group_col="grp", entity_name="item",
            row_cols=["name", "v"], order_col="name", file_format="xlsx",
        ).collect()
    }
    assert set(manifest) == {"item_1.xlsx", "item_2.xlsx"}
    payload = open(os.path.join(out, "item_1.xlsx"), "rb").read()
    assert manifest["item_1.xlsx"].content_sha256 == hashlib.sha256(payload).hexdigest()
    body = read_xlsx(payload)
    assert list(body.columns) == ["name", "v"]
    assert body["name"].tolist() == ["a", "b"] and body["v"].tolist() == [10, 20]
    # byte-deterministic render: a second run reproduces the same sha
    out2 = str(tmp_path / "reports2")
    manifest2 = {
        r.file_name: r.content_sha256
        for r in write_group_reports(
            df, out2, group_col="grp", entity_name="item",
            row_cols=["name", "v"], order_col="name", file_format="xlsx",
        ).collect()
    }
    assert manifest2["item_1.xlsx"] == manifest["item_1.xlsx"].content_sha256


def test_group_reports_sanitized_name_collision(spark, tmp_path):
    """Distinct groups 'a/b' and 'a_b' must yield distinct files — the
    sanitizer appends a raw-value hash whenever it alters the name."""
    df = spark.createDataFrame(
        [("a/b", "x", 1), ("a_b", "y", 2)], "grp string, name string, v long"
    )
    out = str(tmp_path / "reports")
    manifest = {
        r.file_name: r
        for r in write_group_reports(
            df, out, group_col="grp", entity_name="item",
            row_cols=["name", "v"], order_col="name",
        ).collect()
    }
    assert len(manifest) == 2
    # the clean name is untouched; the sanitized one carries a suffix
    assert "item_a_b.csv" in manifest
    dirty = next(n for n in manifest if n != "item_a_b.csv")
    assert dirty.startswith("item_a_b-") and dirty.endswith(".csv")
    for name, row in manifest.items():
        payload = open(os.path.join(out, name), "rb").read()
        assert hashlib.sha256(payload).hexdigest() == row.content_sha256


def test_consent_emails_filters_and_fills(spark):
    persons = spark.createDataFrame(
        [
            ("Ada", ["ada@rki.de", "ada@gmail.com"]),
            ("Bob", ["bob@gmail.com"]),  # no in-domain address → dropped
            ("Eve", ["e1@rki.de", "e2@rki.de"]),
        ],
        "name string, emails array<string>",
    )
    got = {r.to_field: r for r in consent_emails(persons).collect()}
    assert set(got) == {"ada@rki.de", "e1@rki.de; e2@rki.de"}
    assert got["ada@rki.de"].body == (
        "Dear Ada, please confirm your consent to be listed."
    )
    assert got["ada@rki.de"].subject == "Your consent is required"


def test_write_outbox_spools_all_messages(spark, tmp_path):
    persons = spark.createDataFrame(
        [(f"P{i}", [f"p{i}@rki.de"]) for i in range(10)],
        "name string, emails array<string>",
    )
    out = str(tmp_path / "outbox")
    manifest = write_outbox(consent_emails(persons), out).collect()
    assert sum(r.n_messages for r in manifest) == 10
    for r in manifest:
        payload = open(os.path.join(out, r.file_name), "rb").read()
        assert hashlib.sha256(payload).hexdigest() == r.content_sha256
        assert payload.count(b"From: ") == r.n_messages


def test_html_scrape_expressions(spark):
    page = (
        '<a href="item_show.php?id=7">x</a><a href="other.php?id=9">y</a>'
        '<td id="name">Alpha Beta</td><td id="missing"></td>'
    )
    row = (
        spark.range(1)
        .select(F.lit(page).alias("html"))
        .select(
            extract_item_urls("html").alias("urls"),
            extract_field("html", "name").alias("name"),
            extract_field("html", "missing").alias("missing"),
            extract_field("html", "absent").alias("absent"),
        )
        .first()
    )
    assert row.urls == ["item_show.php?id=7", "other.php?id=9"]
    assert row.name == "Alpha Beta"
    assert row.missing == "" and row.absent == ""
    ids = (
        spark.createDataFrame([(u,) for u in row.urls], "url string")
        .select(url_item_id("url").alias("i"))
        .collect()
    )
    assert [r.i for r in ids] == [7, 9]


def test_export_ndjson_reference_layout_and_checksum(spark, tmp_path):
    """K2 parity (sinks/s3.py:52-133): sorted-key JSON lines in a
    version-labeled prefix, metadata.json whose sha256 equals the
    hash of the bytes on disk; byte stream identical regardless of
    input partitioning (golden pattern tests/sinks/test_s3.py:69-79)."""
    import hashlib
    import json as _json
    import os

    from mex_extractors_spark.sinks.ndjson import export_ndjson

    df = spark.createDataFrame(
        [(2, "beta", 20), (1, "alpha", 10), (3, "gamma", 30)],
        "item_id long, name string, score long",
    )
    out = str(tmp_path / "sink")
    meta = export_ndjson(
        spark, df, out, version_label="publisher-1.0", order_cols=["item_id"]
    )
    path = os.path.join(out, "publisher-1.0", "items.ndjson")
    raw = open(path, "rb").read()
    # canonical expected bytes: sorted keys, compact separators, key order
    expected = b"".join(
        (_json.dumps(
            {"item_id": i, "name": n, "score": s},
            sort_keys=True, separators=(",", ":"),
        ) + "\n").encode()
        for i, n, s in [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)]
    )
    assert raw == expected
    assert meta["sha256_checksum"] == hashlib.sha256(raw).hexdigest()
    assert meta["item_count"] == 3
    md = _json.load(open(os.path.join(out, "publisher-1.0", "metadata.json")))
    assert md["sha256_checksum"] == meta["sha256_checksum"]

    # repartitioned input -> byte-identical stream (deterministic order)
    meta2 = export_ndjson(
        spark, df.repartition(7), str(tmp_path / "sink2"),
        version_label="publisher-1.0", order_cols=["item_id"],
    )
    assert meta2["sha256_checksum"] == meta["sha256_checksum"]

    # parts mode: per-part manifest, same total count; the driver must
    # NEVER open a part file (no single-machine byte bottleneck at
    # 100 TB) — the read-back helper is poisoned to prove it — and the
    # stream checksum is sha256 over the ordered per-part hex digests
    import mex_extractors_spark.sinks.ndjson as ndjson_mod

    real_readback = ndjson_mod._concat_and_hash_parts

    def _boom(*a, **k):
        raise AssertionError("driver opened part files in parts mode")

    ndjson_mod._concat_and_hash_parts = _boom
    try:
        meta3 = export_ndjson(
            spark, df.repartition(3), str(tmp_path / "sink3"),
            version_label="publisher-1.0", order_cols=["item_id"],
            single_file=False,
        )
    finally:
        ndjson_mod._concat_and_hash_parts = real_readback
    assert meta3["item_count"] == 3
    assert sum(f["n_rows"] for f in meta3["files"]) == 3
    assert meta3["checksum_scheme"] == "sha256-of-part-sha256s"
    hoh = hashlib.sha256()
    for f in meta3["files"]:  # manifest is part-ordered
        hoh.update(f["sha256"].encode("ascii"))
    assert meta3["sha256_checksum"] == hoh.hexdigest()
    # per-part shas still certify the bytes on storage (executor-side)
    for f in meta3["files"]:
        payload = open(os.path.join(tmp_path / "sink3", "publisher-1.0", f["file"]), "rb").read()
        assert hashlib.sha256(payload).hexdigest() == f["sha256"]
