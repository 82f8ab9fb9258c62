"""all_extractors lifecycle analog: two heterogeneous sources → common
model → shared get-or-create dim → one lake table → publish filter
(pipeline/base.py:204-211; SURVEY.md §3.2-3.3)."""

from __future__ import annotations

import hashlib

from mex_extractors_spark.plans.compose import (
    SourceSpec,
    compose_sources,
    publish_multi_source,
)

_BASE62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _stable_id_py(*parts: str, length: int = 22) -> str:
    """Pure-Python mirror of functions.ids.stable_id — golden oracle."""
    digest = hashlib.sha256("\x1f".join(parts).encode()).hexdigest()
    return "".join(
        _BASE62[int(digest[2 * i : 2 * i + 2], 16) % 62] for i in range(length)
    )


def _sources(spark):
    # heterogeneous shapes: ints + org refs vs strings + owner orgs
    crm = spark.createDataFrame(
        [(1, "Alpha project", "org-x"), (2, "Beta project", "org-y")],
        "proj_id int, proj_name string, org string",
    )
    hr = spark.createDataFrame(
        [("s1", "Gamma study", "org-x")],
        "code string, label string, owner_org string",
    )
    return [
        (crm, SourceSpec("crm", "proj_id", "proj_name", "org")),
        (hr, SourceSpec("hr", "code", "label", "owner_org")),
    ]


def test_compose_mints_shared_org_ids_and_golden_identity(spark):
    org_dim = spark.createDataFrame([], "org_key string, org_id string")
    items, dim = compose_sources(_sources(spark), org_dim)
    rows = {r.identifierInPrimarySource: r.asDict() for r in items.collect()}
    assert set(rows) == {"1", "2", "s1"}

    # golden identity: same derivation as the reference's deterministic
    # identity tests (tests/seq_repo/test_transform.py:30-42 shape)
    assert rows["1"]["identifier"] == _stable_id_py("identifier", "crm", "1")
    assert rows["s1"]["stableTargetId"] == _stable_id_py("stableTargetId", "hr", "s1")
    assert len(rows["1"]["identifier"]) == 22

    # SHARED dim: org-x referenced by both sources -> ONE id
    assert rows["1"]["org_id"] == rows["s1"]["org_id"]
    assert rows["1"]["org_id"] != rows["2"]["org_id"]
    assert {r.org_key for r in dim.collect()} == {"org-x", "org-y"}
    assert rows["1"]["title_text"] == "Alpha project"


def test_publish_end_to_end_with_deny_filter(spark, tmp_path):
    org_dim = spark.createDataFrame([], "org_key string, org_id string")
    published, table = publish_multi_source(
        spark,
        _sources(spark),
        org_dim,
        str(tmp_path / "lake"),
        deny_primary_sources=("hr",),
    )
    got = {(r.hadPrimarySource, r.identifierInPrimarySource) for r in published.collect()}
    assert got == {("crm", "1"), ("crm", "2")}
    # the lake holds ALL sources; publishing filters
    assert table.read(spark).count() == 3

    # idempotent re-publish: same batch id -> version unchanged
    v0 = table.current_snapshot()["version"]
    publish_multi_source(
        spark,
        _sources(spark),
        org_dim,
        str(tmp_path / "lake"),
        deny_primary_sources=("hr",),
    )
    assert table.current_snapshot()["version"] == v0
