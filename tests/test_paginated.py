"""Paginated-API scan adapter (S9/S10/S12): probe, retry, auth,
parallel fan-out (reference: open_data/connector.py:29-72,
confluence_vvt/extract.py:20-76, blueant/connector.py:13-45)."""

from __future__ import annotations

import pytest

from mex_extractors_spark.sources.paginated import (
    CHILD_SCHEMA,
    EXPECTED_TOKEN,
    RECORD_SCHEMA,
    AuthError,
    RateLimited,
    child_page_scan,
    fetch_with_retry,
    paginated_scan,
    probe_page_count,
    synthetic_api_fetch,
    synthetic_api_total,
    synthetic_child_fetch,
    synthetic_parent_ids,
)


def _conf(**kw):
    base = {"bearer_token": EXPECTED_TOKEN, "page_size": 25, "n_records": 403}
    base.update(kw)
    return base


def test_bad_bearer_token_rejected():
    with pytest.raises(AuthError):
        synthetic_api_total(_conf(bearer_token="wrong"))
    with pytest.raises(AuthError):
        synthetic_api_fetch(_conf(bearer_token="wrong"), 0)


def test_retry_survives_deterministic_rate_limit():
    # page 7 rate-limits its first attempt; the wrapper must retry
    conf = _conf()
    with pytest.raises(RateLimited):
        synthetic_api_fetch(conf, 7)
    conf2 = _conf()
    out = fetch_with_retry(synthetic_api_fetch, conf2, 7)
    assert len(out) == 25 and out["id"].iloc[0] == 175


def test_retry_budget_exhausts():
    class AlwaysLimited:
        def __call__(self, conf, page):
            raise RateLimited("429")

    with pytest.raises(RateLimited):
        fetch_with_retry(AlwaysLimited(), {}, 0, max_tries=3)


@pytest.mark.parametrize(
    ("n_parents", "page_size", "want_pages"),
    [(0, 100, 0), (1, 100, 1), (100, 100, 1), (101, 100, 2), (137, 10, 14)],
)
def test_probe_page_count_exact(n_parents, page_size, want_pages):
    conf = {
        "bearer_token": EXPECTED_TOKEN,
        "page_size": page_size,
        "n_parents": n_parents,
    }
    assert probe_page_count(synthetic_parent_ids, conf) == want_pages


def test_paginated_scan_complete_and_exact(spark):
    conf = _conf(n_records=101)
    df = paginated_scan(
        spark, synthetic_api_fetch, conf, RECORD_SCHEMA,
        total_records=synthetic_api_total(conf), page_size=25,
    )
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 101  # no page lost, partial last page included
    import hashlib

    h = hashlib.md5(b"42").hexdigest()
    assert rows[42].value == int(h[:4], 16) and rows[42].grp == 0


def test_child_page_scan_fans_out(spark):
    conf = {"bearer_token": EXPECTED_TOKEN, "page_size": 100, "n_parents": 13}
    parents = paginated_scan(
        spark, synthetic_parent_ids, conf, "parent_id long", total_records=None
    )
    kids = child_page_scan(parents, synthetic_child_fetch, conf, CHILD_SCHEMA)
    got = kids.groupBy("parent_id").count().collect()
    # parent i has i % 4 children; parents with 0 children are absent
    assert {r.parent_id: r["count"] for r in got} == {
        i: i % 4 for i in range(13) if i % 4
    }
