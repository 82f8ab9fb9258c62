"""Paginated-API scans re-expressed for a cluster (SURVEY.md §2.1
S9/S10/S12).

The reference fetches REST pages serially on the driver:

- count-probe then page loop, 25 records/page, with constant-interval
  backoff for rate limits (open_data/connector.py:48-72, :29-46);
- until-empty child-page loop, 100 ids/start, then a per-id detail
  fetch (confluence_vvt/extract.py:20-57, :60-76);
- bearer-token auth header on every request
  (blueant/connector.py:13-45).

A serial page loop is O(n_pages) driver wall-clock — at 10^6+ records
it IS the extract bottleneck. The cluster shape splits *discovery*
(how many pages exist?) from *fetching* (pull pages in parallel):

- discovery is either one count request (total known up front, S9) or
  a geometric driver-side probe — O(log n) serial requests instead of
  the reference's O(n) loop (S10);
- the page-index DataFrame then fans out through ``mapInPandas``:
  each executor pulls its page slice with the shared fetcher conf
  (base url, bearer token, retry budget) and yields Arrow batches.
  Per-record sub-requests (S10 detail pages, open_data
  :74-110) are a SECOND fan-out keyed by the ids the first returned.

No network exists in this sandbox, so the transport is pluggable: a
fetcher is any picklable ``(conf, page_index) -> pandas.DataFrame``
callable. ``synthetic_api_*`` below is the deterministic local
stand-in "server" (md5-derived payloads, bearer-token check, a
deterministic first-attempt rate-limit failure every 13th page to
exercise the retry path); a requests-backed fetcher drops in
unchanged on a real cluster.
"""

from __future__ import annotations

import hashlib
import math
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

Fetcher = Callable[[dict, int], pd.DataFrame]


class AuthError(RuntimeError):
    """Bearer-token rejected (the reference raises MExError on 4xx)."""


class RateLimited(RuntimeError):
    """Transient 429-style failure; the fetch wrapper retries."""


def fetch_with_retry(
    fetch_page: Fetcher,
    conf: dict,
    page: int,
    max_tries: int = 5,
    backoff_s: float = 0.001,
) -> pd.DataFrame:
    """Constant-interval retry around one page fetch (the reference
    waits 10 s between tries for Zenodo's 133 req/min limit,
    open_data/connector.py:29-46; the stand-in sleeps ~0)."""
    for attempt in range(max_tries):
        try:
            return fetch_page(conf, page)
        except RateLimited:
            if attempt == max_tries - 1:
                raise
            time.sleep(backoff_s)
    raise AssertionError("unreachable")


def probe_page_count(fetch_page: Fetcher, conf: dict, max_pages: int = 1 << 20) -> int:
    """Driver-side discovery when the total is unknown: geometric
    doubling to bracket the last non-empty page, then bisect — O(log n)
    serial requests, vs the reference's fetch-every-page-until-empty
    loop (confluence_vvt/extract.py:38-52). Returns the page count."""
    if len(fetch_with_retry(fetch_page, conf, 0)) == 0:
        return 0
    hi = 1
    while hi < max_pages and len(fetch_with_retry(fetch_page, conf, hi)) > 0:
        hi *= 2
    lo = hi // 2  # lo is known non-empty, hi known empty (or cap)
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if len(fetch_with_retry(fetch_page, conf, mid)) > 0:
            lo = mid
        else:
            hi = mid
    return lo + 1


def paginated_scan(
    spark: SparkSession,
    fetch_page: Fetcher,
    conf: dict,
    schema: StructType | str,
    *,
    total_records: int | None = None,
    page_size: int = 25,
) -> DataFrame:
    """Parallel scan of a paged API as a DataFrame.

    ``total_records`` known → page count is one division (the S9
    count-probe pattern: the caller made the ``size=1`` request);
    unknown → ``probe_page_count`` discovers it in O(log n). Either
    way the fetching itself is fully parallel: a page-index DataFrame
    fans out over ``mapInPandas`` and each task pulls its pages.
    """
    if total_records is not None:
        n_pages = math.ceil(total_records / page_size)
    else:
        n_pages = probe_page_count(fetch_page, conf)
    parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pages = spark.range(0, max(n_pages, 0), numPartitions=max(1, min(n_pages, parallelism)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["id"]:
                out = fetch_with_retry(fetch_page, conf, int(p))
                if len(out):
                    yield out

    return pages.mapInPandas(run, schema)


def child_page_scan(
    ids_df: DataFrame,
    fetch_children: Fetcher,
    conf: dict,
    schema: StructType | str,
    id_col: str = "parent_id",
) -> DataFrame:
    """Second-phase fan-out: one detail request per parent id
    (confluence_vvt get_page_data_by_id :60-76, open_data per-record
    sub-requests :74-110). The ids DataFrame is rebalanced so slow
    detail fetches spread across all executors."""
    parallelism = int(ids_df.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid in pdf[id_col]:
                out = fetch_with_retry(fetch_children, conf, int(pid))
                if len(out):
                    yield out

    return ids_df.select(id_col).repartition(parallelism).mapInPandas(run, schema)


# ----------------------------------------------------------------------
# Deterministic local stand-in "server" (no network in the sandbox).
# Payloads are md5-derived so a DuckDB oracle can state the expected
# result in closed form (md5 is identical across engines).
# ----------------------------------------------------------------------

EXPECTED_TOKEN = "test-bearer-token"
RECORD_SCHEMA = "id long, title string, value int, grp long"
CHILD_SCHEMA = "parent_id long, child_id long, payload string"


def _check_auth(conf: dict) -> None:
    if conf.get("bearer_token") != EXPECTED_TOKEN:
        raise AuthError("401: bad bearer token")


def _record(i: int) -> dict:
    h = hashlib.md5(str(i).encode()).hexdigest()
    return {"id": i, "title": f"rec-{i}", "value": int(h[:4], 16), "grp": i % 7}


def synthetic_api_total(conf: dict) -> int:
    """The ``size=1`` total-count probe (open_data/connector.py:59-62)."""
    _check_auth(conf)
    return int(conf["n_records"])


def synthetic_api_fetch(conf: dict, page: int) -> pd.DataFrame:
    """One page of records; every 13th page rate-limits its first
    attempt (deterministic, keyed by page) to exercise the retry."""
    _check_auth(conf)
    size = int(conf["page_size"])
    n = int(conf["n_records"])
    attempts = conf.setdefault("_attempts", {})
    if page % 13 == 7 and not attempts.get(page):
        attempts[page] = 1
        raise RateLimited(f"429 on page {page}")
    lo, hi = page * size, min((page + 1) * size, n)
    return pd.DataFrame([_record(i) for i in range(lo, hi)], columns=["id", "title", "value", "grp"])


def synthetic_parent_ids(conf: dict, page: int) -> pd.DataFrame:
    """Until-empty paged id listing (confluence child/page endpoint):
    ``n_parents`` ids served ``page_size`` at a time."""
    _check_auth(conf)
    size = int(conf["page_size"])
    n = int(conf["n_parents"])
    lo, hi = page * size, min((page + 1) * size, n)
    return pd.DataFrame({"parent_id": list(range(lo, hi))})


def synthetic_child_fetch(conf: dict, parent_id: int) -> pd.DataFrame:
    """Detail request: parent ``i`` has ``i % 4`` children with
    md5-derived payloads."""
    _check_auth(conf)
    rows = [
        {
            "parent_id": parent_id,
            "child_id": parent_id * 10 + j,
            "payload": hashlib.md5(f"{parent_id}:{j}".encode()).hexdigest(),
        }
        for j in range(1, parent_id % 4 + 1)
    ]
    return pd.DataFrame(rows, columns=["parent_id", "child_id", "payload"])
