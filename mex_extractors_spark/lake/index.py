"""Incrementally-maintained inverted index over the change-data-feed.

A secondary index (term → key) for a lake table, kept in sync by
consuming ``LakeTable.read_changes`` — the flatMap analog of the
aggregate view maintenance in :mod:`~mex_extractors_spark.lake.derived`:

    inserted row            ->  I(term, key)  for every term in it
    deleted row             ->  D(term, key)  for every term it had
    updated row             ->  I for terms ADDED by the update,
                                D for terms REMOVED (array_except of
                                the pre/post-image term sets; unchanged
                                terms produce NOTHING — an update that
                                doesn't touch indexed content costs
                                zero index writes)

The index is itself a :class:`~mex_extractors_spark.lake.table.
LakeTable` keyed on ``(term, *key_cols)`` with ``seq = source
version``, so refreshes inherit every engine guarantee: exactly-once
(idempotent batch id ``idx:v{from}->{to}``), crash-safe atomic publish,
fenced against replayed older refreshes, time-travelable, and
CAS-protected. Because ``term`` leads the key, the index bucket layout
hashes on it — a term lookup via ``index.read(where=[("term","=",x)])``
or the storage-partitioned join back to the source prunes like any
other keyed access.

Scale shape: a refresh reads ONLY the CDF rows (manifest-pruned,
shuffle-free on a shared layout), explodes the per-row term DIFFS (not
the full term sets), and upserts through the standard bucket-aligned
merge — O(changed terms), never O(corpus terms).

Reference lineage: the reference re-derives its searchable fields on
every publisher run (mex/extractors/pipeline/base.py:46-104 full
re-materialization); this is the incremental replacement.

Retention contract: same as derived views — if the source version a
refresh starts from has been expired by retention, the refresh
automatically falls back to a full rebuild (current-state upserts plus
deletes for stale index entries) and then resumes incrementally.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mex_extractors_spark.lake.table import LakeTable

_BATCH_RE = re.compile(r"^idx:v(\d+)->(\d+)$")


@dataclass
class IndexRefreshStats:
    from_version: int
    to_version: int
    full_build: bool
    applied: bool


def last_indexed_version(
    index: LakeTable, at_version: int | None = None, prefix: str = "idx"
) -> int:
    """Highest source version the index has absorbed (0 = never).

    ``at_version`` evaluates the question at a specific index snapshot
    instead of main — a catalog transaction MUST pass its own staged
    view here: main can lag the catalog pin (post-commit fast-forward
    is best-effort housekeeping), and a watermark read from stale main
    would re-apply already-absorbed change ranges.

    ``prefix`` names the batch-id family (``{prefix}:v{from}->{to}``):
    every derived-table maintainer (the inverted index here, the IVF
    ANN index in lake/ann.py) shares this one version-window parser so
    the exactly-once fencing contract cannot silently diverge."""
    pat = _BATCH_RE if prefix == "idx" else re.compile(
        rf"^{re.escape(prefix)}:v(\d+)->(\d+)$"
    )
    batches = applied_batches_at(index, at_version)
    versions = [int(m.group(2)) for b in batches if (m := pat.match(b))]
    return max(versions, default=0)


def applied_batches_at(table: LakeTable, at_version: int | None = None) -> set[str]:
    """Applied batch ids at a specific snapshot (``None`` = main).

    The ONE place the "what has this derived table absorbed, as seen
    from a ref" question is answered — shared by the inverted index's
    watermark above and the ANN index's exactly-once checks
    (lake/ann.py), so a change to snapshot applied-batch bookkeeping
    (e.g. idempotency-window trimming) cannot desynchronize them."""
    if at_version is None:
        return table.applied_batches()
    snap = table.snapshot_at(at_version) if at_version else None
    return set(snap["applied_batches"]) if snap else set()


def default_terms(col: str | Column) -> Column:
    """Distinct non-empty whitespace tokens — the default term extractor."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.filter(F.split(F.coalesce(c, F.lit("")), "\\s+"), lambda t: t != "")
    )


def _pairs(df: DataFrame, key_cols: Sequence[str], terms: Column, op: str, version: int) -> DataFrame:
    return df.select(
        F.explode(terms).alias("term"),
        *[F.col(c) for c in key_cols],
        F.lit(version).cast("long").alias("_src_version"),
        F.lit(op).alias("op"),
    )


def _bulk_or_row_pairs(
    state: DataFrame,
    key_cols: Sequence[str],
    terms_fn: Callable[[DataFrame], Column],
    bulk_pairs_fn: "Callable[[DataFrame], DataFrame] | None",
    op: str,
    version: int,
) -> DataFrame:
    """Corpus-sized (term, key) extraction: the caller's bulk
    DataFrame formulation when provided, else the row-local terms_fn."""
    if bulk_pairs_fn is None:
        return _pairs(state, key_cols, terms_fn(state), op, version)
    return bulk_pairs_fn(state).select(
        "term",
        *[F.col(c) for c in key_cols],
        F.lit(version).cast("long").alias("_src_version"),
        F.lit(op).alias("op"),
    )


def refresh_inverted_index(
    spark: SparkSession,
    source: LakeTable,
    index: LakeTable,
    terms_fn: Callable[[DataFrame], Column],
    to_version: int | None = None,
    branch: str | None = None,
    bulk_pairs_fn: "Callable[[DataFrame], DataFrame] | None" = None,
) -> IndexRefreshStats:
    """Bring ``index`` up to the source's ``to_version`` (default:
    current). ``terms_fn(df) -> array<string> Column`` extracts the
    indexed terms of a row (must be deterministic). ``index`` must be
    keyed ``("term", *source.key_cols)`` with ``seq_col="_src_version"``.
    ``branch`` stages the index batch on a txn branch instead of main
    (catalog-transaction composition: state apply + index refresh
    become one atomic catalog commit).

    ``bulk_pairs_fn(df) -> DataFrame[key_cols..., term]``: optional fast
    formulation of the SAME terms for corpus-sized inputs, used only on
    the full-build / full-rebuild paths. Row-local array Columns (the
    terms_fn contract) are what the per-key CDF diff needs, but some
    extractors have a DataFrame-shaped formulation that is an order of
    magnitude faster over a whole corpus (e.g. minhash band keys:
    ``dedup.minhash_band_terms`` recomputes the shingle array inside
    every interpreted HOF lambda, while ``dedup.minhash_band_pairs``
    explodes shingles once into a codegen'd hash aggregate — measured
    10x+ on a 5k-doc bootstrap, and the gap widens with corpus size).
    Must emit exactly the terms terms_fn would (equivalence is
    pinned by tests); CDF diffs keep using terms_fn either way.
    """
    expected = ["term", *source.key_cols]
    if list(index.key_cols) != expected or index.seq_col != "_src_version":
        raise ValueError(
            f"index table must have key_cols={expected} and "
            f"seq_col='_src_version' (got {index.key_cols}, {index.seq_col!r})"
        )
    if index.op_col != "op":
        # _pairs hardcodes the 'op' column name in the index batches it
        # builds — a custom op_col would pass this validation and then
        # die deep inside apply_batch with an unresolved-column error
        raise ValueError(
            f"index table must use op_col='op' (got {index.op_col!r})"
        )
    if to_version is None:
        cur = source.current_snapshot()
        if cur is None:
            return IndexRefreshStats(0, 0, full_build=False, applied=False)
        to_version = cur["version"]
    # staged on a branch: the from-watermark must come from the BRANCH
    # head (the catalog pin / this txn's prior writes), never main —
    # main can lag the pin when post-commit fast-forward was skipped.
    # `or 0`: an unknown/empty branch head is an EMPTY view (the same
    # guard _applied_at and ann.py apply) — resolving to None would
    # silently read MAIN's watermark and can early-return applied=False
    # instead of surfacing the unknown branch in apply_batch
    last = last_indexed_version(
        index,
        at_version=(index.resolve_ref(branch) or 0)
        if branch is not None
        else None,
    )
    if to_version <= last:
        return IndexRefreshStats(last, to_version, full_build=False, applied=False)
    batch_id = f"idx:v{last}->{to_version}"
    if last == 0:
        state = source.read(spark, version=to_version)
        batch = _bulk_or_row_pairs(
            state, source.key_cols, terms_fn, bulk_pairs_fn, "I", to_version
        )
        st = index.apply_batch(spark, batch, batch_id, branch=branch)
        return IndexRefreshStats(0, to_version, full_build=True, applied=st.applied)

    if source.snapshot_at(last) is None:
        # the last-indexed source snapshot was expired by retention —
        # the CDF can't be computed from it, and last_indexed_version
        # stays high so the last==0 bootstrap branch is unreachable.
        # Recovery (the derived.full_refresh analog): rebuild from the
        # CURRENT state — upsert every live (term, key) pair and delete
        # index entries whose pair no longer exists.
        return _full_rebuild(
            spark, source, index, terms_fn, last, to_version,
            branch=branch, bulk_pairs_fn=bulk_pairs_fn,
        )

    changes = source.read_changes(
        spark, from_version=last, to_version=to_version, include_preimages=True
    )
    ct = F.col("_change_type")
    post = changes.where(ct.isin("insert", "update_postimage"))
    pre = changes.where(ct.isin("delete", "update_preimage"))
    post_terms = post.select(
        *source.key_cols, terms_fn(post).alias("_post")
    )
    pre_terms = pre.select(*source.key_cols, terms_fn(pre).alias("_pre"))
    # per-key term diff: unchanged terms emit nothing
    diff = post_terms.join(pre_terms, on=list(source.key_cols), how="full_outer").select(
        *source.key_cols,
        F.coalesce(F.col("_post"), F.array().cast("array<string>")).alias("_post"),
        F.coalesce(F.col("_pre"), F.array().cast("array<string>")).alias("_pre"),
    )
    added = _pairs(
        diff, source.key_cols, F.array_except("_post", "_pre"), "I", to_version
    )
    removed = _pairs(
        diff, source.key_cols, F.array_except("_pre", "_post"), "D", to_version
    )
    st = index.apply_batch(spark, added.unionByName(removed), batch_id, branch=branch)
    return IndexRefreshStats(last, to_version, full_build=False, applied=st.applied)


def _full_rebuild(
    spark: SparkSession,
    source: LakeTable,
    index: LakeTable,
    terms_fn: Callable[[DataFrame], Column],
    last: int,
    to_version: int,
    branch: str | None = None,
    bulk_pairs_fn: "Callable[[DataFrame], DataFrame] | None" = None,
) -> IndexRefreshStats:
    """Recovery path when the CDF base snapshot has been expired:
    re-emit the current state's (term, key) pairs as upserts plus
    deletes for stale index entries (mirrors ``derived.full_refresh``).
    Committed under the standard ``idx:`` batch id, so the watermark
    advances and subsequent refreshes go back to incremental."""
    state = source.read(spark, version=to_version)
    live = _bulk_or_row_pairs(
        state, source.key_cols, terms_fn, bulk_pairs_fn, "I", to_version
    )
    pair_cols = ["term", *source.key_cols]
    stale = (
        index.read(spark, ref=branch)
        .select(*pair_cols)
        .join(live.select(*pair_cols), on=pair_cols, how="left_anti")
        .select(
            *pair_cols,
            F.lit(to_version).cast("long").alias("_src_version"),
            F.lit("D").alias("op"),
        )
    )
    st = index.apply_batch(
        spark, live.unionByName(stale), f"idx:v{last}->{to_version}", branch=branch
    )
    return IndexRefreshStats(last, to_version, full_build=True, applied=st.applied)


def full_index(
    spark: SparkSession,
    source: LakeTable,
    terms_fn: Callable[[DataFrame], Column],
) -> DataFrame:
    """From-scratch (term, key) pairs of the CURRENT source state — the
    oracle a maintained index must equal."""
    state = source.read(spark)
    return state.select(
        F.explode(terms_fn(state)).alias("term"), *source.key_cols
    ).distinct()
