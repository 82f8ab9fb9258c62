"""Multi-table atomic commits: a Nessie-style lake catalog.

The reference's publisher loads merged items of SEVERAL entity types and
publishes them as one logical unit (mex/extractors/publisher/main.py:
one run emits every class to one labeled S3 prefix with one metadata
document) — readers never see person items from one run next to
resource items from another. Per-table :class:`~mex_extractors_spark.
lake.table.LakeTable` commits can't express that: each table's CAS is
independent, so a crash between two ``apply_batch`` calls leaves the
lake cross-table inconsistent (state table advanced, its inverted index
not).

This module adds the catalog-level commit model (what Project Nessie /
an Iceberg REST catalog with multi-table transactions provides):

- a **catalog snapshot** is one small JSON document mapping table name
  → pinned snapshot version; it is published with the same
  link-create-if-absent CAS as table snapshots, so a catalog commit is
  ONE atomic operation no matter how many tables it touches;
- a **transaction** stages each table's batch on a txn-private table
  BRANCH (``apply_batch(branch=...)`` — data files written, fenced,
  checksummed, but invisible to main), then commits by publishing one
  catalog snapshot pinning all the staged branch heads together;
- **readers** that resolve versions through the catalog
  (:meth:`LakeCatalog.read`) get snapshot-isolated multi-table reads:
  every table is read at the version ONE catalog snapshot pinned, so a
  join between the state table and its index can never mix commits.

Crash windows: before the catalog CAS, staged branches are invisible
(abort = drop the branches; their snapshots become unreferenced and are
reclaimed by ``expire_snapshots``); after the CAS, the commit is fully
visible — advancing each table's main ref is mere housekeeping
(performed best-effort post-commit, and safe to skip: catalog pins
reference immutable versions that branch refs keep retained).

Concurrency: optimistic, serialized at the catalog — two transactions
that both fork from catalog version N race on publishing N+1; exactly
one wins the CAS, the loser gets :class:`~mex_extractors_spark.lake.
table.CommitConflict` and must retry on the new head (even
disjoint-table transactions conflict; at catalog-commit rates — one per
micro-batch — that is the right simplicity/safety trade, and it is
exactly Nessie's single-ref contract).

At 100 TB nothing here scales with data: a catalog snapshot is
O(tables) bytes, staging is the standard bucket-aligned branch write,
and the commit itself is one link(2) call.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
# runtime imports (not TYPE_CHECKING): names used in string annotations
# must resolve for typing.get_type_hints / doc tooling, not just for
# human readers; no import cycle — ann/index/derived import only
# lake.table
from collections.abc import Sequence  # noqa: F401  (annotation use)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mex_extractors_spark.lake.ann import IvfRefreshStats  # noqa: F401
from mex_extractors_spark.lake.derived import RefreshStats  # noqa: F401
from mex_extractors_spark.lake.index import IndexRefreshStats  # noqa: F401
from mex_extractors_spark.lake.table import (
    ApplyStats,
    CommitConflict,
    DmlStats,
    LakeTable,
    atomic_write_ref,
    cas_publish_document,
)


class LakeCatalog:
    """A directory of named :class:`LakeTable`s with atomic cross-table
    commits. Tables are registered once per process; the catalog state
    lives in ``<path>/_catalog`` next to nothing else."""

    def __init__(self, path: str) -> None:
        self.path = os.path.abspath(path)  # same contract as LakeTable
        self.cat_dir = os.path.join(self.path, "_catalog")
        os.makedirs(self.cat_dir, exist_ok=True)
        self.tables: dict[str, LakeTable] = {}

    # ------------------------------------------------------------ registry

    def register(self, name: str, table: LakeTable) -> LakeTable:
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"invalid table name {name!r}")
        self.tables[name] = table
        return table

    def table(self, name: str) -> LakeTable:
        if name not in self.tables:
            raise ValueError(f"unknown table {name!r} (register first)")
        return self.tables[name]

    # ------------------------------------------------------------ snapshots

    def _max_ledger_version(self) -> int:
        return max(
            (
                int(m.group(1))
                for f in os.listdir(self.cat_dir)
                if (m := re.fullmatch(r"c(\d{8})\.json", f))
            ),
            default=0,
        )

    def current_snapshot(self) -> dict | None:
        """Head of the catalog ledger. The os.link of the snapshot
        document is the CAS point — a crash between it and the CURRENT
        replace leaves a fully-committed snapshot that CURRENT does not
        name yet. Without healing, every later transaction would base
        on the stale head, compute the same next version, and conflict
        forever (livelock); so a CURRENT that lags the ledger's max
        version is repaired here (idempotent: os.replace of the same
        value is harmless under races)."""
        cur_path = os.path.join(self.cat_dir, "CURRENT")
        cur = 0
        if os.path.exists(cur_path):
            with open(cur_path) as fh:
                cur = int(fh.read().strip())
        mx = self._max_ledger_version()
        if mx > cur:
            # heal IN MEMORY only: every reader lists the ledger, so a
            # lagging CURRENT never misleads anyone, and the read path
            # stays write-free (read-only filesystem consumers work; no
            # racing healers transiently regressing CURRENT). The
            # persistent pointer is repaired by the next _publish, which
            # rewrites CURRENT after its CAS anyway.
            cur = mx
        return self.snapshot_at(cur) if cur else None

    def snapshot_at(self, version: int) -> dict | None:
        p = os.path.join(self.cat_dir, f"c{version:08d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def pins(self, catalog_version: int | None = None) -> dict[str, int]:
        """table name -> pinned table-snapshot version at a catalog
        snapshot (default: current). Empty when never committed."""
        snap = (
            self.snapshot_at(catalog_version)
            if catalog_version is not None
            else self.current_snapshot()
        )
        if snap is None:
            if catalog_version is not None:
                raise ValueError(f"catalog snapshot c{catalog_version} not found")
            return {}
        return {k: int(v) for k, v in snap["tables"].items()}

    def read(
        self,
        spark: SparkSession,
        name: str,
        catalog_version: int | None = None,
        **read_kwargs,
    ) -> DataFrame:
        """Read a table AT THE VERSION the catalog pinned — the
        snapshot-isolated path. Two ``read`` calls against the same
        ``catalog_version`` (pass one explicitly to pin a whole
        multi-table job) can never observe different transactions."""
        pinned = self.pins(catalog_version).get(name)
        if pinned is None:
            raise ValueError(f"table {name!r} has no committed catalog pin")
        return self.table(name).read(spark, version=pinned, **read_kwargs)

    def history(self) -> list[dict]:
        """All retained catalog snapshots, oldest first — the catalog
        analog of :meth:`LakeTable.history` (Nessie's commit log): one
        entry per multi-table transaction with the pins it published."""
        out = []
        for f in sorted(os.listdir(self.cat_dir)):
            m = re.fullmatch(r"c(\d{8})\.json", f)
            if not m:
                continue
            snap = self.snapshot_at(int(m.group(1)))
            if snap is None:  # expired between listdir and read
                continue
            out.append(
                {
                    "version": snap["version"],
                    "parent": snap["parent"],
                    "committed_at": snap["committed_at"],
                    "txn_id": snap.get("txn_id"),
                    "tables": {k: int(v) for k, v in snap["tables"].items()},
                }
            )
        return out

    def read_changes(
        self,
        spark: SparkSession,
        name: str,
        from_catalog_version: int,
        to_catalog_version: int | None = None,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Change-data-feed addressed by CATALOG versions: what changed
        in table ``name`` between two multi-table commits. This is the
        snapshot-isolated CDF — both endpoints are pins published by one
        atomic transaction each, so a consumer diffing ``state`` and
        ``index`` at the same pair of catalog versions sees exactly the
        transactions between them, never a half-committed batch (the
        anomaly table-version CDF is exposed to when tables commit
        independently).

        ``from_catalog_version=0`` means "before the first catalog
        commit"; a table first pinned inside the window emits its full
        state at the ``to`` pin as ``insert`` rows (Delta CDF's
        ``startingVersion=0`` contract). A table whose pin did not move
        between the endpoints returns an empty frame in CDF shape."""
        cur = self.current_snapshot()
        if cur is None:
            raise ValueError("catalog has no committed snapshots")
        to_v = int(cur["version"]) if to_catalog_version is None else int(to_catalog_version)
        to_pins = self.pins(to_v)
        if name not in to_pins:
            raise ValueError(
                f"table {name!r} has no pin at catalog version c{to_v}"
            )
        from_v = int(from_catalog_version)
        from_pins = self.pins(from_v) if from_v else {}
        table = self.table(name)
        to_pin = to_pins[name]
        from_pin = from_pins.get(name)

        def _cdf_shape(df: DataFrame, change_type) -> DataFrame:
            payload = [c for c in df.columns if c not in table.key_cols]
            return df.select(
                *table.key_cols, *payload, change_type.alias("_change_type")
            )

        if from_pin == to_pin or from_pin is None:
            to_df = table.read(spark, version=to_pin)
            if not to_df.columns:
                # the pin is a bootstrap no-op snapshot (schema_version
                # 0, no data yet): same empty CDF shape the table-level
                # read_changes returns — selecting key columns on a
                # zero-column frame would crash instead
                return to_df.withColumn("_change_type", F.lit(""))
            if from_pin == to_pin:  # pin did not move: nothing changed
                return _cdf_shape(to_df.limit(0), F.lit(""))
            # first pinned inside the window: bootstrap as inserts
            return _cdf_shape(to_df, F.lit("insert"))
        return table.read_changes(
            spark, from_pin, to_pin, include_preimages=include_preimages
        )

    def _publish(self, snapshot: dict) -> None:
        """The same atomic commit protocol as LakeTable._publish, via
        the shared helpers (one implementation of the crash-safety-
        critical path to keep in sync, not two)."""
        version = snapshot["version"]
        cas_publish_document(
            os.path.join(self.cat_dir, f"c{version:08d}.json"),
            snapshot,
            f"catalog snapshot c{version} was published by another "
            "transaction — re-open a transaction on the new head",
        )
        self._write_current(version)

    def _write_current(self, version: int) -> None:
        atomic_write_ref(os.path.join(self.cat_dir, "CURRENT"), version)

    def transaction(self) -> "LakeTransaction":
        return LakeTransaction(self)

    def rollback_to(self, version: int) -> dict:
        """Revert the WHOLE multi-table world to catalog snapshot
        ``version`` — the catalog analog of ``LakeTable.rollback_to``,
        but as a REVERT COMMIT, not a ref move: ``current_snapshot()``
        heals a lagging CURRENT up to the ledger's max version (crash
        recovery), so moving CURRENT backwards would be silently undone;
        instead a NEW snapshot re-pinning the target's tables is
        published through the same CAS as every commit. Snapshot-
        isolated readers and future transactions (which fork from
        catalog pins, never table mains) immediately see the reverted
        world, and because fencing state lives in the pinned table
        snapshots, a corrected batch re-applies under its original id.
        Table mains are then rolled back as best-effort mirroring (same
        contract as ``LakeTransaction.commit``); a main that diverged
        out-of-band is reported under ``"main_diverged"`` rather than
        force-moved. The target must be an ancestor of the current
        catalog head."""
        cur = self.current_snapshot()
        if cur is None:
            raise ValueError("cannot roll back an empty catalog")
        target = self.snapshot_at(version)
        if target is None:
            raise ValueError(
                f"catalog snapshot c{version} not found (expired or never published)"
            )
        v: "int | None" = cur["version"]
        while v is not None and v != version:
            s = self.snapshot_at(v)
            v = s.get("parent") if s else None
        if v != version:
            raise ValueError(
                f"c{version} is not an ancestor of catalog head "
                f"c{cur['version']} — not a rollback"
            )
        if version == cur["version"]:
            return cur
        # tables first pinned AFTER the target did not exist in the
        # target world — dropping them from the snapshot would let
        # absorb_main_advances' never-pinned escape resurrect their
        # un-reverted mains right next to the reverted state. Pin them
        # at 0 explicitly ("reverted out of the world"): absorb treats
        # an explicit 0 as a rollback tombstone, never a fresh table.
        reverted_out = sorted(
            n for n in cur["tables"] if n not in target["tables"]
        )
        snapshot = {
            "version": cur["version"] + 1,
            "parent": cur["version"],
            "tables": {
                **{k: int(x) for k, x in target["tables"].items()},
                **{n: 0 for n in reverted_out},
            },
            "rolled_back_to": version,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if reverted_out:
            snapshot["reverted_out"] = reverted_out
        self._publish(snapshot)
        diverged: list[str] = []
        for name, pinned in snapshot["tables"].items():
            table = self.tables.get(name)
            if table is None:
                continue
            try:
                if pinned:
                    table.rollback_to(int(pinned))
                else:
                    # a table cannot be rolled back to nonexistence: its
                    # main keeps the data, visibly diverged from the
                    # 0-pin — surfaced, never silently re-absorbed
                    diverged.append(name)
            except ValueError:
                diverged.append(name)
        if diverged:
            snapshot = {**snapshot, "main_diverged": sorted(diverged)}
        return snapshot

    # ------------------------------------------------------------ retention

    def expire_catalog_snapshots(self, keep_last: int = 3) -> int:
        """Drop catalog snapshot documents older than the newest
        ``keep_last`` of CURRENT's parent chain. Table snapshots are NOT
        touched here — use :meth:`maintenance`, which keeps every table
        version a retained catalog snapshot still pins."""
        cur = self.current_snapshot()
        if cur is None:
            return 0
        keep: set[int] = set()
        v: int | None = int(cur["version"])
        for _ in range(max(keep_last, 1)):
            if not v:
                break
            keep.add(v)
            snap = self.snapshot_at(v)
            v = snap.get("parent") if snap else None
        expired = 0
        for f in os.listdir(self.cat_dir):
            if ".tmp-" in f:
                # crash leftover between write and link/replace — but
                # only reclaim AGED ones: a concurrent committer's
                # in-flight tmp (written, not yet linked) must survive,
                # or its os.link dies with FileNotFoundError instead of
                # a classified CommitConflict
                p = os.path.join(self.cat_dir, f)
                try:
                    if time.time() - os.path.getmtime(p) > 3600:
                        os.remove(p)
                except OSError:
                    pass
                continue
            m = re.fullmatch(r"c(\d{8})\.json", f)
            # never touch versions NEWER than the head read at entry: a
            # concurrent committer may have CAS-published c(N+1) after
            # our read — deleting a fully-committed snapshot (and
            # freeing its version number for re-issue) would break the
            # atomic-commit guarantee
            if m and int(m.group(1)) not in keep and int(m.group(1)) <= int(
                cur["version"]
            ):
                os.remove(os.path.join(self.cat_dir, f))
                expired += 1
        return expired

    def retained_pins(self) -> dict[str, set[int]]:
        """table name -> every version some retained catalog snapshot
        pins. This is the keep-set table-level expiry must honor: a
        reader holding any retained ``catalog_version`` can still ask
        for these."""
        pins: dict[str, set[int]] = {}
        for f in os.listdir(self.cat_dir):
            m = re.fullmatch(r"c(\d{8})\.json", f)
            if not m:
                continue
            snap = self.snapshot_at(int(m.group(1)))
            for name, v in (snap or {}).get("tables", {}).items():
                pins.setdefault(name, set()).add(int(v))
        return pins

    def absorb_main_advances(self, names: "Sequence[str] | None" = None) -> dict:
        """Fold sanctioned out-of-band MAIN commits back into the
        catalog. Table maintenance (compaction, ANN reclustering) is
        content-preserving but commits new main versions the catalog
        does not pin; the NEXT transaction forks from the stale pin and
        its post-commit fast-forward then diverges — the reclustered
        layout would be orphaned and main would serve stale data
        forever. This publishes ONE CAS-protected catalog snapshot
        re-pinning every table whose main head is a strict DESCENDANT
        of its current pin (a true fast-forward of the pin). A main
        that is NOT a descendant is left alone: that is real
        divergence — rebase those batches through a transaction.
        Returns ``{table: new_pin}`` for what was absorbed."""
        cur = self.current_snapshot()
        if cur is None:
            return {}
        pins = dict(cur["tables"])
        absorbed: dict[str, int] = {}
        for name in names if names is not None else list(self.tables):
            table = self.table(name)
            head_snap = table.current_snapshot()
            head = int(head_snap["version"]) if head_snap else 0
            pinned = int(pins.get(name, 0))
            if head <= pinned:
                continue
            v: int | None = head
            while v is not None and v != pinned:
                snap = table.snapshot_at(v)
                v = snap.get("parent") if snap else None
            # the pinned == 0 escape is for tables NEVER pinned (first
            # registration); an EXPLICIT 0 pin is a rollback tombstone
            # ("reverted out of the world") and must not resurrect the
            # table's un-reverted main
            never_pinned = name not in cur["tables"]
            if v == pinned or (pinned == 0 and v is None and never_pinned):
                pins[name] = head
                absorbed[name] = head
        if not absorbed:
            return {}
        self._publish({
            "version": int(cur["version"]) + 1,
            "parent": int(cur["version"]),
            "tables": pins,
            "txn_id": f"absorb-{uuid.uuid4().hex[:12]}",
            "committed_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        })
        return absorbed

    def maintenance(
        self,
        spark: SparkSession,
        keep_catalog_snapshots: int = 3,
        keep_table_snapshots: int = 1,
        min_files: int = 2,
    ) -> dict:
        """Catalog-wide upkeep: expire old catalog snapshots, then run
        each registered table's :meth:`LakeTable.maintenance` with the
        still-pinned versions as ``extra_keep`` — a bare
        ``table.maintenance()`` on a catalog-managed table could expire
        a version the catalog still pins and wedge
        :meth:`read(catalog_version=)`; this entry point is the safe
        one. Returns per-table stats plus the catalog expiry count.

        Order matters: out-of-band main advances (recluster/compact
        commits the catalog does not pin yet) are absorbed FIRST —
        table expiry keeps only the retained pins' ancestries, so
        running it before the absorb could delete the intermediate
        versions the absorb's ancestry walk needs, permanently wedging
        the pin behind an unreachable head."""
        pre_absorbed = self.absorb_main_advances()
        cat_expired = self.expire_catalog_snapshots(keep_catalog_snapshots)
        pins = self.retained_pins()
        per_table = {
            name: table.maintenance(
                spark,
                keep_snapshots=keep_table_snapshots,
                min_files=min_files,
                extra_keep=pins.get(name, set()),
            )
            for name, table in self.tables.items()
        }
        # the compactions THIS call just ran committed new
        # (content-identical) main versions; re-pin them so the next
        # transaction forks from the compacted layout instead of
        # diverging main (see absorb_main_advances)
        absorbed = self.absorb_main_advances()
        return {
            "catalog_snapshots_expired": cat_expired,
            "tables": per_table,
            "absorbed": {**pre_absorbed, **absorbed},
        }


class LakeTransaction:
    """Stage batches on txn-private table branches; commit them all with
    ONE catalog CAS. Use as a context manager for auto-abort:

        with catalog.transaction() as txn:
            txn.apply_batch(spark, "state", batch, "b7")
            txn.apply_batch(spark, "index", idx_batch, "idx:b7")
            txn.commit()
    """

    def __init__(self, catalog: LakeCatalog) -> None:
        self.catalog = catalog
        self.txn_id = uuid.uuid4().hex[:12]
        base = catalog.current_snapshot()
        self.base_version = int(base["version"]) if base else 0
        # derive pins from the snapshot already in hand: a second
        # catalog.pins() call re-reads the head, and a commit landing
        # between the two reads would pair base_version N with N+1's
        # pins — staging against a world this txn's commit() cannot
        # publish (guaranteed CommitConflict, wasted staging work)
        self._base_pins = (
            {k: int(v) for k, v in base["tables"].items()} if base else {}
        )
        self._branches: dict[str, str] = {}  # table name -> branch name
        self._stats: list[ApplyStats] = []
        self._dml_stats: list = []  # DmlStats of staged DML commits
        self._done = False

    # -- staging -----------------------------------------------------------

    def _branch_for(self, name: str) -> str:
        table = self.catalog.table(name)
        if name not in self._branches:
            branch = f"txn-{self.txn_id}"
            # fork from the CATALOG pin (not table main): transactions
            # see the catalog's consistent world even if a table's main
            # ref lags the last catalog commit (housekeeping skipped)
            at = self._base_pins.get(name)
            if at is None:
                cur = table.current_snapshot()
                at = cur["version"] if cur else 0
            table.create_branch(branch, at_version=at)
            self._branches[name] = branch
        return self._branches[name]

    def apply_batch(
        self,
        spark: SparkSession,
        name: str,
        batch_df: DataFrame,
        batch_id: str,
        **apply_kwargs,
    ) -> ApplyStats:
        """Stage one table's batch (full apply semantics — fencing,
        idempotency, schema evolution, checksums — on the txn branch)."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        st = self.catalog.table(name).apply_batch(
            spark, batch_df, batch_id, branch=self._branch_for(name), **apply_kwargs
        )
        self._stats.append(st)
        return st

    def head(self, name: str) -> int:
        """The table version this transaction currently sees: its staged
        branch head if it wrote the table, else the catalog base pin."""
        if name in self._branches:
            head = self.catalog.table(name).refs().get(self._branches[name])
            if head:
                return head
        pinned = self._base_pins.get(name)
        if pinned is not None:
            return pinned
        cur = self.catalog.table(name).current_snapshot()
        return cur["version"] if cur else 0

    def delete_where(
        self, spark: SparkSession, name: str, where, commit_id: str
    ) -> "DmlStats":
        """Stage a predicate DELETE on ``name``'s txn branch — the
        cross-table compliance purge: stage the same key's deletion on
        the state table AND every derived table, then ``commit()`` makes
        all of them visible in ONE catalog CAS (no reader window where
        the key is gone from state but still findable via an index)."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        st = self.catalog.table(name).delete_where(
            spark, where, commit_id, branch=self._branch_for(name)
        )
        self._dml_stats.append(st)
        return st

    def update_where(
        self, spark: SparkSession, name: str, set_exprs, where, commit_id: str
    ) -> "DmlStats":
        """Stage a predicate UPDATE on ``name``'s txn branch (see
        :meth:`delete_where` for the atomicity contract)."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        st = self.catalog.table(name).update_where(
            spark, set_exprs, where, commit_id, branch=self._branch_for(name)
        )
        self._dml_stats.append(st)
        return st

    def merge_into(
        self, spark: SparkSession, name: str, source_df, commit_id: str, **kwargs
    ) -> "DmlStats":
        """Stage a MERGE INTO on ``name``'s txn branch (see
        :meth:`delete_where` for the atomicity contract)."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        st = self.catalog.table(name).merge_into(
            spark, source_df, commit_id, branch=self._branch_for(name), **kwargs
        )
        self._dml_stats.append(st)
        return st

    def refresh_index(self, spark: SparkSession, source_name: str,
                      index_name: str, terms_fn) -> "IndexRefreshStats":
        """Stage an inverted-index refresh INSIDE this transaction: the
        index is brought up to the transaction's view of the source
        (staged head if this txn wrote it) on the index's own txn
        branch, so state and index move in ONE atomic catalog commit —
        the crash window between "state advanced" and "index refreshed"
        that separate commits leave open does not exist."""
        from mex_extractors_spark.lake.index import refresh_inverted_index

        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        return refresh_inverted_index(
            spark,
            self.catalog.table(source_name),
            self.catalog.table(index_name),
            terms_fn,
            to_version=self.head(source_name),
            branch=self._branch_for(index_name),
        )

    def refresh_ann(
        self,
        spark: SparkSession,
        source_name: str,
        index_name: str,
        vec_col: str = "embedding",
        num_centroids: int | None = 16,
    ) -> "IvfRefreshStats":
        """Stage an IVF ANN-index refresh INSIDE this transaction (the
        :class:`~mex_extractors_spark.lake.ann.IvfIndex` analog of
        :meth:`refresh_index`): assignments are brought up to the
        transaction's view of the source on the index's txn branch, so
        vector state and search index move in ONE atomic catalog
        commit. Physical clustering is deferred (churn still counts) —
        after commit run ``IvfIndex.from_table(...).maybe_recluster(
        spark)`` FOLLOWED BY ``catalog.absorb_main_advances()`` (the
        recluster commits a content-identical main version the catalog
        must re-pin, or the next transaction's fast-forward diverges);
        ``catalog.maintenance`` does the absorb automatically."""
        from mex_extractors_spark.lake.ann import IvfIndex

        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        idx = IvfIndex.from_table(self.catalog.table(index_name), vec_col=vec_col)
        return idx.refresh(
            spark,
            self.catalog.table(source_name),
            to_version=self.head(source_name),
            num_centroids=num_centroids,
            branch=self._branch_for(index_name),
        )

    def refresh_view(self, spark: SparkSession, source_name: str,
                     derived_name: str, group_cols, **kwargs) -> "RefreshStats":
        """Stage a derived-aggregate refresh inside this transaction
        (the :func:`~mex_extractors_spark.lake.derived.
        refresh_aggregates` analog of :meth:`refresh_index`)."""
        from mex_extractors_spark.lake.derived import refresh_aggregates

        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        return refresh_aggregates(
            spark,
            self.catalog.table(source_name),
            self.catalog.table(derived_name),
            group_cols,
            to_version=self.head(source_name),
            branch=self._branch_for(derived_name),
            **kwargs,
        )

    # -- outcome -----------------------------------------------------------

    def commit(self) -> dict:
        """Publish ONE catalog snapshot pinning every staged branch head
        (plus unchanged pins). Raises CommitConflict if another
        transaction committed since this one opened — nothing partial is
        ever visible. Post-CAS, table mains are fast-forwarded and txn
        branches dropped as best-effort housekeeping; a table whose main
        diverged out-of-band keeps its txn branch (retention) and is
        reported under ``"main_diverged"`` in the returned snapshot."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        new_pins = dict(self._base_pins)
        for name, branch in self._branches.items():
            head = self.catalog.table(name).refs().get(branch)
            if head:  # an all-fenced/no-op stage may leave the fork point
                new_pins[name] = head
        snapshot = {
            "version": self.base_version + 1,
            "parent": self.base_version or None,
            "tables": new_pins,
            "txn_id": self.txn_id,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self.catalog._publish(snapshot)  # the ONE atomic step
        self._done = True
        diverged: list[str] = []
        for name, branch in self._branches.items():
            table = self.catalog.table(name)
            try:
                table.fast_forward(branch)
            except CommitConflict:
                # someone committed to this table's main OUTSIDE the
                # catalog: the catalog pin is still correct, and the
                # txn branch is deliberately KEPT (it retains the
                # pinned snapshot against bare table.expire_snapshots;
                # catalog.maintenance would retain it via pins anyway).
                # This is a single-writer violation that no automatic
                # ref swap can resolve without dropping someone's
                # commit — it is surfaced in the returned snapshot's
                # "main_diverged" so the operator can rebase the
                # out-of-band batches through a catalog transaction
                # and fast_forward manually.
                diverged.append(name)
                continue
            table.drop_branch(branch)
        if diverged:
            snapshot = {**snapshot, "main_diverged": sorted(diverged)}
        return snapshot

    def abort(self) -> None:
        """Drop every staged branch; staged snapshots become
        unreferenced and are reclaimed by expire_snapshots."""
        if self._done:
            return
        self._done = True
        for name, branch in self._branches.items():
            self.catalog.table(name).drop_branch(branch)

    def __enter__(self) -> "LakeTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None or not self._done:
            self.abort()


def replay_into_catalog(
    spark: SparkSession,
    catalog: LakeCatalog,
    state_name: str,
    events: DataFrame,
    seq_min: int,
    seq_max: int,
    batch_size: int,
    normalize=None,
    companions: "tuple | list" = (),
    metrics=None,
    max_commit_retries: int = 0,
) -> list[dict]:
    """Seq-range micro-batch replay where EVERY micro-batch commits
    atomically across the state table and its companions (index /
    derived-view refreshers) — the catalog-level analog of
    :meth:`~mex_extractors_spark.streaming.replay.ReplayEngine.replay`.

    ``companions`` are callables ``(spark, txn) -> stats`` run after the
    state batch is staged — e.g.
    ``lambda s, t: t.refresh_index(s, "state", "idx", terms)``. A crash
    anywhere inside a batch aborts the WHOLE transaction: readers never
    see a state version without its index version (the window separate
    per-table commits leave open).

    Exactly-once/resume: a redelivered batch stages per-table no-ops
    (idempotent batch ids inside the staged apply); if NOTHING applied
    anywhere, the transaction is aborted instead of committed, so pure
    redelivery does not advance the catalog. Returns one record per
    batch with the state ApplyStats and the committed catalog version
    (None for skipped redeliveries).

    ``max_commit_retries``: concurrency policy for losing the catalog
    CAS to another writer. The default 0 fails fast (single-writer
    deployments want a loud signal — see the zombie-writer hazard in
    the table CAS docs). >0 re-opens the transaction on the NEW catalog
    head and re-stages the whole batch — safe because staging is
    idempotent (batch-id fencing turns an already-applied table into a
    staged no-op) and optimistic-concurrency-correct because every
    re-stage re-reads through the fresh head's pins."""
    from mex_extractors_spark.streaming.replay import batch_id_for_range

    seq_col = catalog.table(state_name).seq_col
    out: list[dict] = []
    for lo in range(int(seq_min), int(seq_max) + 1, int(batch_size)):
        hi = min(lo + batch_size - 1, int(seq_max))
        batch = events.where((F.col(seq_col) >= lo) & (F.col(seq_col) <= hi))
        if normalize is not None:
            batch = normalize(batch)
        bid = batch_id_for_range(lo, hi)
        for attempt in range(max_commit_retries + 1):
            txn = catalog.transaction()
            try:
                st = txn.apply_batch(spark, state_name, batch, bid)
                comp_stats = [c(spark, txn) for c in companions]
                if st.applied or any(
                    getattr(r, "applied", False) for r in comp_stats
                ):
                    snap = txn.commit()
                    version = snap["version"]
                else:
                    txn.abort()
                    version = None
                break
            except CommitConflict:
                # the CAS did not publish; drop the staged branches
                # (leaking them would pin staged snapshots against
                # expiry forever), then re-stage on the new head
                txn.abort()
                if attempt == max_commit_retries:
                    raise
            except BaseException:
                txn.abort()
                raise
        if metrics is not None:
            metrics.append(st)
        out.append({"batch_id": bid, "stats": st, "catalog_version": version})
    return out
