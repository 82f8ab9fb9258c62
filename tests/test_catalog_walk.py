"""Model-based random walk over multi-table catalog transactions.

Seeded walks interleave single- and multi-table transactions, aborts,
optimistic-concurrency conflicts (loser retried on the new head),
catalog-snapshot expiry, and full catalog maintenance, against
pure-Python models of both tables plus the catalog's version history.
Checks: the current catalog read of every table matches its model
after (every 3rd) step; snapshot-isolated reads at retained catalog
versions reproduce the recorded multi-table state; aborted and
conflicted transactions leave nothing visible.

Complements tests/test_catalog.py (targeted scenarios) the way
tests/test_model_walk.py complements tests/test_lake.py: randomized
interleavings the hand-written cases never compose.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mex_extractors_spark.lake.catalog import LakeCatalog
from mex_extractors_spark.lake.table import CommitConflict, LakeTable

STATE_KEYS = [(f"org-{i % 2}/repo-{i}", f"src/m_{j}.py") for i in range(4) for j in range(4)]
LANGS = ["py", "rs", "go", "ts", "java"]


def _state_df(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, seq long, op string, content string"
    )


def _stats_df(spark, rows):
    return spark.createDataFrame(rows, "lang string, seq long, op string, n long")


def _apply_state(model: dict, rows) -> None:
    for r in sorted(rows, key=lambda r: r[2]):
        key = (r[0], r[1])
        cur = model.get(key)
        if cur is not None and cur[0] >= r[2]:
            continue
        if r[3] == "D":
            model.pop(key, None)
        else:
            model[key] = (r[2], r[4])


def _apply_stats(model: dict, rows) -> None:
    for r in sorted(rows, key=lambda r: r[1]):
        cur = model.get(r[0])
        if cur is not None and cur[0] >= r[1]:
            continue
        if r[2] == "D":
            model.pop(r[0], None)
        else:
            model[r[0]] = (r[1], r[3])


def _read_state(spark, cat, version=None) -> dict:
    try:
        df = cat.read(spark, "state", catalog_version=version)
    except ValueError:
        # no catalog pin yet at this version <=> never committed <=> empty
        return {}
    return {
        (r["repo"], r["path"]): (r["seq"], r["content"])
        for r in df.select("repo", "path", "seq", "content").collect()
    }


def _read_stats(spark, cat, version=None) -> dict:
    try:
        df = cat.read(spark, "stats", catalog_version=version)
    except ValueError:
        return {}
    return {r["lang"]: (r["seq"], r["n"]) for r in df.select("lang", "seq", "n").collect()}


@pytest.mark.parametrize("seed", [11, 37])
def test_catalog_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = tmp_path / f"cat_{seed}"
    cat = LakeCatalog(str(root))
    cat.register("state", LakeTable(str(root / "state"), num_buckets=4))
    cat.register(
        "stats", LakeTable(str(root / "stats"), key_cols=["lang"], num_buckets=2)
    )
    m_state: dict = {}
    m_stats: dict = {}
    history: dict[int, tuple[dict, dict]] = {}
    seq = 0

    def state_rows(n):
        nonlocal seq
        out = []
        for _ in range(n):
            seq += 1
            repo, path = rng.choice(STATE_KEYS)
            op = rng.choices(["I", "U", "D"], weights=[5, 3, 2])[0]
            out.append((repo, path, seq, op, None if op == "D" else f"c-{seq}"))
        return out

    def stats_rows(n):
        nonlocal seq
        out = []
        for _ in range(n):
            seq += 1
            op = rng.choices(["U", "D"], weights=[8, 1])[0]
            out.append((rng.choice(LANGS), seq, op, None if op == "D" else seq % 97))
        return out

    def record():
        snap = cat.current_snapshot()
        if snap is not None:
            history[int(snap["version"])] = (dict(m_state), dict(m_stats))

    ops = ["commit_state", "commit_both", "commit_both", "abort",
           "conflict", "isolated_read", "expire", "maintenance", "rollback"]
    for step in range(16):
        op = rng.choice(ops)
        if op in ("commit_state", "commit_both"):
            sr = state_rows(rng.randint(1, 6))
            with cat.transaction() as txn:
                txn.apply_batch(spark, "state", _state_df(spark, sr), f"cw-{seed}-{step}-s")
                tr = None
                if op == "commit_both":
                    tr = stats_rows(rng.randint(1, 4))
                    txn.apply_batch(
                        spark, "stats", _stats_df(spark, tr), f"cw-{seed}-{step}-t"
                    )
                txn.commit()
            _apply_state(m_state, sr)
            if op == "commit_both":
                _apply_stats(m_stats, tr)
        elif op == "abort":
            with cat.transaction() as txn:
                txn.apply_batch(
                    spark, "state", _state_df(spark, state_rows(3)), f"ab-{seed}-{step}"
                )
                txn.abort()
            # nothing staged is visible; models unchanged
        elif op == "conflict":
            a, b = cat.transaction(), cat.transaction()
            ra = state_rows(rng.randint(1, 4))
            rb = stats_rows(rng.randint(1, 4))
            a.apply_batch(spark, "state", _state_df(spark, ra), f"cf-{seed}-{step}-a")
            b.apply_batch(spark, "stats", _stats_df(spark, rb), f"cf-{seed}-{step}-b")
            a.commit()
            _apply_state(m_state, ra)
            record()
            with pytest.raises(CommitConflict):
                b.commit()
            b.abort()
            # loser's staged rows are invisible until retried on the new head
            assert _read_stats(spark, cat) == m_stats
            with cat.transaction() as retry:
                retry.apply_batch(
                    spark, "stats", _stats_df(spark, rb), f"cf-{seed}-{step}-b"
                )
                retry.commit()
            _apply_stats(m_stats, rb)
        elif op == "isolated_read" and history:
            retained = {h["version"] for h in cat.history()}
            checkable = sorted(set(history) & retained)
            if checkable:
                v = rng.choice(checkable)
                want_state, want_stats = history[v]
                assert _read_state(spark, cat, version=v) == want_state, f"v{v} state"
                assert _read_stats(spark, cat, version=v) == want_stats, f"v{v} stats"
        elif op == "expire":
            cat.expire_catalog_snapshots(keep_last=rng.randint(1, 3))
            retained = {h["version"] for h in cat.history()}
            for v in list(history):
                if v not in retained:
                    del history[v]
        elif op == "maintenance":
            cat.maintenance(spark, keep_catalog_snapshots=rng.randint(1, 3))
            retained = {h["version"] for h in cat.history()}
            for v in list(history):
                if v not in retained:
                    del history[v]
        elif op == "rollback" and history:
            # target: a model-recorded ancestor on the INTACT parent
            # chain (expiry may have removed intermediate documents,
            # which makes older versions legitimately unprovable)
            cur = cat.current_snapshot()
            chain, v = [], cur["version"] if cur else None
            while v:
                s = cat.snapshot_at(v)
                if s is None:
                    break
                chain.append(v)
                v = s.get("parent")
            targets = [v for v in chain[1:] if v in history]
            if targets:
                target = rng.choice(targets)
                snap = cat.rollback_to(target)
                assert snap.get("main_diverged") is None
                m_state, m_stats = dict(history[target][0]), dict(history[target][1])

        record()
        if step % 3 == 0 or step == 15:
            if cat.current_snapshot() is not None:
                assert _read_state(spark, cat) == m_state, f"step {step} ({op})"
                assert _read_stats(spark, cat) == m_stats, f"step {step} ({op})"

    # end-of-walk: every retained catalog version replays its recorded
    # multi-table state (snapshot isolation across expiry/maintenance)
    retained = {h["version"] for h in cat.history()}
    checked = 0
    for v in sorted(set(history) & retained):
        want_state, want_stats = history[v]
        assert _read_state(spark, cat, version=v) == want_state, f"final v{v} state"
        assert _read_stats(spark, cat, version=v) == want_stats, f"final v{v} stats"
        checked += 1
    assert checked >= 1
