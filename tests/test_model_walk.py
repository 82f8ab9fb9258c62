"""Model-based random walk over the lake's composed operation surface.

A seeded RNG drives a long sequence of operations against one LakeTable
while a pure-Python reference model tracks the expected key→row state
and the full version history. After EVERY step the converged read must
equal the model; at the end, every retained snapshot must reproduce the
model state recorded at its version, tags must survive expiry, and an
expired version must raise instead of returning partial data.

Deterministic seeds rather than hypothesis: shrinking over Spark jobs
is impractical, and a fixed seed keeps the walk reproducible while
still composing interleavings (mor after rebucket after evolution
after expiry ...) that the hand-written scenario tests never reach.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from mex_extractors_spark.lake.table import LakeTable

KEYS = [(f"org-{i % 3}/repo-{i}", f"src/mod_{j}.py") for i in range(6) for j in range(5)]

BASE_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("content", StringType()),
    ]
)
EVOLVED_SCHEMA = StructType(BASE_SCHEMA.fields + [StructField("extra", LongType())])


class Model:
    """Reference state: key -> (seq, content, extra) for live rows,
    plus the state snapshot recorded at every committed version."""

    def __init__(self):
        self.live: dict[tuple, tuple] = {}
        self.history: dict[int, dict] = {}

    def apply(self, rows: list[tuple], evolved: bool) -> None:
        # LWW within the batch and against the current state; deletes
        # remove the key. rows: (repo, path, seq, op, content[, extra])
        for r in sorted(rows, key=lambda r: r[2]):
            key = (r[0], r[1])
            cur = self.live.get(key)
            if cur is not None and cur[0] >= r[2]:
                continue
            if r[3] == "D":
                self.live.pop(key, None)
            else:
                extra = r[5] if evolved and len(r) > 5 else None
                self.live[key] = (r[2], r[4], extra)

    def snapshot(self, version: int) -> None:
        self.history[version] = dict(self.live)


def _mkdf(spark, rows, evolved: bool):
    schema = EVOLVED_SCHEMA if evolved else BASE_SCHEMA
    payload = [r if evolved else r[:5] for r in rows]
    return spark.createDataFrame(payload, schema)


def _read_state(spark, table, ref=None, version=None) -> dict:
    df = table.read(spark, ref=ref, version=version)
    cols = ["repo", "path", "seq", "content"]
    has_extra = "extra" in df.columns
    if has_extra:
        cols.append("extra")
    out = {}
    for r in df.select(*cols).collect():
        out[(r["repo"], r["path"])] = (
            r["seq"],
            r["content"],
            r["extra"] if has_extra else None,
        )
    return out


def _expect(model_state: dict, version_had_extra: bool) -> dict:
    # model always tracks extra; a pre-evolution snapshot read returns
    # rows without the column at all — normalize to extra=None there
    if version_had_extra:
        return {k: v for k, v in model_state.items()}
    return {k: (v[0], v[1], None) for k, v in model_state.items()}


@pytest.mark.parametrize("seed", [7, 23])
def test_lake_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = LakeTable(
        str(tmp_path / f"walk_{seed}"), num_buckets=4, key_cols=["repo", "path"]
    )
    model = Model()
    next_seq = 1
    evolved = False
    applied: list[tuple[str, list[tuple], bool]] = []  # (batch_id, rows, evolved)
    tags: dict[str, int] = {}
    evolved_at: int | None = None  # first version whose schema has extra

    def make_rows(n: int, fenced: bool) -> list[tuple]:
        nonlocal next_seq
        if fenced:
            # reuse already-applied rows verbatim (same key+seq): every
            # event lands at-or-below its bucket watermark
            pool = [r for _b, rs, _e in applied for r in rs]
            return [rng.choice(pool) for _ in range(n)]
        rows = []
        for _ in range(n):
            repo, path = rng.choice(KEYS)
            op = rng.choices(["I", "U", "D"], weights=[5, 3, 2])[0]
            content = None if op == "D" else f"body-{next_seq}"
            extra = None if op == "D" else next_seq * 2
            rows.append((repo, path, next_seq, op, content, extra))
            next_seq += 1
        return rows

    step_ops = ["apply", "apply", "apply", "mor", "fenced", "redeliver",
                "compact", "rebucket", "expire", "tag", "evolve"]
    for step in range(28):
        op = rng.choice(step_ops)
        if op == "evolve" and not evolved:
            evolved = True  # next applies carry the extra column
        elif op in ("apply", "mor"):
            rows = make_rows(rng.randint(1, 8), fenced=False)
            bid = f"walk-{seed}-{step}"
            table.apply_batch(
                spark, _mkdf(spark, rows, evolved), bid,
                mode="mor" if op == "mor" else "cow",
            )
            model.apply(rows, evolved)
            applied.append((bid, rows, evolved))
            if evolved and evolved_at is None:
                evolved_at = table.current_snapshot()["version"]
        elif op == "fenced" and applied:
            # replay already-applied (key, seq) rows under a FRESH batch
            # id: every event is at-or-below its bucket watermark, so
            # the state must not change (bookkeeping commit only)
            rows = make_rows(rng.randint(1, 4), fenced=True)
            if rows:
                table.apply_batch(
                    spark, _mkdf(spark, rows, False), f"fenced-{seed}-{step}"
                )
        elif op == "redeliver" and applied:
            bid, rows, was_evolved = rng.choice(applied)
            st = table.apply_batch(spark, _mkdf(spark, rows, was_evolved), bid)
            assert st.applied is False  # idempotent by batch id
        elif op == "compact":
            table.compact(spark)
        elif op == "rebucket":
            table.rebucket(spark, rng.choice([2, 4, 8]))
        elif op == "expire":
            table.expire_snapshots(keep_last=rng.randint(1, 3))
            # expired versions leave the model's recorded history too
            retained = {s["version"] for s in table.history()}
            model.history = {
                v: s for v, s in model.history.items() if v in retained
            }
        elif op == "tag":
            snap = table.current_snapshot()
            if snap is not None:
                name = f"tag-{seed}-{step}"
                table.create_tag(name)
                tags[name] = snap["version"]

        snap = table.current_snapshot()
        if snap is not None:
            model.snapshot(snap["version"])  # driver-side, every version
            # Spark read-back every 3rd step (and on the last) keeps the
            # walk's runtime bounded; the end-of-walk history sweep still
            # checks every retained version
            if step % 3 == 0 or step == 27:
                got = _read_state(spark, table)
                want = _expect(model.live, version_had_extra=evolved_at is not None
                               and snap["version"] >= evolved_at)
                assert got == want, f"step {step} ({op}): state diverged"

    # every retained version replays its recorded model snapshot
    checked = 0
    for s in table.history():
        v = s["version"]
        if v not in model.history:
            continue  # versions committed before the first model snapshot
        got = _read_state(spark, table, version=v)
        want = _expect(
            model.history[v],
            version_had_extra=evolved_at is not None and v >= evolved_at,
        )
        assert got == want, f"time travel v{v} diverged"
        checked += 1
    assert checked >= 1

    # tags pinned during the walk still resolve and reproduce their state
    for name, v in tags.items():
        if v not in model.history:
            continue
        got = _read_state(spark, table, ref=name)
        want = _expect(
            model.history[v],
            version_had_extra=evolved_at is not None and v >= evolved_at,
        )
        assert got == want, f"tag {name} diverged"

    # an expired version must raise, never partial-read
    retained = {s["version"] for s in table.history()}
    expired = [v for v in range(1, max(retained)) if v not in retained]
    if expired:
        with pytest.raises(ValueError):
            table.read(spark, version=expired[0])


@pytest.mark.parametrize("seed", [11, 41])
def test_dml_random_walk_matches_model(spark, tmp_path, seed):
    """Second walk: CDC applies interleaved with predicate DML
    (delete_where/update_where), MERGE INTO, rollback_to, compaction and
    expiry. The model applies the same relational semantics in Python;
    after every mutating step the converged read must equal it. Rollback
    trims the replayable-batch pool to the surviving ancestry (rows from
    rolled-over commits are no longer fenced — replaying them is a REAL
    apply, which the walk exercises through fresh batches instead)."""
    rng = random.Random(seed)
    table = LakeTable(
        str(tmp_path / f"dmlwalk_{seed}"), num_buckets=4, key_cols=["repo", "path"]
    )
    model = Model()
    next_seq = 1
    repos = sorted({k[0] for k in KEYS})
    # (batch_id, rows, version_after_commit) — trimmed on rollback
    applied: list[tuple[str, list[tuple], int]] = []

    def make_rows(n: int) -> list[tuple]:
        nonlocal next_seq
        rows = []
        for _ in range(n):
            repo, path = rng.choice(KEYS)
            op = rng.choices(["I", "U", "D"], weights=[5, 3, 2])[0]
            content = None if op == "D" else f"body-{next_seq}"
            rows.append((repo, path, next_seq, op, content, None))
            next_seq += 1
        return rows

    def check(step, op):
        got = _read_state(spark, table)
        want = _expect(model.live, version_had_extra=False)
        assert got == want, f"step {step} ({op}): state diverged"

    ops = ["apply", "apply", "apply", "mor", "delete", "update", "merge",
           "rollback", "redeliver", "compact", "expire"]
    for step in range(30):
        op = rng.choice(ops)
        if op in ("apply", "mor"):
            rows = make_rows(rng.randint(1, 8))
            bid = f"dml-{seed}-{step}"
            table.apply_batch(
                spark, _mkdf(spark, rows, False), bid,
                mode="mor" if op == "mor" else "cow",
            )
            model.apply(rows, False)
            applied.append((bid, rows, table.current_snapshot()["version"]))
        elif op == "delete" and model.live:
            repo = rng.choice(repos)
            st = table.delete_where(
                spark, [("repo", "=", repo)], f"del-{seed}-{step}"
            )
            want_n = sum(1 for k in model.live if k[0] == repo)
            assert st.applied and st.matched == want_n, (st, want_n)
            model.live = {k: v for k, v in model.live.items() if k[0] != repo}
        elif op == "update" and model.live:
            repo = rng.choice(repos)
            st = table.update_where(
                spark,
                {"content": F.lit(f"patched-{step}")},
                [("repo", "=", repo)],
                f"upd-{seed}-{step}",
            )
            want_n = sum(1 for k in model.live if k[0] == repo)
            assert st.applied and st.matched == want_n, (st, want_n)
            model.live = {
                k: ((v[0], f"patched-{step}", v[2]) if k[0] == repo else v)
                for k, v in model.live.items()
            }
        elif op == "merge" and model.live:
            # source: a few existing keys (update content) + one new key
            picks = rng.sample(sorted(model.live), k=min(3, len(model.live)))
            src_rows = [
                (r, p, model.live[(r, p)][0], f"merged-{step}") for r, p in picks
            ]
            new_key = (f"org-x/repo-m{step}", "src/merged.py")
            src_rows.append((*new_key, next_seq, f"minted-{step}"))
            next_seq += 1
            src = spark.createDataFrame(
                src_rows, "repo string, path string, seq long, content string"
            )
            st = table.merge_into(
                spark, src, f"mrg-{seed}-{step}",
                when_matched_update={"content": F.col("s.content")},
                when_not_matched_insert=True,
            )
            assert st.applied and st.matched == len(picks)
            for r, p in picks:
                seq0, _c, ex = model.live[(r, p)]
                model.live[(r, p)] = (seq0, f"merged-{step}", ex)
            model.live[new_key] = (src_rows[-1][2], f"minted-{step}", None)
        elif op == "rollback" and len(model.history) >= 2:
            # target: a random retained ancestor of the current head
            cur = table.current_snapshot()["version"]
            chain = []
            v = cur
            while v is not None:
                s = table.snapshot_at(v)
                if s is None:
                    break
                chain.append(v)
                v = s["parent"]
            anc = [v for v in chain if v != cur and v in model.history]
            if anc:
                target = rng.choice(anc)
                table.rollback_to(target)
                model.live = dict(model.history[target])
                applied = [a for a in applied if a[2] <= target]
        elif op == "redeliver" and applied:
            bid, rows, _v = rng.choice(applied)
            st = table.apply_batch(spark, _mkdf(spark, rows, False), bid)
            assert st.applied is False  # idempotent by batch id
        elif op == "compact":
            table.compact(spark)
        elif op == "expire":
            table.expire_snapshots(keep_last=rng.randint(2, 4))
            retained = {s["version"] for s in table.history()}
            model.history = {
                v: s for v, s in model.history.items() if v in retained
            }

        snap = table.current_snapshot()
        if snap is not None:
            model.snapshot(snap["version"])
            if step % 3 == 0 or step == 29:
                check(step, op)

    # every retained, model-recorded version time-travels correctly
    checked = 0
    for s in table.history():
        v = s["version"]
        if v not in model.history:
            continue
        got = _read_state(spark, table, version=v)
        assert got == _expect(model.history[v], False), f"time travel v{v}"
        checked += 1
    assert checked >= 1
