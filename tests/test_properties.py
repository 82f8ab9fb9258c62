"""Property-based tests (hypothesis) for the engine's core laws.

The reference tests with fixtures and goldens only (SURVEY.md §5 — no
property tests); these state the CDC engine's algebraic contracts over
randomized inputs, which is where replay engines actually break:

- **Batching invariance**: ANY partition of the stream into seq-range
  batches converges to the same table (micro-batch boundaries are an
  execution detail, never semantics).
- **Strategy agreement**: the three LWW kernels (max_by aggregate,
  row_number window, salted two-phase) agree row-for-row.
- **Redelivery idempotence**: replaying any prefix again — same batch
  ids or new overlapping ones — changes nothing (fencing + applied-set).
- **Schema-evolution convergence**: batches may introduce arbitrary
  subsets of new columns in any order; row-level LWW through the
  merged schema still matches the single-threaded oracle.

Small example counts (Spark jobs are seconds each); deadline disabled —
shared-host stalls would fail healthy examples.
"""

from __future__ import annotations

import shutil
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mex_extractors_spark.lake.table import LakeTable
from mex_extractors_spark.operators.lww import (
    apply_deletes,
    lww_latest,
    lww_latest_salted,
    lww_latest_window,
)
from mex_extractors_spark.streaming.replay import ReplayEngine

# a raw change stream: (key_id, op, payload) per event; seq = position+1.
# Few distinct keys on purpose — collisions are where LWW laws bite.
EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.sampled_from(["I", "U", "U", "D"]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=40,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic corpus — CI must not flake
)


def _df(spark, events):
    rows = [
        (i + 1, f"repo{k % 3}", f"f{k}.py", op, f"payload-{v}")
        for i, (k, op, v) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "seq long, repo string, path string, op string, content string"
    )


def _python_oracle(events):
    """Single-threaded reference: apply in seq order, last writer wins,
    delete removes the key."""
    state: dict[tuple[str, str], tuple[int, str]] = {}
    for i, (k, op, v) in enumerate(events):
        key = (f"repo{k % 3}", f"f{k}.py")
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (i + 1, f"payload-{v}")
    return sorted(
        (repo, path, seq, content) for (repo, path), (seq, content) in state.items()
    )


def _table_state(spark, table):
    return sorted(
        tuple(r)
        for r in table.read(spark).select("repo", "path", "seq", "content").collect()
    )


@given(events=EVENTS, batch_size=st.integers(min_value=1, max_value=40))
@settings(**SETTINGS)
def test_batching_invariance(spark, tmp_path_factory, events, batch_size):
    base = tmp_path_factory.mktemp("prop") / uuid.uuid4().hex
    df = _df(spark, events)
    table = LakeTable(str(base), num_buckets=4)
    ReplayEngine(table).replay(spark, df, 1, len(events), batch_size=batch_size)
    assert _table_state(spark, table) == _python_oracle(events)
    shutil.rmtree(base, ignore_errors=True)


@given(events=EVENTS)
@settings(**SETTINGS)
def test_lww_strategies_agree(spark, events):
    df = _df(spark, events)
    outs = [
        sorted(
            tuple(r)
            for r in apply_deletes(fn(df, key_cols=["repo", "path"], seq_col="seq"))
            .select("repo", "path", "seq", "content")
            .collect()
        )
        for fn in (lww_latest, lww_latest_window, lww_latest_salted)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == _python_oracle(events)


@given(
    events=EVENTS,
    cut=st.integers(min_value=1, max_value=40),
)
@settings(**SETTINGS)
def test_redelivery_changes_nothing(spark, tmp_path_factory, events, cut):
    """After full replay, re-applying any prefix — with its original
    batch id (applied-set no-op) AND with a fresh id (watermark fence)
    — leaves the table and version bookkeeping converged."""
    cut = min(cut, len(events))
    base = tmp_path_factory.mktemp("prop") / uuid.uuid4().hex
    df = _df(spark, events)
    table = LakeTable(str(base), num_buckets=4)
    eng = ReplayEngine(table)
    eng.replay(spark, df, 1, len(events), batch_size=max(1, cut))
    before = _table_state(spark, table)
    # same batch ids: skipped outright
    again = eng.replay(spark, df, 1, len(events), batch_size=max(1, cut))
    assert all(not s.applied for s in again)
    # fresh overlapping id: all events fenced, state unchanged
    st_ = table.apply_batch(
        spark, df.where(F.col("seq") <= cut), f"redeliver-{cut}"
    )
    assert st_.applied and st_.events_fenced == cut
    assert _table_state(spark, table) == before == _python_oracle(events)
    shutil.rmtree(base, ignore_errors=True)


SMALL_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.sampled_from(["I", "U", "U", "D"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=10,
)
EXTRA_POOL = ["extra_a", "extra_b", "extra_c"]
BATCHES = st.lists(
    st.tuples(SMALL_EVENTS, st.sets(st.sampled_from(EXTRA_POOL))),
    min_size=1,
    max_size=3,
)


@given(batches=BATCHES)
@settings(**SETTINGS)
def test_schema_evolution_any_column_order_converges(
    spark, tmp_path_factory, batches
):
    """Batches may introduce arbitrary subsets of new nullable columns
    in any order; the table converges to row-level LWW where each key
    carries exactly its winning batch's columns (absent ones null) —
    and every earlier-schema file still reads through the merged
    schema."""
    base = tmp_path_factory.mktemp("prop") / uuid.uuid4().hex
    table = LakeTable(str(base), num_buckets=4)
    seq = 0
    state: dict[tuple[str, str], dict] = {}
    seen_cols: list[str] = []
    for bi, (events, extras) in enumerate(batches):
        extras = sorted(extras)
        for c in extras:
            if c not in seen_cols:
                seen_cols.append(c)
        rows = []
        for k, op, v in events:
            seq += 1
            rows.append(
                (seq, f"repo{k % 3}", f"f{k}.py", op, f"p{v}")
                + tuple(v + j for j in range(len(extras)))
            )
            key = (f"repo{k % 3}", f"f{k}.py")
            if op == "D":
                state.pop(key, None)
            else:
                state[key] = {
                    "seq": seq,
                    "content": f"p{v}",
                    **{c: v + j for j, c in enumerate(extras)},
                }
        schema = (
            "seq long, repo string, path string, op string, content string"
            + "".join(f", {c} long" for c in extras)
        )
        table.apply_batch(
            spark, spark.createDataFrame(rows, schema), f"evo-{bi}"
        )
    got = {}
    for r in table.read(spark).collect():
        d = r.asDict()
        got[(d["repo"], d["path"])] = {
            "seq": d["seq"],
            "content": d["content"],
            **{c: d.get(c) for c in seen_cols if d.get(c) is not None},
        }
    assert got == state
    shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------- codecs

GEOM = st.tuples(
    st.integers(min_value=1, max_value=12),  # h
    st.integers(min_value=1, max_value=12),  # w
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
)


@given(geom=GEOM)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_png_round_trip_law(geom):
    """decode(encode(img)) recovers dims and exact channel means for ANY
    image — heights >= 5 cycle through all five scanline filters, so the
    law covers every reconstruction path."""
    import numpy as np

    from mex_extractors_spark.operators.multimodal import decode_png, png_bytes

    h, w, seed = geom
    rng = np.random.RandomState(seed % 2**32)
    r, g, b = (rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(3))
    w_, h_, mr, mg, mb = decode_png(png_bytes(r, g, b))
    assert (w_, h_) == (w, h)
    assert (mr, mg, mb) == (float(r.mean()), float(g.mean()), float(b.mean()))


@given(
    geom=GEOM,
    n_frames=st.integers(min_value=1, max_value=6),
    fps=st.integers(min_value=1, max_value=30),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_avi_round_trip_law(geom, n_frames, fps):
    """decode(encode(frames)) recovers fps and EXACT pixel arrays for
    any frame stack (bit-level container law, stronger than means)."""
    import numpy as np

    from mex_extractors_spark.operators.multimodal import avi_bytes, decode_avi

    h, w, seed = geom
    rng = np.random.RandomState(seed % 2**32)
    frames = [
        rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n_frames)
    ]
    w_, h_, fps_, out = decode_avi(avi_bytes(frames, fps=fps))
    assert (w_, h_, fps_) == (w, h, float(fps))
    assert len(out) == n_frames
    assert all((a == b).all() for a, b in zip(frames, out))


# --------------------------------------------------- stratified sampling

STRATA_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # id
        st.sampled_from(["a", "b", "c", None]),  # stratum (few, incl. NULL)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(
    rows=STRATA_ROWS,
    quota=st.integers(min_value=1, max_value=6),
    margin=st.sampled_from([1.05, 4.0]),
)
@settings(**SETTINGS)
def test_stratified_sample_law(spark, rows, quota, margin):
    """For ANY id/stratum multiset, quota, and margin — including tight
    margins where the short-stratum fallback carries the result — the
    selection equals the naive per-stratum window (first `quota` ids in
    md5 order, whole stratum when smaller)."""
    import hashlib

    from mex_extractors_spark.operators.sampling import stratified_sample_exact

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        (r.doc_id, r.lang)
        for r in stratified_sample_exact(
            df, "lang", "doc_id", quota=quota, margin=margin
        ).collect()
    }
    by_stratum: dict = {}
    for i, s in rows:
        by_stratum.setdefault(s, []).append(i)
    expect = set()
    for s, ids in by_stratum.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect.update((i, s) for i in ids[:quota])
    assert got == expect


# ---------------------------------------------------------------- envelope law
#
# Roundtrip property for the CDC envelope decoder: ANY change event,
# rendered in ANY of the four wire shapes (Debezium flat / Debezium
# wrapped / Maxwell / with per-record seq source varying), decodes back
# to exactly the row that was rendered. The Python oracle is the
# renderer's own inputs — no SQL, no Spark on the oracle side.

_ENVELOPE_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key id
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=99),  # payload
        st.sampled_from(["dbz-flat", "dbz-wrapped", "maxwell"]),
        st.sampled_from(["lsn", "pos", "ts"]),  # seq source (dbz only)
    ),
    min_size=1,
    max_size=25,
)


@given(events=_ENVELOPE_EVENTS)
@settings(**SETTINGS)
def test_envelope_roundtrip_law(spark, events):
    import json as _json

    from mex_extractors_spark.sources.cdc_envelope import parse_cdc_envelope

    values, expected = [], []
    for i, (k, op, v, shape, seqsrc) in enumerate(events):
        seq = i + 1
        row = {"repo": f"repo{k % 3}", "path": f"f{k}.py", "content": f"p-{v}"}
        if shape == "maxwell":
            rec = {
                "type": {"I": "insert", "U": "update", "D": "delete"}[op],
                "data": row,
                "ts": 1_400_000_000 + i,
                # xid*2^16 + xoffset == seq, so expectations stay uniform
                "xid": 0,
                "xoffset": seq,
            }
        else:
            env = {
                "op": {"I": "c", "U": "u", "D": "d"}[op],
                ("before" if op == "D" else "after"): row,
            }
            if seqsrc == "lsn":
                env["source"] = {"lsn": seq}
            elif seqsrc == "pos":
                env["source"] = {"pos": seq}
            else:  # ts fallback: ts_ms*1000 + total_order must equal seq
                env["ts_ms"] = 0
                env["transaction"] = {"total_order": seq}
            rec = {"payload": env} if shape == "dbz-wrapped" else env
        values.append(_json.dumps(rec))
        expected.append((row["repo"], row["path"], row["content"], op, seq))

    df = spark.createDataFrame([(x,) for x in values], "value string")
    changes, bad = parse_cdc_envelope(
        df, "repo string, path string, content string", key_cols=["repo", "path"]
    )
    assert bad.count() == 0
    got = sorted(
        (r["repo"], r["path"], r["content"], r["op"], r["seq"])
        for r in changes.collect()
    )
    assert got == sorted(expected)
