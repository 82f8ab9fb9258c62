#!/usr/bin/env python
"""Pinned A/B of two engine checkouts on one pre-generated corpus.

Round-3 verdict: the driver bench regressed 62% end-to-end vs round 2
(7.54 s -> 12.19 s at local[32]) with no committed A/B separating host
noise from the round-3 write-path features (stats sidecars, bloom
build, catalog commit log, idempotency window). This script settles it:

- ONE corpus, generated once (synth.py is byte-identical between the
  two checkouts — verified by `git diff 415cf72 6c46f31 -- synth.py`);
- both engines run from frozen worktrees (`git worktree add`), via the
  same `bench.py --replay-only --events-dir` protocol each round's
  scaling evidence already uses (per-process JIT warm-up replay, lake
  on tmpfs);
- INTERLEAVED repeats (A,B,A,B,...) at every level so a host-noise
  window hits both engines equally; best-of-N minima reported (host
  noise on a shared box is additive, the minimum is the low-variance
  estimator);
- levels: taskset-pinned 2 and 8 cores on the 16M-event scaling
  corpus, plus the DRIVER-SHAPE level — unpinned local[32] on the
  4M-event/4-batch corpus, exactly the regime BENCH_r{2,3}.json were
  recorded in.

Output: BENCH/ab_r2_r3.json (all runs + minima + ratios).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB = {
    "r2": os.path.join(REPO, ".ab", "r2"),
    "r3": os.path.join(REPO, ".ab", "r3"),
}
CORPUS = os.environ.get("AB_CORPUS", "/dev/shm/spark-bench/ab_corpus")


def gen_corpora() -> None:
    """Generate the shared corpora once, with the r3 checkout (synth is
    identical in both; the generator engine is irrelevant to the A/B)."""
    if os.path.exists(os.path.join(CORPUS, "_done")):
        return
    os.makedirs(CORPUS, exist_ok=True)
    sys.path.insert(0, AB["r3"])
    import bench  # the r3 worktree copy

    spark = bench._bench_spark(32, "ab-gen")
    # scaling corpus: 16M events / 2 segments (the BASELINE.md protocol)
    bench.gen_events(spark, os.path.join(CORPUS, "ev16m"), 16_000_000, 2, 20_000, 200)
    # driver-shape corpus: 4M events / 4 segments (the BENCH_rN regime)
    bench.gen_events(spark, os.path.join(CORPUS, "ev4m"), 4_000_000, 4, 5_000, 200)
    bench.gen_events(spark, os.path.join(CORPUS, "warm"), 100_000, 2, 20_000, 200)
    spark.stop()
    open(os.path.join(CORPUS, "_done"), "w").write("ok")


def run_one(engine: str, cores: int, pin: bool, events: int, batches: int, ev_dir: str) -> dict:
    cmd = [
        sys.executable, "bench.py", "--replay-only",
        f"--cores={cores}", f"--events={events}", f"--batches={batches}",
        f"--events-dir={ev_dir}", f"--warm-dir={os.path.join(CORPUS, 'warm')}",
    ]
    if pin:
        cmd = ["taskset", "-c", f"0-{cores - 1}", *cmd]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=AB[engine],
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise SystemExit(f"A/B run failed: {engine} cores={cores}")
    return json.loads(lines[-1])


LEVELS = {
    # name: (cores, pin, events, batches, corpus subdir)
    "pin2": (2, True, 16_000_000, 2, "ev16m"),
    "pin8": (8, True, 16_000_000, 2, "ev16m"),
    "driver32": (32, False, 4_000_000, 4, "ev4m"),
}
RUNS_FILE = os.path.join(REPO, "BENCH", "ab_runs.jsonl")


def summarize() -> None:
    runs: dict[str, dict[str, list[dict]]] = {}
    with open(RUNS_FILE) as fh:
        for line in fh:
            rec = json.loads(line)
            runs.setdefault(rec["level"], {}).setdefault(rec["engine"], []).append(
                rec["result"]
            )
    summary = {}
    for name, by_engine in runs.items():
        best = {e: min(r["seconds"] for r in rs) for e, rs in by_engine.items()}
        summary[name] = {
            "best_r2_s": best.get("r2"),
            "best_r3_s": best.get("r3"),
            "r3_over_r2": round(best["r3"] / best["r2"], 4)
            if "r2" in best and "r3" in best
            else None,
            "all_r2_s": [r["seconds"] for r in by_engine.get("r2", [])],
            "all_r3_s": [r["seconds"] for r in by_engine.get("r3", [])],
        }
    with open(os.path.join(REPO, "BENCH", "ab_r2_r3.json"), "w") as fh:
        json.dump({"summary": summary, "runs": runs}, fh, indent=1)
    print(json.dumps(summary))


def main() -> None:
    """One invocation = one (level, engine) run appended to the jsonl —
    the caller interleaves (r2, r3, r2, r3, ...) per level so host-noise
    windows hit both engines; `--summarize` folds the log into
    ab_r2_r3.json with best-of minima and ratios."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--summarize", action="store_true")
    ap.add_argument("--level", choices=sorted(LEVELS))
    ap.add_argument("--engine", choices=("r2", "r3"))
    args = ap.parse_args()
    if args.gen:
        gen_corpora()
        return
    if args.summarize:
        summarize()
        return
    cores, pin, events, batches, sub = LEVELS[args.level]
    res = run_one(args.engine, cores, pin, events, batches, os.path.join(CORPUS, sub))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(RUNS_FILE, "a") as fh:
        fh.write(
            json.dumps({"level": args.level, "engine": args.engine, "result": res})
            + "\n"
        )
    print(
        json.dumps(
            {
                "level": args.level,
                "engine": args.engine,
                "seconds": res["seconds"],
                "events_per_sec": res["events_per_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
