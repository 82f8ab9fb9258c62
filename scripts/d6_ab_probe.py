#!/usr/bin/env python
"""Pinned per-query A/B of d6_dedup_components: r3 engine vs r4 engine.

Round-4 verdict flagged d6 as the one perf-weak item: 3.539 s (r3
driver bench) -> 4.243 s (r4 single run) / 3.888 s (r4 minima) — a
~10% minima increase with no A/B separating host noise from the round-4
changes (candidates: the per-round localCheckpoint, _DOUBLING_AFTER).
This probe settles it on the ab_close protocol, narrowed to one query:

- both engines run from frozen worktrees (r3 = 6c46f31, r4 = 7d71599);
- the corpus is the SAME testdata parquet (documents at sf0.1) both
  driver benches read — no generation step, nothing to drift;
- taskset-pinned 8 cores, INTERLEAVED engine runs (A,B,A,B) so a host
  noise window hits both equally; per process one sf0.01 warm-up run
  (JIT/codegen) then two timed sf0.1 runs; best-of-4 minima reported
  (additive shared-host noise -> the minimum is the estimator).

Output: BENCH/d6_ab.json. Verdict rule: ratio <= 1.10 -> noise, close
the item; above -> bisect the named candidates.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINES = {"r3": "6c46f31", "r4": "7d71599"}
PIN_CORES = 8

RUNNER = """
import sys, time, json
sys.path.insert(0, sys.argv[1])
from mex_extractors_spark.session import get_spark
from mex_extractors_spark.plans.queries import REGISTRY

spark = get_spark(cores=%(cores)d, shuffle_partitions=32)
qd = REGISTRY["d6_dedup_components"]
qd.fn(spark, "/root/testdata/sf0.01").count()  # JIT/codegen warm-up
times = []
for _ in range(2):
    t0 = time.monotonic()
    qd.fn(spark, "/root/testdata/sf0.1").count()
    times.append(round(time.monotonic() - t0, 3))
print("D6RESULT " + json.dumps(times))
""" % {"cores": PIN_CORES}


def ensure_worktrees() -> dict[str, str]:
    paths = {}
    for name, sha in ENGINES.items():
        path = os.path.join(REPO, ".ab", f"d6_{name}")
        if not os.path.isdir(path):
            subprocess.run(
                ["git", "worktree", "add", "--detach", path, sha],
                cwd=REPO, check=True, capture_output=True,
            )
        paths[name] = path
    return paths


def run_once(engine_path: str) -> list[float]:
    cmd = [
        "taskset", "-c", f"0-{PIN_CORES - 1}",
        sys.executable, "-c", RUNNER, engine_path,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=engine_path,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(PIN_CORES)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("D6RESULT "):
            return json.loads(line[len("D6RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise SystemExit(f"d6 A/B run failed in {engine_path}")


def main() -> None:
    paths = ensure_worktrees()
    runs: dict[str, list[float]] = {"r3": [], "r4": []}
    for rep in range(2):  # interleaved: r3,r4,r3,r4 — 2 process runs each
        for name in ("r3", "r4"):
            times = run_once(paths[name])
            runs[name].extend(times)
            print(f"rep {rep} {name}: {times}", flush=True)
    best = {k: min(v) for k, v in runs.items()}
    ratio = round(best["r4"] / best["r3"], 4)
    result = {
        "query": "d6_dedup_components",
        "sf_dir": "/root/testdata/sf0.1",
        "pin_cores": PIN_CORES,
        "engines": ENGINES,
        "runs": runs,
        "best": best,
        "r4_over_r3": ratio,
        "verdict": "noise" if ratio <= 1.10 else "real-regression",
    }
    out = os.path.join(REPO, "BENCH", "d6_ab.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["best"]), "ratio:", ratio, "->", result["verdict"])


if __name__ == "__main__":
    main()
