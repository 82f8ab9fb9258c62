#!/usr/bin/env python
"""Round-5 close A/B: r4 engine (7d71599) vs round-5 HEAD, replay path.

The ab_close protocol (BENCH/ab_close.json precedent): one shared
pre-generated 16M-event tmpfs corpus, taskset-pinned levels, INTERLEAVED
process runs (pre, head, pre, head), per-process warm-up replay, best-of
minima. Certifies that the round-5 changes (stream-ack scoping, bulk
index path, new queries — all off the replay hot path) cost the CDC
replay kernel nothing. Output: BENCH/ab_close_r5.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.environ.get("AB_CORPUS", "/dev/shm/spark-bench/ab_corpus")
PRE_SHA = "7d71599"
PRE_DIR = os.path.join(REPO, ".ab", "close_r4")


def ensure_pre() -> None:
    if not os.path.isdir(PRE_DIR):
        subprocess.run(
            ["git", "worktree", "add", "--detach", PRE_DIR, PRE_SHA],
            cwd=REPO, check=True, capture_output=True,
        )


def run_one(engine_dir: str, cores: int) -> float:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable, "bench.py", "--replay-only",
        f"--cores={cores}", "--events=16000000", "--batches=2",
        f"--events-dir={os.path.join(CORPUS, 'ev16m')}",
        f"--warm-dir={os.path.join(CORPUS, 'warm')}",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=engine_dir,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise SystemExit(f"close A/B run failed in {engine_dir} cores={cores}")
    return float(json.loads(lines[-1])["seconds"])


def main() -> None:
    ensure_pre()
    result = {}
    for cores, reps in ((8, 2), (2, 2)):
        runs = {"pre": [], "head": []}
        for _ in range(reps):
            runs["pre"].append(run_one(PRE_DIR, cores))
            runs["head"].append(run_one(REPO, cores))
            print(f"pin{cores}: pre={runs['pre']} head={runs['head']}", flush=True)
        best_pre, best_head = min(runs["pre"]), min(runs["head"])
        result[f"pin{cores}"] = {
            "best_head_s": best_head,
            "best_pre_s": best_pre,
            "head_over_pre": round(best_head / best_pre, 4),
            "all": runs,
        }
    with open(os.path.join(REPO, "BENCH", "ab_close_r5.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v["head_over_pre"] for k, v in result.items()}))


if __name__ == "__main__":
    main()
