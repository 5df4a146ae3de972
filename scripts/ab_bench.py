"""Same-window interleaved A/B of the driver bench across code
versions (round-4 directive: attribute BENCH_r03->r04's +33% to code vs
host window).

Runs `bench.py --queries <subset>` round-robin across N code roots
(git worktrees pinned at the round tips + the live repo), several legs
each, and appends one JSON line per leg to the output file. Each leg is
a fresh spark-submit-equivalent process, so no cache or JVM state leaks
across versions; interleaving means every version samples the same host
window.

Usage:
    python scripts/ab_bench.py [--legs 3] [--out /tmp/ab_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

VERSIONS = [
    ("r3", "/tmp/ab_r3"),
    ("r4", "/tmp/ab_r4"),
    ("r5", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
]

# gates that regressed r3->r4 (VERDICT r4) + stable controls
SUBSET = ("knn_k1,knn_k10,knn_k100,dedup_minhash,simhash,"
          "embedding_neardup,range_count_10k")


def run_leg(root: str) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py"),
             "--queries", SUBSET],
            cwd=root, env=env, capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        # a co-tenant spike (the thing this script measures around) must
        # cost one leg, not the whole interleaved run
        print(f"leg timed out in {root}", file=sys.stderr)
        return None
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    print(f"leg failed in {root}: rc={p.returncode}\n{p.stderr[-2000:]}",
          file=sys.stderr)
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ab_r5.jsonl")
    args = ap.parse_args()
    with open(args.out, "a") as f:
        for leg in range(args.legs):
            for ver, root in VERSIONS:
                t0 = time.time()
                res = run_leg(root)
                rec = {
                    "leg": leg, "ver": ver,
                    "wall": round(time.time() - t0, 1),
                    "queries": (res or {}).get("queries"),
                    "trials": (res or {}).get("trials"),
                    "value": (res or {}).get("value"),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(json.dumps(rec))


if __name__ == "__main__":
    main()
