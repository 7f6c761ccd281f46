"""Decompose the r1->r2 pipeline_alerts regression (8.72 s -> 16.27 s at
sf0.1, BENCH_r01 vs BENCH_r02) into (a) code-version delta measured in
ONE window and (b) per-stage cost on the current code.

The two BENCH numbers came from different windows on a shared-host VM
whose identical runs vary up to ~2x (BENCH/scaling_series.jsonl), so the
raw 1.87x is window-confounded.  This tool removes the confound:

  1. `git worktree` the round-1 marker commit (8cb7041) into a temp dir.
  2. Run pipeline_alerts at sf0.1 as a subprocess per code version,
     INTERLEAVED r1, HEAD, r1, HEAD ... in the same window, identical
     session config (local[32], warmed, cache-cleared), median per side.
  3. On HEAD only, time each pipeline stage's own action (parse/match/
     correlate/enrich-route) so whatever honest delta remains is
     attributed to a stage, not guessed at.

Prints ONE JSON line; paste the result into BENCH/BASELINE.md's
measurement notes.  Usage:

    python tools/bench_regression.py [--reps 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1_COMMIT = "8cb7041"

# child: import the given repo's __spark_entry__, warm the session, time
# pipeline_alerts' count.  One JSON line on stdout.
CHILD = r"""
import importlib.util, json, os, sys, time
root = sys.argv[1]; sf_dir = sys.argv[2]
sys.path.insert(0, root)
spec = importlib.util.spec_from_file_location(
    "e", os.path.join(root, "__spark_entry__.py"))
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
from sagan_spark.session import get_spark
spark = get_spark("regr", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.range(1000).count()                      # JVM warm
m.queries()["pipeline_alerts"](spark, sf_dir).count()   # full warm pass
walls = []
for _ in range(int(sys.argv[3])):
    spark.catalog.clearCache()
    getattr(m, "_PIPE_CACHE", {}).clear()
    t0 = time.time()
    n = m.queries()["pipeline_alerts"](spark, sf_dir).count()
    walls.append(round(time.time() - t0, 3))
print(json.dumps({"rows": n, "walls": walls}))
"""

# HEAD-only stage breakdown: each stage's own action, cache cleared
STAGES = r"""
import importlib.util, json, os, sys, time
root = sys.argv[1]; sf_dir = sys.argv[2]
sys.path.insert(0, root)
spec = importlib.util.spec_from_file_location(
    "e", os.path.join(root, "__spark_entry__.py"))
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
from sagan_spark.session import get_spark
from sagan_spark.parse import parse_transcripts, split_ignored
from sagan_spark.match import run_match
from sagan_spark.correlate import run_correlate
spark = get_spark("regr_stages", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.range(1000).count()
rs = m._ruleset()
out = {}
def clock(name, thunk):
    spark.catalog.clearCache(); getattr(m, "_PIPE_CACHE", {}).clear()
    t0 = time.time(); thunk(); out[name] = round(time.time() - t0, 3)
t = m._transcripts(spark, sf_dir)
clock("parse", lambda: parse_transcripts(t).count())
parsed = parse_transcripts(t)
kept, _ = split_ignored(parsed, rs.ignore_list)
clock("parse_match", lambda: run_match(kept, rs).count())
clock("parse_match_correlate",
      lambda: run_correlate(run_match(kept, rs), rs).count())
clock("full_pipeline_alerts",
      lambda: m.queries()["pipeline_alerts"](spark, sf_dir).count())
print(json.dumps(out))
"""


def run_child(code: str, root: str, sf_dir: str, reps: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", code, root, sf_dir, str(reps)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_CPUS": "32"})
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed reps inside each child (after warmup)")
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved r1/HEAD child pairs")
    args = ap.parse_args()

    wt = tempfile.mkdtemp(prefix="r1code_")
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    wt, R1_COMMIT], check=True, capture_output=True)
    try:
        r1_walls, head_walls = [], []
        for _ in range(args.rounds):
            r1_walls += run_child(CHILD, wt, args.sf_dir,
                                  args.reps)["walls"]
            head_walls += run_child(CHILD, REPO, args.sf_dir,
                                    args.reps)["walls"]
        stages = run_child(STAGES, REPO, args.sf_dir, args.reps)
        result = {
            "sf_dir": args.sf_dir,
            "r1_commit": R1_COMMIT,
            "r1_walls": r1_walls,
            "head_walls": head_walls,
            "r1_median": round(statistics.median(r1_walls), 3),
            "head_median": round(statistics.median(head_walls), 3),
            "head_over_r1": round(statistics.median(head_walls)
                                  / statistics.median(r1_walls), 3),
            "head_stage_walls": stages,
            "recorded_r1_bench": 8.724, "recorded_r2_bench": 16.272,
        }
        print(json.dumps(result))
        return 0
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove",
                        "--force", wt], capture_output=True)


if __name__ == "__main__":
    sys.exit(main())
