"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship is the full Sagan-style parse->match->enrich->correlate->route
pipeline over the events-derived transcripts table; the rest are the
training-data operators.  Scaling-efficiency evidence (local[8] vs
local[32]) is produced by tools/bench_scaling.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    import __spark_entry__ as E
    from sagan_spark.session import get_spark

    spark = get_spark("bench", cores=cpus)
    qs = E.queries()
    headline = [
        "pipeline_alerts",       # flagship: full rule-engine pipeline
        "correlate_after",       # stateful window correlation
        "correlate_flexbit",     # flexbit store fold
        "dedup_exact",
        "minhash_lsh",           # scale-safe near-dup path (banded LSH);
                                 # the quadratic ngram_jaccard verifier is
                                 # correctness-only, not a benchline
        "text_fingerprint",
        "token_count",
        "quality",
        "lang_id",
        "knn_brute",
    ]

    # warm the RUNTIME so one-time startup cost isn't charged to q1: JVM
    # JIT, parquet footer reads, and the python-worker pool + Arrow IPC
    # channels (a trivial mapInPandas — the workers a long-running cluster
    # job keeps alive; no measured query or its data is precomputed)
    spark.range(1000).count()
    spark.range(32 * 4, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long").count()
    n_turns = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in headline:
        # isolate queries: leftover persisted frames from a previous query
        # would otherwise skew (or accidentally accelerate) later ones
        spark.catalog.clearCache()
        t0 = time.time()
        rows[name] = qs[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    turns_per_sec = round(n_turns / max(times["pipeline_alerts"], 1e-9))

    # sf10 block: the 10M-turn walls where the engine exits fixed cost
    # and actually differentiates (sf0.1 is session/stage fixed-cost
    # dominated, per the note below).  Embedded from the most recent
    # dedicated sf10 run on this host (refresh:
    # SPARK_GRAFT_SF_DIR=/tmp/sf10 python bench.py > BENCH/bench_sf10.json
    # after tools/gen_sf.py 10) unless THIS run is already at sf >= 10.
    sf10_block = None
    sf10_path = os.path.join(REPO, "BENCH", "bench_sf10.json")
    if sf < 10 and os.path.exists(sf10_path):
        try:
            with open(sf10_path) as f:
                prior = json.load(f)
            sf10_block = {
                "queries": prior.get("queries"),
                "total_sec": prior.get("value"),
                "n_turns": prior.get("n_turns"),
                "pipeline_turns_per_sec": prior.get(
                    "pipeline_turns_per_sec"),
                "cpus": prior.get("cpus"),
                **({"reps_note": prior["reps_note"]}
                   if "reps_note" in prior else {}),
                "source": "BENCH/bench_sf10.json, measured on this host "
                          "at mtime " + time.strftime(
                              "%Y-%m-%dT%H:%M:%SZ",
                              time.gmtime(os.path.getmtime(sf10_path))),
            }
        except (OSError, ValueError):
            sf10_block = None

    print(json.dumps({
        "metric": "headline query suite wall time "
                  "(flagship: transcripts rule-pipeline)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "rows": rows,
        "n_turns": n_turns,
        "pipeline_turns_per_sec": turns_per_sec,
        "cpus": cpus,
        **({"sf10": sf10_block} if sf10_block else {}),
        "note": "sf0.1 walls are Spark session/stage fixed-cost dominated "
                "at 100k turns; the representative throughput and the "
                "median-of-reps scaling efficiency (plus the co-location "
                "control decomposing shared-box hardware contention from "
                "engine scaling) are the 67.2M-turn executor-model runs "
                "recorded in BENCH/BASELINE.md",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
