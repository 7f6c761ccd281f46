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
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _commit() -> str:
    try:
        return subprocess.run(["git", "-C", REPO, "rev-parse", "HEAD"],
                              capture_output=True, text=True,
                              timeout=10).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _steal_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — per-rep hw co-tenancy."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    # reps > 1 (median-of-reps) is for the dedicated sf10 artifact runs —
    # this VM shares CPU with co-tenants, so a single rep can be off 2×;
    # the per-round sf0.1 driver run stays 1 rep (fixed-cost dominated)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
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

    series: list[dict] = []
    rows: dict[str, int] = {}
    for _rep in range(reps):
        rep_times: dict[str, float] = {}
        s0, j0 = _steal_jiffies()
        for name in headline:
            # isolate queries: leftover persisted frames (or an entry
            # memo populated by an earlier query/rep) would otherwise
            # skew — or accidentally accelerate — later measurements
            E.clear_entry_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            rows[name] = qs[name](spark, sf_dir).count()
            rep_times[name] = round(time.time() - t0, 3)
        s1, j1 = _steal_jiffies()
        series.append({
            "queries": rep_times,
            "total_sec": round(sum(rep_times.values()), 3),
            "steal_pct": round(100.0 * (s1 - s0) / max(j1 - j0, 1), 2),
        })

    # headline numbers are MEDIANS across reps (never the best window —
    # this host shares CPU; the same rule BASELINE.md applies to the
    # scaling series), with the full series carried alongside
    times = {name: round(statistics.median(
        r["queries"][name] for r in series), 3) for name in headline}
    total = round(statistics.median(r["total_sec"] for r in series), 3)
    turns_per_sec = round(n_turns / max(times["pipeline_alerts"], 1e-9))

    # sf10 block: the 10M-turn walls where the engine exits fixed cost
    # and actually differentiates (sf0.1 is session/stage fixed-cost
    # dominated, per the note below).  Embedded from the most recent
    # dedicated sf10 run on this host (refresh:
    # SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_BENCH_REPS=3 python bench.py
    # > BENCH/bench_sf10.json after tools/gen_sf.py 10 — reps >= 3 so the
    # medians are real) unless THIS run is already at sf >= 10.
    sf10_block = None
    sf10_path = os.path.join(REPO, "BENCH", "bench_sf10.json")
    if sf < 10 and os.path.exists(sf10_path):
        try:
            with open(sf10_path) as f:
                prior = json.load(f)
            # provenance: a bench_sf10.json produced by a reps>1 run
            # self-records the producing commit + measurement timestamp;
            # older artifacts fall back to file mtime, labeled as such
            # (mtime is checkout/copy time, NOT measurement time)
            if prior.get("measured_at"):
                src = ("BENCH/bench_sf10.json, measured at "
                       f"{prior['measured_at']} by commit "
                       f"{prior.get('commit', 'unknown')[:12]}")
            else:
                src = ("BENCH/bench_sf10.json — no recorded provenance; "
                       "file mtime (checkout/copy time, NOT measurement "
                       "time) is " + time.strftime(
                           "%Y-%m-%dT%H:%M:%SZ",
                           time.gmtime(os.path.getmtime(sf10_path))))
            sf10_block = {
                "queries": prior.get("queries"),
                "total_sec": prior.get("value"),
                "n_turns": prior.get("n_turns"),
                "pipeline_turns_per_sec": prior.get(
                    "pipeline_turns_per_sec"),
                "cpus": prior.get("cpus"),
                "reps": prior.get("reps"),
                **({"series": prior["series"]} if "series" in prior
                   else {}),
                **({"reps_note": prior["reps_note"]}
                   if "reps_note" in prior else {}),
                "source": src,
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
        "reps": reps,
        "series": series,
        "commit": _commit(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
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
