"""Scale smoke: run EVERY driver query's Spark side at a larger sf dir
(default /tmp/sf10 — 100× the correctness-gate data) under a per-query
watchdog, and report wall + rows | TIMEOUT | ERROR per query.

This is how the media_frames runaway (unbounded 1→N fan-out) was caught:
the correctness gate at sf0.01 can't see super-linear blow-ups.  A
TIMEOUT here is not automatically a bug — some queries are pinned to
gate-scale knobs (e.g. cosine_dup's 4-bit bands match its static DuckDB
oracle; at real scale the documented band_bits formula applies) — but
every TIMEOUT must have exactly such an explanation.

Usage: python tools/scale_smoke.py [sf_dir] [timeout_sec] [name ...]
Writes BENCH/scale_smoke.json.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    only = set(sys.argv[3:])

    import __spark_entry__ as E
    from sagan_spark.session import get_spark

    spark = get_spark("scale_smoke")
    spark.range(32 * 4, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long").count()

    results: dict[str, dict] = {}
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        E._PIPE_CACHE.clear()
        out: dict = {}

        def run():
            try:
                t0 = time.time()
                out["rows"] = fn(spark, sf_dir).count()
                out["wall"] = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001
                out["error"] = str(e).splitlines()[0][:200]

        th = threading.Thread(target=run, daemon=True)
        t0 = time.time()
        th.start()
        th.join(timeout)
        if th.is_alive():
            spark.sparkContext.cancelAllJobs()
            th.join(30)
            results[name] = {"status": "TIMEOUT",
                             "wall": round(time.time() - t0, 2)}
        elif "error" in out:
            results[name] = {"status": "ERROR", "error": out["error"]}
        else:
            results[name] = {"status": "ok", "rows": out["rows"],
                             "wall": out["wall"]}
        print(f"{results[name].get('status'):>8} {name}: "
              f"{results[name]}", flush=True)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scale_smoke.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "timeout_sec": timeout,
                   "results": results}, f, indent=1)
    bad = [n for n, r in results.items() if r["status"] != "ok"]
    print(json.dumps({"total": len(results), "not_ok": bad}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
