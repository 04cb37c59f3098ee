#!/usr/bin/env python
"""Round-6 scale DELTA measurement (SCALE_r6.md; VERDICT r5 item 8).

Only the operators that changed this round need fresh third-decade
evidence: q148/q150 ride the star-CC loop, which round 6 restructured
(fused star-forest check into label extraction, one job per CC round
via lazy checkpoint). Re-measures their 50k cells (median-of-3, spread
gate) and 500k cells (single run, fresh process — SCALE_r5 documented
q148@500k as session-state-sensitive, so this script measures ONE
operator per process when invoked with an argv selector).

Usage:
    python tools/run_scale_r6.py q148   # one fresh-process cell set
    python tools/run_scale_r6.py q150
Appends to .scale_r6_results.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

from iceberg_cache_spark.session import get_spark  # noqa: E402
from iceberg_cache_spark.plans import QUERIES  # noqa: E402
from tools.gen_scaledata import default_base, ensure_scaledata  # noqa: E402

from bench import run_query, settle, spread_is_ok  # noqa: E402

NAMES = {
    "q148": "q148_dedup_clusters_star",
    "q150": "q150_dedup_apply",
}
OUT = ".scale_r6_results.json"


def main() -> None:
    key = sys.argv[1] if len(sys.argv) > 1 else "q148"
    name = NAMES[key]
    spark = get_spark(app_name="scale_r6")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = QUERIES[name]
    row = {}
    for n in (50_000, 500_000):
        d = ensure_scaledata(default_base(), n)
        runs = 3 if n < 500_000 else 1
        samples = []
        for _ in range(runs):
            settle(spark)
            t0 = time.perf_counter()
            run_query(fn(spark, d))
            samples.append(time.perf_counter() - t0)
        row[str(n)] = {
            "sec": round(statistics.median(samples), 3),
            "spread_ok": spread_is_ok(min(samples), max(samples)),
            "runs": runs,
        }
        print(f"{name} @ {n}: {row[str(n)]}", flush=True)
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data[name] = row
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps({name: row}))


if __name__ == "__main__":
    main()
