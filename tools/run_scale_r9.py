#!/usr/bin/env python
"""Round-9 scale DELTA measurement (SCALE_r9.md; VERDICT r8 item 5).

VERDICT r8 flagged q64_ngram_jaccard's per-round scale-probe decade
ratio "moving 5.3 -> 8.3 between rounds". The two figures are actually
DIFFERENT decades: 5.28x was the THIRD decade (50k -> 500k docs,
SCALE_r7's one-off probe), while the per-round bench probe has always
measured the SECOND decade (5k -> 50k), whose committed history is
r6 8.13x, r7 9.02x (BENCH_local.json at d68a7ac), r8 8.34x — flat
within the r8-measured 1.19x machine drift. This script settles it
with calibrated, quiet-machine medians for BOTH decades in one run:

- calibration anchors first (same three queries as bench.py, at sf0.1)
  so the cells can be drift-normalized against r7/r8 readings;
- q64 @ 5k / 50k / 500k docs, median-of-3 each, fresh-JVM process,
  bench's settle() + spread gate between samples.

Usage: python tools/run_scale_r9.py   (writes .scale_r9_results.json)
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

from bench import (  # noqa: E402
    CALIBRATION_QUERIES,
    CALIBRATION_REF_R7,
    run_query,
    settle,
    spread_is_ok,
)

OUT = ".scale_r9_results.json"
NAME = "q64_ngram_jaccard"


def main() -> None:
    spark = get_spark(app_name="scale_r9")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    out: dict = {"calibration": {}, "cells": {}}

    # calibration anchors (sf0.1) — quietest state of the run
    for name in CALIBRATION_QUERIES:
        samples = []
        for _ in range(3):
            settle(spark)
            t0 = time.perf_counter()
            run_query(QUERIES[name](spark, "/root/testdata/sf0.1"))
            samples.append(time.perf_counter() - t0)
        out["calibration"][name] = round(statistics.median(samples), 3)
    ratios = sorted(
        out["calibration"][n] / CALIBRATION_REF_R7[n]
        for n in CALIBRATION_QUERIES
    )
    out["calibration"]["drift_ratio_vs_r7"] = round(ratios[len(ratios) // 2], 3)
    print("calibration:", json.dumps(out["calibration"]), flush=True)

    fn = QUERIES[NAME]
    for n in (5_000, 50_000, 500_000):
        d = ensure_scaledata(default_base(), n)
        samples = []
        for _ in range(3):
            settle(spark)
            t0 = time.perf_counter()
            run_query(fn(spark, d))
            samples.append(time.perf_counter() - t0)
        out["cells"][str(n)] = {
            "sec": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
            "spread_ok": spread_is_ok(min(samples), max(samples)),
            "runs": 3,
        }
        print(f"{NAME} @ {n}: {out['cells'][str(n)]}", flush=True)
    c = out["cells"]
    out["ratio_decade2"] = round(c["50000"]["sec"] / c["5000"]["sec"], 2)
    out["ratio_decade3"] = round(c["500000"]["sec"] / c["50000"]["sec"], 2)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"decade2": out["ratio_decade2"],
                      "decade3": out["ratio_decade3"]}))


if __name__ == "__main__":
    main()
