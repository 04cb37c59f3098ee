#!/usr/bin/env python
"""Round-11 third-decade probe (SCALE_r11.md): the packing/decontam
apply tier at 5k / 50k / 500k docs — two decades, 100x rows end to
end. The per-round bench probe reads only the 5k->50k decade; this
one-off extends the new tier (q179/q180/q184-q187) to 500k docs under
the same density law (tools/gen_scaledata.py Zipf/Heaps corpus) so the
100-TB trajectory claim rests on a measured second decade, not an
extrapolation. Protocol mirrors tools/run_scale_r9.py: fresh session,
median-of-3 below 500k, single run at 500k (the cell costs minutes and
the decade ratio, not jitter, is the question).

Usage: python tools/run_scale_r11.py   (writes .scale_r11_results.json)
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

from bench import run_query, settle  # noqa: E402

OUT = ".scale_r11_results.json"
NAMES = (
    "q179_sequence_packing",
    "q180_benchmark_decontam",
    "q184_pack_manifest",
    "q185_decontam_rewrite",
    "q186_decontam_accounting",
    "q187_pack_stats",
)
SIZES = (5_000, 50_000, 500_000)


def main() -> None:
    spark = get_spark(app_name="scale_r11")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    dirs = {n: ensure_scaledata(default_base(), n) for n in SIZES}
    out: dict = {"sizes": list(SIZES), "cells": {}}
    for name in NAMES:
        out["cells"][name] = {}
        for n in SIZES:
            runs = 3 if n < 500_000 else 1
            samples = []
            for _ in range(runs):
                settle(spark)
                t0 = time.perf_counter()
                run_query(QUERIES[name](spark, dirs[n]))
                samples.append(round(time.perf_counter() - t0, 3))
            out["cells"][name][f"docs{n}"] = statistics.median(samples)
            print(name, n, out["cells"][name][f"docs{n}"], flush=True)
        c = out["cells"][name]
        c["ratio_d1"] = round(c["docs50000"] / c["docs5000"], 2)
        c["ratio_d2"] = round(c["docs500000"] / c["docs50000"], 2)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
