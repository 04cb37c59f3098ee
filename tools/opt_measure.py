#!/usr/bin/env python
"""Optimization-round harness: time named queries in a fresh
session (bench methodology — noop sink, settle + clear derived cache
between samples, median-of-3) and optionally dump explain("formatted")
to plans/<round>/<query>_<tag>.txt.

Usage:
  python tools/opt_measure.py [--explain TAG] [--runs N] [--sf DIR] [--plandir r14] q148...

One fresh process per invocation keeps the numbers comparable to the
bench's process-group protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain", metavar="TAG", default=None,
                    help="dump explain('formatted') to plans/<plandir>/<q>_<TAG>.txt")
    ap.add_argument("--plandir", default="r14")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench
    from iceberg_cache_spark.plans import QUERIES

    # resolve prefixes like "q148" to full registry names
    names = []
    for q in args.queries:
        full = [n for n in sorted(QUERIES) if n == q or n.startswith(q + "_")]
        assert full, f"unknown query {q}"
        names.extend(full)

    spark = bench._build_session()
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        if args.explain:
            bench._clear_derived_cache()
            df = QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            os.makedirs(os.path.join(REPO, "plans", args.plandir), exist_ok=True)
            with open(os.path.join(
                    REPO, "plans", args.plandir, f"{name}_{args.explain}.txt"),
                    "w") as fh:
                fh.write(txt)
        bench.settle(spark)
        samples = bench._measure(spark, QUERIES[name], args.sf, args.runs)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
