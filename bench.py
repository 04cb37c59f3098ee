#!/usr/bin/env python
"""Benchmark: run the declared-query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query executes end-to-end into a noop sink (full plan runs on
executors; nothing materializes on the driver — the honest cluster
cost, not a collect() cost).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_cache_spark.session import get_spark  # noqa: E402
from iceberg_cache_spark.plans import QUERIES  # noqa: E402


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="iceberg_cache_spark_bench")

    # Warm the JVM/codegen once on a trivial plan so q01 doesn't pay startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    # 3 warm-start runs per query, MEDIAN reported (labeled in the
    # payload): run 1 pays codegen compile, the median lands on the
    # warm cost without the min's best-case flattery.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in sorted(QUERIES):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            run_query(QUERIES[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 3)
        spread[name] = {
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
        }

    # cache-hit vs cold (BASELINE.md protocol): the flagship aggregation
    # through the cached engine, second run served from persisted blocks.
    from iceberg_cache_spark.cache import CacheManager
    from iceberg_cache_spark.engine import CachedQueryEngine

    engine = CachedQueryEngine(spark, CacheManager(capacity_bytes=8 << 30))
    engine.register_parquet("lineitem", os.path.join(sf_dir, "lineitem.parquet"))
    flagship = (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "SUM(CAST(l_quantity AS DECIMAL(25,6))) AS q "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )
    t0 = time.perf_counter()
    engine.sql(flagship).collect()
    cold = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    engine.sql(flagship).collect()
    hit = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "declared_query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "query_spread": spread,
        "cache": {"cold_sec": cold, "hit_sec": hit},
        "sf": sf,
        "runs": runs,
        "agg": "median",
        "config": {
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        },
    }
    # Full payload goes to a file; stdout gets ONE compact line (short
    # "qNN" keys, 2-decimal times, no whitespace) so the driver's stdout
    # capture can never truncate the JSON (round-1 BENCH was parsed:null).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    short = {
        re.match(r"(q\d+)", k).group(1) if re.match(r"(q\d+)", k) else k: round(v, 2)
        for k, v in times.items()
    }
    compact = dict(payload)
    compact["queries"] = short
    compact.pop("query_spread", None)  # full spread lives in BENCH_local.json
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
