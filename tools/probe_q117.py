#!/usr/bin/env python
"""One-off probe: per-sample wall time + JVM GC time + stage-level
breakdown for a named query, to find an intermittent stall."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

import bench
from iceberg_cache_spark.plans import QUERIES

name = sys.argv[1] if len(sys.argv) > 1 else "q117_gopher_rules"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = bench._build_session()
jvm = spark.sparkContext._jvm
mf = jvm.java.lang.management.ManagementFactory


def gc_totals():
    t = 0
    n = 0
    for b in mf.getGarbageCollectorMXBeans():
        t += b.getCollectionTime()
        n += b.getCollectionCount()
    return t, n


tracker = spark.sparkContext.statusTracker()
for i in range(runs):
    bench._clear_derived_cache()
    g0, c0 = gc_totals()
    t0 = time.perf_counter()
    bench.run_query(QUERIES[name](spark, sf))
    wall = time.perf_counter() - t0
    g1, c1 = gc_totals()
    print(f"run {i}: wall={wall:.3f}s gc={(g1 - g0) / 1000.0:.3f}s gcs={c1 - c0}",
          flush=True)
spark.stop()
