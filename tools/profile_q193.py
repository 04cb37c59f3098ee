#!/usr/bin/env python
"""One-off: where does q193 spend time at sf0.1?"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

import bench
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = bench._build_session()


def t(label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label:42s} {dt:7.2f}s", flush=True)
    return dt


from iceberg_cache_spark.plans.datapipe import _cluster_splits
from iceberg_cache_spark.plans.shared import ngram_cc_labels, ngram_pair_graph

bench.settle(spark)
t0 = time.perf_counter()
pairs = ngram_pair_graph(spark, SF)
t("pair graph (cold)", pairs)
t("pair graph (cached)", pairs)
labels = ngram_cc_labels(spark, SF)
t("labels (warm pair cache)", labels)
splits = _cluster_splits(spark, SF)
t("splits (one consumption)", splits)

sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
viol = (
    pairs.join(sa, "id_a")
    .join(sb, "id_b")
    .filter(F.col("split_a") != F.col("split_b"))
    .groupBy(F.col("split_a").alias("split"))
    .agg(F.count("*").cast("bigint").alias("cross_pairs"))
)
t("viol", viol)
agg = splits.groupBy("split").agg(
    F.count("*").cast("bigint").alias("n_docs"),
    F.count_distinct("cluster_id").cast("bigint").alias("n_clusters"),
)
t("split agg", agg)

from iceberg_cache_spark.plans import QUERIES

bench.settle(spark)
t0 = time.perf_counter()
QUERIES["q193_split_leakage_audit"](spark, SF).write.format("noop").mode(
    "overwrite").save()
print(f"{'FULL q193 (fresh derived cache)':42s} {time.perf_counter()-t0:7.2f}s")
spark.stop()
