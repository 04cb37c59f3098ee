#!/usr/bin/env python
"""One-off profiling: where does the ngram pair-graph front spend time
at sf0.1? Stages timed with the noop sink in a fresh bench session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

import bench
from pyspark.sql import functions as F

from iceberg_cache_spark.operators import dedup as D
from iceberg_cache_spark.operators.dedup import with_shingles
from iceberg_cache_spark.operators.materialize import materialize, unmaterialize
from iceberg_cache_spark.sources.testdata import load_table as T

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = bench._build_session()


def t(label, df):
    bench.settle(spark)
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label:42s} {dt:7.2f}s", flush=True)
    return dt


d = T(spark, SF, "documents")
t("scan documents", d)
sh = with_shingles(d, "text", 3)
t("tokenize+shingle", sh)

grams_plan = (
    sh.select(F.col("doc_id"), F.explode_outer(F.col("_sh")).alias("g"))
    .filter(F.col("g").isNotNull())
    .select("doc_id", F.xxhash64("g").alias("gh"))
)
t("grams (no materialize)", grams_plan)

t0 = time.perf_counter()
grams = materialize(grams_plan)
grams.write.format("noop").mode("overwrite").save()
print(f"{'materialize grams (checkpoint+noop)':42s} {time.perf_counter()-t0:7.2f}s",
      flush=True)

gram_df = grams.groupBy("gh").agg(F.count("*").alias("dfreq"))
t("dfreq agg", gram_df)
kept = grams.join(gram_df.filter(F.col("dfreq") <= 100), "gh").select("doc_id", "gh")
t("kept (df-cap join)", kept)
sizes = kept.groupBy("doc_id").agg(F.count("*").alias("sz"))
kept_sz = kept.join(sizes, "doc_id")
t("kept_sz", kept_sz)
a = kept_sz.select(F.col("doc_id").alias("id_a"), "gh", F.col("sz").alias("sz_a"))
b = kept_sz.select(F.col("doc_id").alias("id_b"), "gh", F.col("sz").alias("sz_b"))
pf = 0.5 - 1e-4
inter = (
    a.join(b, "gh")
    .filter(F.col("id_a") < F.col("id_b"))
    .filter((F.col("sz_a") * pf <= F.col("sz_b")) & (F.col("sz_b") * pf <= F.col("sz_a")))
    .groupBy("id_a", "id_b", "sz_a", "sz_b")
    .agg(F.count("*").alias("inter"))
)
t("self-join+intersect", inter)
unmaterialize(grams)

bench.settle(spark)
t0 = time.perf_counter()
pairs = D.ngram_jaccard_pairs(d, n=3, threshold=0.5).select("id_a", "id_b")
pairs.write.format("noop").mode("overwrite").save()
print(f"{'FULL ngram_jaccard_pairs':42s} {time.perf_counter()-t0:7.2f}s", flush=True)

bench.settle(spark)
t0 = time.perf_counter()
labels = D.connected_components_star(D.ngram_jaccard_pairs(d, n=3, threshold=0.5)
                                     .select("id_a", "id_b"),
                                     a_col="id_a", b_col="id_b")
labels.write.format("noop").mode("overwrite").save()
print(f"{'pairs + star-CC (local finish)':42s} {time.perf_counter()-t0:7.2f}s",
      flush=True)

n = d.count()
print(f"documents rows: {n}")
spark.stop()
