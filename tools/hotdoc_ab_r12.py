"""One-off A/B: old per-token membership rewrite vs new gap-walk on
the hot-doc corpora (single run per cell; the before-probe's 3-run
median protocol did not finish a single old-code 500k cell in 35 min)."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
from pyspark.sql import functions as F
from iceberg_cache_spark.session import get_spark
from iceberg_cache_spark.plans import QUERIES
from iceberg_cache_spark.plans import datapipe as dp
from iceberg_cache_spark.sources.testdata import load_table as T
from bench import run_query, settle

def old_rewrite_cols():
    def kept(t):
        return F.filter(t, lambda x, k: ~F.exists(
            F.col("isls"), lambda r: (k >= r["s"]) & (k <= r["e"])))
    return [
        F.when(F.col("t").isNull(), F.lit(None).cast("string"))
        .when(F.col("isls").isNull(), F.array_join("t", " "))
        .otherwise(F.array_join(kept(F.col("t")), " ")).alias("text_clean"),
        F.col("n_tokens"),
        F.when(F.col("t").isNull(), F.lit(0))
        .when(F.col("isls").isNull(), F.size("t"))
        .otherwise(F.size(kept(F.col("t")))).cast("bigint").alias("n_kept"),
    ]

def q185_with(spark, sf, cols_fn):
    base = dp._span_base(T(spark, sf, "documents"))
    spans = dp._exploded_spans(base)
    corp_spans = spans.filter(F.col("doc_id").isNotNull() & (F.col("doc_id") % dp.DECON_MOD != 0))
    hits = corp_spans.join(dp._guarded_bench_spans(spark, sf, with_bdoc=False), "span").select(
        "doc_id", "n_tokens", "i",
        (F.least(F.col("i") + dp.SPAN_K, F.col("n_tokens")) - 1).alias("fin"))
    isln = dp._merge_islands(hits).groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("isls"))
    corp = base.filter(F.col("doc_id").isNull() | (F.col("doc_id") % dp.DECON_MOD != 0))
    j = corp.join(isln, ["doc_id"], "left")
    return j.select("doc_id", *cols_fn(),
        F.when(F.col("isls").isNull(), F.lit(0)).otherwise(F.lit(1)).cast("bigint").alias("was_contaminated")
    ).orderBy("doc_id", "text_clean")

spark = get_spark(app_name="hotdoc_ab")
spark.range(1000).selectExpr("sum(id)").collect()
out = {}
for L in (100_000, 500_000):
    d = os.path.join("/root/repo/.scaledata", f"hotdoc_{L}")
    cell = {}
    for label, fn in (("new_gap_walk", dp._rewrite_cols), ("old_membership_lambda", old_rewrite_cols)):
        settle(spark)
        t0 = time.perf_counter()
        run_query(q185_with(spark, "/root/repo/.scaledata/__ignored__" if False else d, fn))
        cell[label] = round(time.perf_counter() - t0, 2)
        print(L, label, cell[label], flush=True)
    out[L] = cell
# equality check of the two shapes on the 100k corpus
d = "/root/repo/.scaledata/hotdoc_100000"
a = q185_with(spark, d, dp._rewrite_cols).collect()
b = q185_with(spark, d, old_rewrite_cols).collect()
print("shapes_equal:", a == b, flush=True)
json.dump(out, open(".hotdoc_ab_r12.json", "w"))
spark.stop()
