"""End-to-end training-data curation pipeline.

Composes the curation tier into one DataFrame transform (the shape a
100 TB pre-training data job actually runs):

1. drop the benchmark source entirely (it must never train),
2. quality-filter (composite score from ``operators.text``),
3. exact dedup on the normalized-text fingerprint (min-id keeper),
4. benchmark-contamination removal (any shared distinct word 5-gram
   with the benchmark corpus → drop; gram set broadcasts),
5. deterministic train/val/test assignment (id modulus).

Every stage is declarative DataFrame code: the quality filter and the
fingerprint are scan-local expressions; dedup is one hash aggregate;
contamination is a broadcast join + anti-join (the benchmark gram set
is tiny next to the corpus); the split column is a scan-local CASE.
Total shuffles at scale: one for the dedup groupBy, one for the
contamination anti-join — both on keys that partition evenly.

Declared as ``q115_curation_pipeline`` with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_cache_spark.operators.dedup import shingles_of
from iceberg_cache_spark.operators.text import fingerprint, quality_score, tokens


def assign_split(
    id_col: str = "doc_id", train: int = 8, val: int = 1
) -> F.Column:
    """Deterministic split label from the id: ``train`` tenths train,
    ``val`` tenths validation, remainder test."""
    m = F.col(id_col) % 10
    return (
        F.when(m < train, "train")
        .when(m < train + val, "val")
        .otherwise("test")
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Ids of ``docs`` sharing at least one distinct word ``n``-gram
    with ``benchmark``. The benchmark gram set broadcasts; the doc side
    is a generated-column scan — no shuffle of the corpus."""
    def grams(df: DataFrame, *keep: str) -> DataFrame:
        return (
            df.withColumn("_toks", tokens(F.col(text_col)))
            .select(*keep, F.explode(shingles_of(F.col("_toks"), n)).alias("g"))
        )

    bench_grams = grams(benchmark).select("g").distinct()
    return (
        grams(docs, id_col)
        .join(F.broadcast(bench_grams), "g")
        .select(id_col)
        .distinct()
    )


def curate(
    docs: DataFrame,
    benchmark_source: str = "src0",
    quality_min: float = 0.5,
    ngram: int = 5,
) -> DataFrame:
    """Run the full curation pipeline; returns (doc_id, lang, split)."""
    benchmark = docs.filter(F.col("source") == benchmark_source)
    # tokens staged once for the quality filter (round 14; see q66 —
    # the inlined predicate otherwise re-tokenizes 3× per row)
    kept = (
        docs.filter(F.col("source") != benchmark_source)
        .withColumn("_qtk", tokens(F.col("text")))
        .filter(quality_score(F.col("text"), toks=F.col("_qtk")) >= quality_min)
        .drop("_qtk")
    )
    reps = (
        kept.select("doc_id", fingerprint(F.col("text")).alias("_fp"))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    rep_docs = docs.join(reps, "doc_id")  # re-attach text/lang to keepers
    dirty = contaminated_ids(rep_docs, benchmark, n=ngram)
    clean = rep_docs.join(dirty, "doc_id", "left_anti")
    return clean.select(
        "doc_id", "lang", assign_split().alias("split")
    )


def shuffle_order(
    df: DataFrame, id_col: str = "doc_id", num_partitions: int | None = None
) -> DataFrame:
    """Deterministic full-corpus training-order shuffle, scale-safe.

    The declared form (``q112_shuffle_order``) demonstrates the
    semantics with ``row_number() OVER (ORDER BY md5(id))`` — a single-
    partition window sort, fine for a bounded LIMIT, a non-starter for
    writing a 100 TB epoch ordering. This is the production form:

    - ``repartitionByRange`` on the md5 key → a range shuffle (sampled
      range bounds, all partitions work in parallel, no single-task
      Exchange),
    - ``sortWithinPartitions`` → per-partition local sort.

    Range partition i holds keys strictly below partition i+1's, so
    (file order, row order within file) IS the global md5 order — the
    same total order the window form produces, without any global sort.
    A trainer streams files in index order and sees a reproducible,
    well-mixed epoch ordering; re-running on different input
    partitioning yields the identical order (key = content hash of the
    id, range bounds re-sampled but order-preserving)."""
    key = F.md5(F.col(id_col).cast("string"))
    out = df.withColumn("__shuffle_key", key)
    if num_partitions is not None:
        out = out.repartitionByRange(num_partitions, "__shuffle_key", id_col)
    else:
        out = out.repartitionByRange("__shuffle_key", id_col)
    return out.sortWithinPartitions("__shuffle_key", id_col)


def shuffle_order_write(
    df: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` in deterministic shuffled training order (see
    ``shuffle_order``). The shuffle key is dropped from the output;
    the order is carried by (file index, row position)."""
    (
        shuffle_order(df, id_col, num_partitions)
        .drop("__shuffle_key")
        .write.mode(mode)
        .parquet(out_path)
    )


def domain_reweight(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain (source) reweighting toward a uniform token mix — the
    DoReMi-flavoured curation step: sources above their target token
    share are downsampled, sources at/below keep everything.

    All arithmetic is INTEGER (target = total div n_sources; keep rate
    in per-mille = min(1000, 1000·target div actual); a doc survives iff
    id mod 1000 < permille), so the sample is deterministic and
    engine-portable — no float rates, no RNG, reproducible across
    partitionings and re-runs.

    Plan shape at 100 TB: per-source token totals are one hash
    aggregate; the totals table is O(n_sources) rows so it BROADCASTS
    back onto the scan, making the keep decision scan-local; the final
    per-source roll-up is a second small aggregate. No window, no
    global sort."""
    from iceberg_cache_spark.operators.text import token_count

    toks = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(F.col(text_col)).alias("n_tok"),
    )
    per_src = toks.groupBy(source_col).agg(
        F.sum("n_tok").cast("bigint").alias("src_tokens")
    )
    totals = per_src.agg(
        F.sum("src_tokens").alias("total"), F.count("*").alias("n_src")
    )
    rates = (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn("target", F.expr("total div n_src"))
        .withColumn(
            "permille",
            F.least(F.lit(1000), F.expr("(1000 * target) div src_tokens"))
            .cast("bigint"),
        )
        .select(source_col, "src_tokens", "permille")
    )
    kept = (
        toks.join(F.broadcast(rates), source_col)
        .filter((F.col(id_col) % 1000) < F.col("permille"))
        .groupBy(source_col)
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_tok").cast("bigint").alias("kept_tokens"),
        )
    )
    return rates.join(kept, source_col, "left").select(
        source_col,
        "src_tokens",
        "permille",
        F.coalesce("kept_docs", F.lit(0)).cast("bigint").alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
    )
