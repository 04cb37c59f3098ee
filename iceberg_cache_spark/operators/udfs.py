"""UDF-surface operators: the extension point the reference reserved
but never used (SURVEY.md §2.2 UDF/UDAF/UDTF — no ``udf`` call exists
in the reference). Demonstrated Spark-first:

- document chunking as a *pure DataFrame* table function (no Python in
  the hot path — transform + posexplode stays in codegen), and
- an Arrow-batched ``pandas_udf`` for vector math where a UDF is the
  honest choice.

Both are deterministic and oracle-checkable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from iceberg_cache_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
) -> DataFrame:
    """Split documents into fixed-size token chunks:
    (id, chunk_id, chunk_text, n_chunk_tokens).

    The UDTF shape without a UDTF: chunk boundaries are computed with
    array expressions and fanned out by posexplode — whole-stage
    codegen, no Python workers, shuffle-free."""
    k = chunk_tokens
    with_toks = df.withColumn("_toks", tokens(F.col(text_col)))
    n = F.size("_toks")
    n_chunks = F.when(n > 0, F.ceil(n / F.lit(k))).otherwise(F.lit(0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(F.col("_toks"), i * k + 1, k), " "),
    )
    exploded = with_toks.select(
        F.col(id_col),
        F.posexplode_outer(F.when(n_chunks > 0, chunks)).alias("chunk_id", "chunk_text"),
    ).filter(F.col("chunk_text").isNotNull())
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "chunk_text",
        F.size(F.split("chunk_text", " ")).cast("bigint").alias("n_chunk_tokens"),
    )


def make_l2_norm_udf():
    """Arrow-batched vector L2 norm, accumulated in DECIMAL(·,12) —
    the same exact arithmetic the engine-side operators use, so the
    result is bit-identical to the decimal-sum oracle regardless of
    batch boundaries or partitioning.

    Built inside a factory with only local/stdlib references so the UDF
    pickles BY VALUE — a module-level pandas_udf pickles by reference
    and fails on workers that can't import this repo."""

    def _norms(vectors: pd.Series) -> pd.Series:
        import math as _math
        from decimal import ROUND_HALF_UP as _RHU
        from decimal import Decimal as _D

        q12 = _D("1e-12")

        def norm(v) -> float:
            total = _D(0)
            for x in v:
                fx = float(x)
                total += _D(fx * fx).quantize(q12, _RHU)
            return _math.sqrt(float(total))

        return vectors.map(norm)

    return F.pandas_udf(_norms, DoubleType())


def with_l2_norm(df: DataFrame, vec_col: str = "embedding", out: str = "l2") -> DataFrame:
    return df.withColumn(out, make_l2_norm_udf()(F.col(vec_col)))


def grouped_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    use_pandas: bool = False,
) -> DataFrame:
    """Per-group z-score. Default is the pure-aggregate relational form
    (decimal-exact sums + broadcast join back) — scan-local arithmetic,
    one shuffle on the group key, safe at any group size. Pass
    ``use_pandas=True`` for the applyInPandas grouped-map form, kept to
    exercise the Python-UDF surface: it lands EACH group in one pandas
    frame on one worker, so at 100 TB a hot group OOMs — demo path
    only. Both paths use the same exact-Decimal algebra, so outputs
    are bit-identical."""
    if not use_pandas:
        vdec = F.col(value_col).cast("decimal(25,6)")
        v2dec = (F.col(value_col) * F.col(value_col)).cast("decimal(25,6)")
        g = df.groupBy(group_col).agg(
            F.count("*").alias("n"),
            F.sum(vdec).cast("double").alias("s1"),
            F.sum(v2dec).cast("double").alias("s2"),
        )
        n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
        var = (s2 - s1 * s1 / n) / (n - 1)
        z = F.when(
            (n > 1) & (var > 0),
            F.round((F.col(value_col) - s1 / n) / F.sqrt(var), 4),
        ).otherwise(F.lit(0.0))
        return (
            df.select(id_col, group_col, value_col)
            .join(F.broadcast(g), group_col)
            .select(id_col, group_col, z.alias("z"))
        )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(group_col, StringType()),
            StructField("z", DoubleType()),
        ]
    )

    def compute(pdf):
        import pandas as _pd
        from decimal import ROUND_HALF_UP as _RHU
        from decimal import Decimal as _D

        q6 = _D("1e-6")
        xs = [float(v) for v in pdf[value_col]]
        n = len(xs)
        s1 = sum((_D(x).quantize(q6, _RHU) for x in xs), _D(0))
        s2 = sum((_D(x * x).quantize(q6, _RHU) for x in xs), _D(0))
        mean = float(s1) / n
        var = (float(s2) - float(s1) * float(s1) / n) / (n - 1) if n > 1 else 0.0
        sd = var**0.5
        zs = [round((x - mean) / sd, 4) if sd > 0 else 0.0 for x in xs]
        return _pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "z": zs}
        )

    return df.select(id_col, group_col, value_col).groupBy(group_col).applyInPandas(
        compute, schema
    )


def make_sentence_udtf():
    """Python UDTF (Spark ≥3.5): one input text row → one row per
    sentence. Class defined in a factory so it pickles by value."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("sent_id", IntegerType()),
            StructField("sentence", StringType()),
        ]
    )

    class SentenceSplitter:
        def eval(self, text: str):
            import re as _re

            if text is None:
                return
            pieces = _re.split(r"[.!?]", text)
            i = 0
            for p in pieces:
                p = p.strip()
                if p:
                    yield i, p
                    i += 1

    return udtf(SentenceSplitter, returnType=schema)
