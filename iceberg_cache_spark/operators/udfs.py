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
