"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key.

Spark has no native as-of join (pandas-on-Spark's merge_asof exists but
collects per-group); this is the scalable pure-DataFrame pattern:

    union(left, right) → window last_value(ignorenulls) over
    (partition by key order by time, side) → keep left rows

One shuffle by key, no range explosion, no per-pair comparison — the
shape that survives a 100 TB event stream joined to a slowly-changing
dimension. Ties on time are broken deterministically: right rows sort
before left rows at equal time (inclusive semantics), and among equal
right times the greatest ``tiebreak`` column wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join (backward, inclusive): returns all left columns
    plus ``value_cols`` from the latest right row with
    ``right_time <= left_time`` for the same key (nulls when none).

    NULL times never match (the standard as-of contract, and what a
    correlated ``right_time <= left_time`` lookup returns — NULL
    comparisons are not-true): right rows with NULL time are filtered
    out of the union, and left rows with NULL time sort at the
    partition head (explicit NULLS FIRST), where the running
    last-value prefix is still empty, so their value columns are NULL.
    Round-7 NULL-gate fix: the implicit ordering used to let NULL-time
    rows on either side exchange matches."""
    tiebreak = tiebreak or value_cols[0]
    l_tag = (
        left.withColumn("_k", F.col(left_key))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_tb", F.lit(None).cast(right.schema[tiebreak].dataType))
    )
    for vc in value_cols:
        l_tag = l_tag.withColumn(
            f"_v_{vc}", F.lit(None).cast(right.schema[vc].dataType)
        )
    r_tag = (
        right.withColumn("_k", F.col(right_key))
        .withColumn("_t", F.col(right_time))
        .withColumn("_side", F.lit(0))
        .withColumn("_tb", F.col(tiebreak))
    )
    for vc in value_cols:
        r_tag = r_tag.withColumn(f"_v_{vc}", F.col(vc))

    carry = ["_k", "_t", "_side", "_tb"] + [f"_v_{vc}" for vc in value_cols]
    l_slim = l_tag.select(*left.columns, *carry)
    r_slim = r_tag.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *carry,
    ).filter(F.col("_t").isNotNull())
    unioned = l_slim.unionByName(r_slim)

    # right rows (side 0) sort before left rows at equal time → inclusive;
    # among equal right times the greatest tiebreak lands nearest the
    # window end, so last(ignorenulls) picks it deterministically.
    # NULL-time left rows sort first → empty prefix → NULL match.
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").asc_nulls_first(), "_side", F.col("_tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "_side",
        *[
            F.last(f"_v_{vc}", ignorenulls=True).over(w).alias(vc)
            for vc in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
