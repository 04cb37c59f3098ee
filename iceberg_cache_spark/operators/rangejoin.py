"""Range join: points matched to intervals that contain them.

Spark plans a raw ``t >= start AND t < end`` join as a broadcast
nested-loop (or worse, a cartesian) — O(|points|·|intervals|). This
operator buckets both sides into fixed time bins and equi-joins on
(key, bin) first, so each point is only compared against intervals
whose bins it touches: the standard interval-binning rewrite, one
shuffle, no pair explosion. Exact containment is re-checked after the
bin join, so results are identical to the naive inequality join.

Bin size should be ≥ the typical interval length (an interval spanning
b bins is replicated b times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(col: str) -> F.Column:
    # NTZ-safe: session is pinned UTC, so the LTZ cast is the identity
    return F.expr(f"unix_micros(cast(cast({col} as timestamp) as timestamp_ltz))")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_time: str,
    interval_start: str,
    interval_end: str,
    bin_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Inner join of points to every interval containing them:
    ``key match AND start <= t < end``. Returns all columns from both
    inputs (caller selects/renames)."""
    bin_us = F.lit(bin_seconds * 1_000_000)
    p = points.withColumn("_bin", (_epoch_us(point_time) / bin_us).cast("bigint"))
    i = intervals.withColumn(
        "_bins",
        F.sequence(
            (_epoch_us(interval_start) / bin_us).cast("bigint"),
            ((_epoch_us(interval_end) - 1) / bin_us).cast("bigint"),
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    joined = p.join(
        i,
        (p["_bin"] == i["_bin"])
        & (F.col(point_key) == F.col(interval_key))
        & (F.col(point_time) >= F.col(interval_start))
        & (F.col(point_time) < F.col(interval_end)),
    )
    return joined.drop("_bin")
