"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in this engine's sessions)
handles most runtime skew; these helpers are the explicit form for the
cases AQE can't fix — a single hot key in a shuffle join against a
medium-sized (non-broadcastable) side, or a groupBy where one key holds
a double-digit share of all rows.

Both are pure DataFrame rewrites with exactly the original semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    medium: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``salt`` buckets.

    The large side gets a deterministic per-row salt (hash of all
    columns, stable across retries); the medium side is replicated
    ``salt`` times. Shuffle partitions per key grow by ``salt``×, row
    replication only on the smaller side — the standard trade.

    Only join types whose output is row-preserving w.r.t. the large
    side are allowed: under 'right'/'full'/'right_semi'/'right_anti'
    each unmatched *replicated* medium row would be emitted once per
    replica (salt× duplicates), silently breaking the semantics.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            f"medium side would duplicate unmatched rows {salt}x under "
            f"right/full joins. Supported: {sorted(allowed)}"
        )
    salt_col = (F.abs(F.xxhash64(*large.columns)) % salt).alias("_salt")
    salted_large = large.withColumn("_salt", salt_col)
    replicated = medium.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_large.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")


def salted_sum(
    df: DataFrame, group_key: str, value: Column, out_name: str, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation: partial sums per (key, salt), then final
    per key. Spark's hash aggregate already does map-side partials; this
    adds an extra *reduce-side* split for keys too hot for one task.
    Use a decimal-cast ``value`` for order-independent exactness."""
    salt_col = (F.abs(F.xxhash64(*df.columns)) % salt).alias("_salt")
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(group_key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(group_key).agg(F.sum("_partial").alias(out_name))
