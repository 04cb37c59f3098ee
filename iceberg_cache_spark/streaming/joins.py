"""Stream-stream joins with watermark-bounded state.

The missing piece of the streaming tier: correlating two live event
streams (e.g. impressions ⨝ clicks, request ⨝ response) where BOTH
sides buffer in state until the watermark proves no more matches can
arrive. Spark requires (1) watermarks on both inputs and (2) a time
bound between the two event times in the join condition — together
they make the state store provably evictable, which is what keeps a
100 TB/day dual-stream join from accumulating unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands
    within ``[left.ts, left.ts + within]`` — the ad-attribution /
    request-response shape.

    Output columns: (key, l_event_id, r_event_id, l_ts, r_ts). The
    interval condition is the state-eviction contract: once the
    watermark passes ``l_ts + within``, the buffered left row can never
    match again and Spark drops it from the store. Works identically in
    batch mode (where it's just a range-predicate join), which is how
    the semantics are oracle-checked."""
    # Event time must be LTZ for watermarks (testdata ts is NTZ; cast
    # at the boundary, back to NTZ on output — windows.py pattern).
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").cast("timestamp").alias("l_ts"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").cast("timestamp").alias("r_ts"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key),
        "l_event_id",
        "r_event_id",
        F.col("l_ts").cast("timestamp_ntz").alias("l_ts"),
        F.col("r_ts").cast("timestamp_ntz").alias("r_ts"),
    )
