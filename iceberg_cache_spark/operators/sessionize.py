"""Skew-resilient gap sessionization.

Gap sessionization is a per-key chain computation (each event's session
depends on its predecessor), so the natural plan — lag + running sum
per user — serializes a key's ENTIRE history through one window task.
Under Zipf traffic (the skew gate's regime: one user holding ~86% of a
100 TB stream) that task is not merely slow, it is impossible.

This module parallelizes the chain exactly, in two phases:

1. **Local phase, per (key, time-bucket)** — the heavy, per-event work:
   order events within the bucket, flag gap breaks, running-sum local
   session ids, and immediately aggregate to per-local-session rows
   (count, min/max time). Every window task is bounded by one bucket of
   one key, independent of key skew.
2. **Merge phase, per key over BUCKET SUMMARIES** — tiny data (one row
   per non-empty bucket): a session spans a bucket boundary iff the
   first event of bucket *b* follows the last event of the previous
   non-empty bucket within the gap, which merges the boundary-local
   sessions; global ids come from an exclusive prefix sum of
   ``local_sessions - merged`` per bucket. Sessions spanning 3+
   buckets chain correctly: a spanned-through bucket contributes one
   local session and one merge, netting zero new sessions.

The result is bit-identical to the single-window formulation (see the
property test): same session numbering (1-based per key in
(time NULLS LAST, id) order), same per-session aggregates. NULL event
times keep their declared contract — each NULL-time event is its own
session, numbered after all timed sessions of its key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize_chunked(
    events: DataFrame,
    gap_us: int,
    bucket_us: int,
    part_col: str = "user_id",
    id_col: str = "event_id",
    us_col: str = "us",
) -> DataFrame:
    """Per-session aggregates ``(part, session_id, n_events, start_us,
    end_us)`` equal to the classic lag+running-sum sessionization over
    ``(us NULLS LAST, id)`` order with a ``gap_us`` inactivity break.
    ``bucket_us`` bounds each window task; any value > 0 is exact
    (bucket boundaries only add merge rows, never change semantics —
    unlike the rolling halo there is no width constraint)."""
    if bucket_us <= 0:
        raise ValueError(f"bucket_us={bucket_us} must be positive")
    ev = events.select(part_col, id_col, us_col)
    nn = ev.filter(F.col(us_col).isNotNull())
    bkt = F.expr(
        f"(({us_col} - pmod({us_col}, {bucket_us})) DIV {bucket_us})"
    )

    # phase 1: per-(key, bucket) local sessions, aggregated immediately
    wloc = W.partitionBy(part_col, "_b").orderBy(us_col, id_col)
    loc = (
        nn.withColumn("_b", bkt)
        .withColumn(
            "_new",
            F.when(
                F.lag(us_col).over(wloc).isNull()
                | (F.col(us_col) - F.lag(us_col).over(wloc) > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_lsid",
            F.sum("_new").over(wloc.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    locagg = loc.groupBy(part_col, "_b", "_lsid").agg(
        F.count("*").alias("_n"),
        F.min(us_col).alias("_min_us"),
        F.max(us_col).alias("_max_us"),
    )

    # phase 2: per-key merge over bucket summaries (one row per bucket)
    bsum = locagg.groupBy(part_col, "_b").agg(
        F.max("_lsid").alias("_nloc"),
        F.min("_min_us").alias("_first"),
        F.max("_max_us").alias("_last"),
    )
    wb = W.partitionBy(part_col).orderBy("_b")
    prev_last = F.lag("_last").over(wb)
    bmerge = bsum.select(
        part_col,
        "_b",
        "_nloc",
        F.when(
            prev_last.isNotNull()
            & (F.col("_first") - prev_last <= gap_us),
            1,
        )
        .otherwise(0)
        .alias("_merged"),
    ).withColumn(
        "_base",
        F.coalesce(
            F.sum(F.col("_nloc") - F.col("_merged")).over(
                wb.rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    # global session id; boundary-merged locals collapse in the re-agg
    gsid = (F.col("_base") + F.col("_lsid") - F.col("_merged")).cast("bigint")
    timed = (
        locagg.join(bmerge, [part_col, "_b"])
        .select(
            part_col,
            gsid.alias("session_id"),
            "_n",
            "_min_us",
            "_max_us",
        )
        .groupBy(part_col, "session_id")
        .agg(
            F.sum("_n").cast("bigint").alias("n_events"),
            F.min("_min_us").alias("start_us"),
            F.max("_max_us").alias("end_us"),
        )
    )

    # NULL event times: own sessions, numbered after all timed sessions
    total = bmerge.groupBy(part_col).agg(
        F.sum(F.col("_nloc") - F.col("_merged")).alias("_S")
    )
    wnull = W.partitionBy(part_col).orderBy(id_col)
    nulls = (
        ev.filter(F.col(us_col).isNull())
        .join(total, part_col, "left")
        .select(
            part_col,
            (
                F.coalesce(F.col("_S"), F.lit(0))
                + F.row_number().over(wnull)
            )
            .cast("bigint")
            .alias("session_id"),
            F.lit(1).cast("bigint").alias("n_events"),
            F.lit(None).cast("long").alias("start_us"),
            F.lit(None).cast("long").alias("end_us"),
        )
    )
    return timed.unionByName(nulls)
