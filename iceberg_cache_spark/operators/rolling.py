"""Exact rolling time-range aggregates in O(n log n).

Spark's sliding RANGE frame (``RANGE BETWEEN w PRECEDING AND CURRENT
ROW``) re-evaluates the aggregate buffer over the frame rows for every
output row — there is no retraction support — so a partition costs
O(n * frame_width). On bursty event data (many same-key events inside
one frame width) that is effectively quadratic: the round-5 scale probe
measured the naive formulation at 18.6 s for 500k events vs 0.78 s for
50k (x24 at x10 rows) on the bursty sessions corpus, and ~x100 per
decade beyond that.

This module computes the SAME exact per-event frame with two
incremental cumulative windows over a union:

- every event contributes a REAL row at ``t = ts`` and a PROBE row at
  ``t = ts - width - 1`` (integer microseconds; probes carry zero
  weight);
- one ``RANGE UNBOUNDED PRECEDING`` cumulative window per partition
  key (incremental in Spark — O(n) after the sort) gives, at each real
  row, the prefix aggregate over ``ts' <= ts`` (peer-inclusive, both
  engines' RANGE semantics), and at each probe row the prefix over
  ``ts' <= ts - width - 1``, i.e. ``ts' < ts - width``;
- rolling value = real-row prefix − its probe's prefix — exactly the
  inclusive ``[ts - width, ts]`` frame — joined back on the event id.

Cost: one union (no shuffle), one window shuffle on the partition key,
one join-back shuffle on the event id: O(n log n) total, independent
of frame width. Sums accumulate in DECIMAL so the subtraction is exact
and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def rolling_time_agg(
    events: DataFrame,
    width_us: int,
    part_col: str = "user_id",
    id_col: str = "event_id",
    us_col: str = "us",
    val_col: str = "dv",
    cnt_out: str = "n_roll",
    sum_out: str = "sum_roll",
) -> DataFrame:
    """(id, part, us, cnt_out, sum_out): per-event exact count and
    DECIMAL sum over the inclusive ``[us - width_us, us]`` same-key
    time frame. ``val_col`` must already be a DECIMAL column, ``us_col``
    must be non-null (a NULL time has no frame), and ``id_col`` must be
    unique per row (the probe join-back keys on it; duplicate ids would
    fan out). Rows whose frame holds only NULL values yield a NULL sum,
    matching ``SUM(v) OVER w`` on both Spark and DuckDB: a third prefix
    window counts non-null values, and the sum is emitted only when the
    frame's non-null count is positive."""
    ev = events.select(part_col, id_col, us_col, val_col)
    real = ev.select(
        part_col,
        id_col,
        F.col(us_col).alias("_t"),
        F.lit(1).cast("long").alias("_c"),
        F.when(F.col(val_col).isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_cn"),
        F.col(val_col).alias("_v"),
        F.lit(0).alias("_probe"),
        F.col(us_col),
    )
    zero_v = F.lit(0).cast(ev.schema[val_col].dataType)
    probe = ev.select(
        part_col,
        id_col,
        (F.col(us_col) - F.lit(width_us) - F.lit(1)).alias("_t"),
        F.lit(0).cast("long").alias("_c"),
        F.lit(0).cast("long").alias("_cn"),
        zero_v.alias("_v"),
        F.lit(1).alias("_probe"),
        F.col(us_col),
    )
    u = real.unionByName(probe)
    w = (
        W.partitionBy(part_col)
        .orderBy("_t")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    cum = u.select(
        part_col,
        id_col,
        "_probe",
        F.col(us_col),
        F.sum("_c").over(w).alias("_cum_c"),
        F.sum("_cn").over(w).alias("_cum_cn"),
        F.coalesce(F.sum("_v").over(w), zero_v).alias("_cum_v"),
    )
    at_event = cum.filter(F.col("_probe") == 0).select(
        part_col,
        id_col,
        F.col(us_col),
        F.col("_cum_c").alias("_c1"),
        F.col("_cum_cn").alias("_cn1"),
        F.col("_cum_v").alias("_v1"),
    )
    at_probe = cum.filter(F.col("_probe") == 1).select(
        F.col(id_col).alias("_pid"),
        F.col("_cum_c").alias("_c0"),
        F.col("_cum_cn").alias("_cn0"),
        F.col("_cum_v").alias("_v0"),
    )
    return at_event.join(
        at_probe, at_event[id_col] == at_probe["_pid"]
    ).select(
        part_col,
        id_col,
        us_col,
        (F.col("_c1") - F.col("_c0")).alias(cnt_out),
        F.when(
            F.col("_cn1") - F.col("_cn0") > 0, F.col("_v1") - F.col("_v0")
        ).alias(sum_out),
    )
