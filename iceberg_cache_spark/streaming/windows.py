"""Windowed aggregations over the events stream.

The reference has no streaming execution (SURVEY.md §2.2 Streaming —
design-doc aspiration only); this is the extension slice built on
Structured Streaming. The same window transforms work in batch mode
(``F.window`` / ``F.session_window`` are batch-legal), which is how the
correctness oracle checks them; ``stream_*`` wrappers attach watermarks
for the incremental path.

Exact DECIMAL sums keep aggregates reproducible across micro-batches
and cluster sizes.

NULL event times belong to no window: Spark's ``F.window`` /
``F.session_window`` drop them natively (the Structured Streaming
contract — a watermark can't order a NULL), and the batch transforms
filter them explicitly so the contract is visible in the plan and the
declared oracles mirror it with ``WHERE ts IS NOT NULL`` (r7 NULL
gate: events.ts is now NULL-masked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def tumbling_agg(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Per-window event count + exact value sum. Columns:
    (win_start, n, total)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total")
    )


def sliding_agg(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total")
    )


def session_agg(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows (gap-based). Columns:
    (user_id, sess_start, n)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("sess_start"), "n")
    )


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (with local-tz semantics); batch-side
    canonical ``ts`` is TIMESTAMP_NTZ. Cast at the boundary — with the
    session pinned to UTC (session.ensure_session_defaults) the NTZ↔LTZ
    round-trip is the identity on wall-clock values."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_agg(
    events: DataFrame, width: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming variant: watermark bounds state; late events beyond the
    watermark are dropped. Use with ``readStream`` sources."""
    out = tumbling_agg(_with_event_time(events).withWatermark("ts", watermark), width)
    return out.withColumn("win_start", F.col("win_start").cast("timestamp_ntz"))


def stream_session_agg(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    out = session_agg(_with_event_time(events).withWatermark("ts", watermark), gap)
    return out.withColumn("sess_start", F.col("sess_start").cast("timestamp_ntz"))


def stream_sliding_agg(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    out = sliding_agg(_with_event_time(events).withWatermark("ts", watermark), width, slide)
    return out.withColumn("win_start", F.col("win_start").cast("timestamp_ntz"))


def stream_dedup(events: DataFrame, keys: list[str], watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup with bounded state."""
    deduped = (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )
    return deduped.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def hypertable_rollup(
    events: DataFrame, granularities: dict[str, str] | None = None
) -> DataFrame:
    """Multi-granularity continuous-aggregate rollup (the hypertable
    pattern): one stacked table of (grain, win_start, n, total) for
    every configured bucket width. Each grain is an independent
    partial-aggregated window agg; at 100 TB the coarser grains are
    incrementally maintainable from the finest one (sums of sums) —
    the finest grain is the only one that must scan raw events."""
    granularities = granularities or {"hour": "1 hour", "day": "1 day"}
    events = events.filter(F.col("ts").isNotNull())
    parts = []
    for name, width in granularities.items():
        parts.append(
            events.groupBy(F.window("ts", width).alias("w"))
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("value").cast(DEC)), 2)
                .cast("double")
                .alias("total"),
            )
            .select(
                F.lit(name).alias("grain"),
                F.col("w.start").alias("win_start"),
                "n",
                "total",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stream_to_snapshots(stream: DataFrame, catalog, table_id: str):
    """Streaming ingestion into the versioned lake table (the
    reference's design-doc aspiration, 'Streaming Ingestion', ref
    docs/arrow_iceberg_cache_design.md:99 — never implemented there):
    each micro-batch commits an append snapshot, so history/time-travel
    work over live data and cache keys roll forward automatically.

    Returns the StreamingQuery; caller controls the trigger."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.write_snapshot(table_id, batch_df, mode="append")

    return stream.writeStream.foreachBatch(commit)
