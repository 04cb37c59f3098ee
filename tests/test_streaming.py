"""Structured Streaming slice: the same window transforms that the
oracle checks in batch mode, executed as real streams (file source →
memory sink), plus watermarked dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cache_spark.sources.testdata import load_table
from iceberg_cache_spark.streaming import windows as SW


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events rewritten as a multi-file parquet dir (streaming source)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, events_dir, transform, query_name):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {query_name}")


def test_streaming_tumbling_matches_batch(spark, events_dir):
    batch = SW.tumbling_agg(spark.read.parquet(events_dir))
    streamed = _run_stream(
        spark, events_dir, lambda s: SW.stream_tumbling_agg(s, watermark="1 hour"),
        "tumbling_mem",
    )
    b = {(r.win_start, r.n, r.total) for r in batch.collect()}
    s = {(r.win_start, r.n, r.total) for r in streamed.collect()}
    assert b == s and len(b) > 0


def test_streaming_session_matches_batch(spark, events_dir):
    batch = SW.session_agg(spark.read.parquet(events_dir))
    streamed = _run_stream(
        spark, events_dir, lambda s: SW.stream_session_agg(s, watermark="1 hour"),
        "session_mem",
    )
    b = {(r.user_id, r.sess_start, r.n) for r in batch.collect()}
    s = {(r.user_id, r.sess_start, r.n) for r in streamed.collect()}
    assert b == s and len(b) > 0


def test_stream_dedup_bounded_state(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    deduped = SW.stream_dedup(stream, ["user_id", "event_type"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n FROM dedup_mem").collect()[0].n
    distinct = (
        spark.read.parquet(events_dir).select("user_id", "event_type").distinct().count()
    )
    assert got == distinct


def test_stateful_user_stats(spark, events_dir):
    from iceberg_cache_spark.streaming.stateful import stream_user_stats

    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        stream_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user == batch ground truth
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM user_stats_mem").collect()
    }
    batch = spark.read.parquet(events_dir).groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t")
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, _) in want.items():
        assert got[uid][0] == n


def test_stream_static_join(spark, sf_dir, events_dir):
    """Stream-static enrichment: streaming events joined to a static
    dimension — the built-in streaming join shape."""
    static_users = (
        spark.read.parquet(events_dir)
        .select("user_id").distinct()
        .withColumn("segment", F.concat(F.lit("seg_"), (F.col("user_id") % 3)))
    )
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        stream.join(F.broadcast(static_users), "user_id")
        .groupBy("segment").count()
        .writeStream.format("memory").queryName("enriched")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.segment: r["count"] for r in spark.sql("SELECT * FROM enriched").collect()}
    want = {
        r.segment: r["count"]
        for r in spark.read.parquet(events_dir)
        .join(static_users, "user_id").groupBy("segment").count().collect()
    }
    assert got == want and len(got) == 3


def test_stream_to_snapshots_ingestion(spark, events_dir, tmp_path):
    """Streaming ingestion -> versioned snapshots: history grows per
    micro-batch, totals match, time travel sees earlier state."""
    from iceberg_cache_spark.sources.catalog import SnapshotParquetCatalog
    from iceberg_cache_spark.streaming.windows import stream_to_snapshots

    catalog = SnapshotParquetCatalog(spark, str(tmp_path / "wh"))
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(events_dir)
    q = stream_to_snapshots(stream, catalog, "events_live").trigger(
        availableNow=True
    ).option("checkpointLocation", str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    history = catalog.snapshot_history("events_live")
    assert len(history) >= 2  # multiple micro-batch commits
    total = spark.read.parquet(events_dir).count()
    assert catalog.read_table("events_live").count() == total
    first = history[-1]
    assert catalog.read_table(
        "events_live", snapshot_id=first.snapshot_id
    ).count() < total


def test_streaming_sliding_matches_batch(spark, events_dir):
    from iceberg_cache_spark.streaming.windows import stream_sliding_agg

    batch = SW.sliding_agg(spark.read.parquet(events_dir))
    streamed = _run_stream(
        spark, events_dir,
        lambda s: stream_sliding_agg(s, watermark="1 hour"),
        "sliding_mem",
    )
    b = {(r.win_start, r.n, r.total) for r in batch.collect()}
    s = {(r.win_start, r.n, r.total) for r in streamed.collect()}
    assert b == s and len(b) > 0


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Two real streams (even/odd event ids) joined within a 15-minute
    interval; append-mode result must equal the identical batch join."""
    from iceberg_cache_spark.streaming.joins import stream_stream_join

    schema = spark.read.parquet(events_dir).schema

    def split(df):
        return (
            df.filter(F.col("event_id") % 2 == 0),
            df.filter(F.col("event_id") % 2 == 1),
        )

    ls, rs = split(spark.readStream.schema(schema).parquet(events_dir))
    q = (
        stream_stream_join(ls, rs)
        .writeStream.format("memory")
        .queryName("ss_join_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM ss_join_mem").collect()
    )
    lb, rb = split(spark.read.parquet(events_dir))
    want = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in stream_stream_join(lb, rb).collect()
    )
    assert got == want and len(want) > 0


@pytest.fixture(scope="module")
def null_events_dir(spark, tmp_path_factory):
    """The NULL-injected events variant (NULL value/props/event_type —
    tools/gen_nulldata.py) rewritten as a streaming source dir."""
    from tools.gen_nulldata import ensure_nulldata

    path = str(tmp_path_factory.mktemp("nullstream") / "events")
    load_table(spark, ensure_nulldata(), "events").repartition(
        4
    ).write.mode("overwrite").parquet(path)
    return path


def test_streaming_tumbling_null_values_match_batch(spark, null_events_dir):
    """Streaming tier on NULL-bearing data (round-6 NULL gate class):
    watermarked tumbling aggregation over events whose value column is
    ~7% NULL must equal the batch plan — COUNT(*) keeps NULL-value
    rows, SUM skips them, an all-NULL window totals NULL — and the
    stateful path must not crash on NULL payload columns."""
    batch = SW.tumbling_agg(spark.read.parquet(null_events_dir))
    streamed = _run_stream(
        spark, null_events_dir,
        lambda s: SW.stream_tumbling_agg(s, watermark="1 hour"),
        "tumbling_null_mem",
    )
    b = {(r.win_start, r.n, r.total) for r in batch.collect()}
    s = {(r.win_start, r.n, r.total) for r in streamed.collect()}
    assert b == s and len(b) > 0
    # the fixture really exercises the NULL path
    nulls = spark.read.parquet(null_events_dir).filter(F.col("value").isNull())
    assert nulls.count() > 0


def test_stateful_user_stats_null_values(spark, null_events_dir):
    """applyInPandasWithState over NULL-bearing value/event_type: state
    accumulates without crashing and per-user counts equal the batch
    groupBy (counts include NULL-value events; sums skip them)."""
    from iceberg_cache_spark.streaming.stateful import stream_user_stats

    schema = spark.read.parquet(null_events_dir).schema
    stream = spark.readStream.schema(schema).parquet(null_events_dir)
    q = (
        stream_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats_null_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: r.n_events
        for r in spark.sql("SELECT * FROM user_stats_null_mem").collect()
    }
    want = {
        r.user_id: r.n
        for r in spark.read.parquet(null_events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0
