#!/usr/bin/env python
"""Streaming demo: events parquet replayed as a stream → watermarked
tumbling aggregation + custom stateful per-user stats → memory sinks.

Run: python examples/demo_streaming.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_cache_spark.session import get_spark
from iceberg_cache_spark.sources.testdata import load_table
from iceberg_cache_spark.streaming.stateful import stream_user_stats
from iceberg_cache_spark.streaming.windows import stream_tumbling_agg


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo_streaming")

    src = os.path.join(tempfile.mkdtemp(prefix="stream_"), "events")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    q1 = (
        stream_tumbling_agg(stream, width="10 minutes", watermark="1 hour")
        .writeStream.format("memory").queryName("win").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q2 = (
        stream_user_stats(spark.readStream.schema(schema).parquet(src))
        .writeStream.format("memory").queryName("ustats").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination(300)
    q2.awaitTermination(300)

    print("windows:", spark.sql("SELECT COUNT(*) n FROM win").collect()[0].n)
    print(spark.sql("SELECT * FROM win ORDER BY n DESC LIMIT 3").show())
    print("users:", spark.sql("SELECT COUNT(*) n FROM ustats").collect()[0].n)
    print(
        spark.sql(
            "SELECT * FROM ustats ORDER BY n_events DESC LIMIT 3"
        ).show()
    )


if __name__ == "__main__":
    main()
