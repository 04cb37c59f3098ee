"""Custom stateful streaming operator via applyInPandasWithState.

The piece Structured Streaming's built-in windows can't express: an
arbitrary per-key running aggregate that survives across micro-batches.
State here is (event_count, value_sum) per user — the template for
session enrichment, rate tracking, or feature accumulation at 100 TB
(state is partitioned by key across executors; the store is RocksDB or
the default HDFS-backed one in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def stream_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state.

    Use with ``outputMode("update")``; each micro-batch emits the new
    running totals for users seen in that batch. The state function is
    defined locally so it pickles by value (workers need no repo import).
    """

    def update(key, pdfs, state):
        import pandas as _pd

        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
