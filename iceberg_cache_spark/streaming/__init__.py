from iceberg_cache_spark.streaming.joins import stream_stream_join
from iceberg_cache_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "stream_stream_join"]
