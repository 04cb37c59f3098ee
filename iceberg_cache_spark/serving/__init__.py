from iceberg_cache_spark.serving.flight import SparkFlightServer, query_table, query_sql

__all__ = ["SparkFlightServer", "query_table", "query_sql"]
