from iceberg_cache_spark.sources.testdata import TABLE_NAMES, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_tables", "register_views"]
