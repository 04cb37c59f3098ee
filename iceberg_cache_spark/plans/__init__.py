"""Declared-query corpus: SURVEY.md §2.2 inventory + extension operators.

Importing this package populates the registry with every implemented
query. ``QUERIES[name](spark, sf_dir) -> DataFrame`` runs the
Spark-first plan; ``ORACLE[name]`` is the equivalent ANSI SQL a DuckDB
oracle runs on the same parquet tables.
"""

from iceberg_cache_spark.plans.registry import ORACLE, QUERIES, declared

# populate the registry
from iceberg_cache_spark.plans import relational  # noqa: E402,F401
from iceberg_cache_spark.plans import extensions  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "declared"]
