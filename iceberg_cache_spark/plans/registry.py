"""Registry of declared queries with their DuckDB oracle SQL.

Determinism contract (SURVEY.md §2.2 / FIXTURES.md):
- Every hash-matched query has a total ORDER BY over a unique key.
- Floating aggregates go through exact DECIMAL arithmetic so Spark and
  DuckDB produce bit-identical doubles regardless of summation order
  (plain double SUM is order-dependent and would flake the value-hash).
- Counts are BIGINT on both sides; extracted date parts cast to BIGINT
  (DuckDB EXTRACT returns BIGINT, Spark year() returns INT).
- Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def declared(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible operators (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco
