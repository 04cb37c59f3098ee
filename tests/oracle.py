"""DuckDB-oracle comparison harness.

Mirrors the driver's t2 gate: run the Spark plan and the oracle SQL on
the same parquet tables, then compare row count, column names, and an
order-insensitive canonical value multiset. Exact comparison — the
determinism engineering in the query corpus (DECIMAL aggregation,
explicit rounding) is what makes exact float equality achievable.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb

from iceberg_cache_spark.sources.testdata import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # Planted test fixtures carry only the table(s) a query reads;
        # the driver's sf dirs always have all ten.
        if not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (driver-style)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc = canonical_rows(s_cols, s_rows)
    dc = canonical_rows(d_cols, d_rows)
    if sc != dc:
        import pyspark

        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(sc, dc) if a != b)} rows); "
            f"first diffs (spark, duckdb): {diffs} "
            f"[pyspark {pyspark.__version__}, duckdb {duckdb.__version__}]"
        )
