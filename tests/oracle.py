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


# --- Arrow-level type parity -------------------------------------------------
#
# The r10 q179 driver red: an uncast DuckDB SUM() OVER () returns
# HUGEINT, which fetchall() silently narrows to a Python int (this
# harness stayed green) but an Arrow/pandas-based comparator renders as
# decimal128(38,0) → float64 (123 vs 123.0 → value-hash mismatch).
# compare() therefore also enforces TYPE parity at the Arrow layer, so
# the whole class fails locally before it can fail on the driver.


def spark_type_key(dt) -> tuple:
    """Canonical comparison family for a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return ("int",)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return ("float",)
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.scale)
    if isinstance(dt, T.BooleanType):
        return ("bool",)
    if isinstance(dt, T.StringType):
        return ("string",)
    if isinstance(dt, T.BinaryType):
        return ("binary",)
    if isinstance(dt, T.DateType):
        return ("date",)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return ("timestamp",)
    if isinstance(dt, T.ArrayType):
        return ("list", spark_type_key(dt.elementType))
    if isinstance(dt, T.StructType):
        return (
            "struct",
            tuple((f.name, spark_type_key(f.dataType)) for f in dt.fields),
        )
    if isinstance(dt, T.MapType):
        return ("map", spark_type_key(dt.keyType), spark_type_key(dt.valueType))
    return ("other", str(dt))


def arrow_type_key(t) -> tuple:
    """Canonical comparison family for a pyarrow DataType."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return ("int",)
    if pa.types.is_floating(t):
        return ("float",)
    if pa.types.is_decimal(t):
        # DuckDB HUGEINT exports as decimal128(38,0) — its own family:
        # pandas renders it float64, unlike a deliberate decimal that
        # matches the Spark side's scale.
        if t.precision == 38 and t.scale == 0:
            return ("hugeint",)
        return ("decimal", t.scale)
    if pa.types.is_boolean(t):
        return ("bool",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("string",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("binary",)
    if pa.types.is_date(t):
        return ("date",)
    if pa.types.is_timestamp(t):
        return ("timestamp",)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", arrow_type_key(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, arrow_type_key(f.type)) for f in t))
    if pa.types.is_map(t):
        return ("map", arrow_type_key(t.key_type), arrow_type_key(t.item_type))
    return ("other", str(t))


def classify_type_pair(sk: tuple, dk: tuple) -> str | None:
    """None = aligned; 'RED' = values diverge under an Arrow/pandas
    hasher even when fetchall() coercion hides it; 'WARN' = inexact by
    type but lands on the same float64 through pandas."""
    if sk == dk:
        return None
    pair = (sk[0], dk[0])
    if pair in (("int", "hugeint"), ("hugeint", "int")):
        return "RED"
    if pair in (("int", "float"), ("float", "int")):
        return "RED"
    if pair in (("int", "decimal"), ("decimal", "int")):
        return "RED"
    if sk[0] == "decimal" and dk[0] == "decimal":
        return "RED" if sk[1] != dk[1] else None
    if pair in (("float", "decimal"), ("decimal", "float")):
        return "WARN"
    if pair in (("float", "hugeint"), ("hugeint", "float")):
        return "WARN"
    if sk[0] == "list" and dk[0] == "list":
        return classify_type_pair(sk[1], dk[1])
    if sk[0] == "struct" and dk[0] == "struct":
        worst = None
        for (_, st), (_, dt2) in zip(sk[1], dk[1]):
            c = classify_type_pair(st, dt2)
            if c == "RED":
                return "RED"
            worst = worst or c
        return worst
    return "RED"


def assert_type_parity(spark_df, d_arrow_schema) -> None:
    """Raise if any column pairing would diverge under an Arrow hasher."""
    s_types = {f.name: spark_type_key(f.dataType) for f in spark_df.schema.fields}
    d_types = {f.name: arrow_type_key(f.type) for f in d_arrow_schema}
    reds = []
    for col in sorted(set(s_types) & set(d_types)):
        sev = classify_type_pair(s_types[col], d_types[col])
        if sev == "RED":
            reds.append((col, s_types[col], d_types[col]))
    assert not reds, (
        "oracle type-parity RED (fetchall hides it; an Arrow/pandas "
        f"comparator will not): {reds} — CAST the oracle column(s) to "
        "the Spark result type (the r10 q179 uncast-HUGEINT lesson)"
    )


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (driver-style)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        # Re-execute for the Arrow schema (a result consumes once);
        # oracle queries are milliseconds at correctness scales.
        d_arrow_schema = con.execute(oracle_sql).fetch_arrow_table().schema
    finally:
        con.close()
    assert_type_parity(spark_df, d_arrow_schema)

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
