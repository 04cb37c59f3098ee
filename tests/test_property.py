"""Property-based equivalence: random filter/projection predicates run
through Spark and DuckDB must agree (generalizes the corpus's fixed
queries; catches dialect drift the declared set doesn't cover)."""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_cache_spark.sources.testdata import load_table

COLUMNS = {
    "l_quantity": (1, 50),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1, 7),
    "l_orderkey": (1, 60000),
}
OPS = ("<", "<=", ">", ">=", "=", "<>")


@st.composite
def predicate(draw) -> str:
    col = draw(st.sampled_from(sorted(COLUMNS)))
    op = draw(st.sampled_from(OPS))
    lo, hi = COLUMNS[col]
    if isinstance(lo, float):
        val = round(draw(st.floats(lo, hi, allow_nan=False)), 3)
    else:
        val = draw(st.integers(lo, hi))
    return f"{col} {op} {val}"


@st.composite
def where_clause(draw) -> str:
    preds = draw(st.lists(predicate(), min_size=1, max_size=3))
    glue = draw(st.sampled_from([" AND ", " OR "]))
    return glue.join(preds)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    path = os.path.join(sf_dir, "lineitem.parquet")
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{path}')"
    )
    yield con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(clause=where_clause())
def test_random_filters_match_duckdb(spark, sf_dir, duck, clause):
    li = load_table(spark, sf_dir, "lineitem")
    got = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.filter(clause).select("l_orderkey", "l_linenumber").collect()
    )
    want = sorted(
        duck.execute(
            f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {clause}"
        ).fetchall()
    )
    assert got == want, f"filter mismatch for: {clause}"
