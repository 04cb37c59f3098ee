"""The t2-style gate: every declared query vs. the DuckDB oracle.

Queries with an oracle are hash-matched (count + schema + values);
oracle-less queries (LSH internals, approximate search) must at least
execute and return a well-formed result — their semantics are covered
by planted-duplicate unit tests in test_operators.py.
"""

from __future__ import annotations

import pytest

from iceberg_cache_spark.plans import ORACLE, QUERIES
from tests.oracle import compare

MATCHED = sorted(k for k in QUERIES if k in ORACLE)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLE)


@pytest.mark.parametrize("name", MATCHED)
def test_oracle_match(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLE[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
