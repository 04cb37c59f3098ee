"""NULL-robustness regression tests (round 6).

Round 5's only driver-red row (q153) was a 0-vs-NULL divergence latent
because the fixtures contain no NULLs. The full gate is
``tools/verify_nulls.py`` (every oracle-matched query vs DuckDB on the
NULL-injected ``tools/gen_nulldata.py`` variant — 140/140 green,
NULLCHECK_r6.json); this file pins the 8 queries that gate initially
caught, so their NULL contracts can't silently regress between full
gate runs:

- q30/q32/q33/q36/q105 — window ASC ordering on a nullable key: Spark
  defaults NULLS FIRST, DuckDB NULLS LAST; both sides now say
  NULLS LAST explicitly;
- q50 — CONCAT (NULL-as-empty in DuckDB) vs concat_ws (NULL-skipping):
  oracle now declares CONCAT_WS, identical semantics both engines;
- q67 — lang-id of NULL text: 'und' on both sides (the oracle's CASE
  fell through to 'es' on NULL marker counts);
- q90 — NULL media payload: NULL features (octet_length(NULL) /
  md5(NULL)) instead of a Python-worker crash.
"""

from __future__ import annotations

import os

import pytest

from iceberg_cache_spark.plans import ORACLE, QUERIES
from tests.oracle import compare
from tools.gen_nulldata import ensure_nulldata

CAUGHT_BY_GATE = [
    "q30_row_number",
    "q32_window_frame",
    "q33_ntile",
    "q36_first_last_nth",
    "q50_string_funcs",
    "q67_lang_id",
    "q90_multimodal_features",
    "q105_rank_fns",
]


@pytest.fixture(scope="module")
def null_sf_dir() -> str:
    # sidecar-checked: regenerates whenever the generator's plan,
    # rate, or version changed, never silently reuses stale bytes
    return ensure_nulldata()


@pytest.mark.parametrize("name", CAUGHT_BY_GATE)
def test_null_fixture_matches_oracle(spark, null_sf_dir, name):
    compare(QUERIES[name](spark, null_sf_dir), ORACLE[name], null_sf_dir)


def test_null_fixture_actually_has_nulls(null_sf_dir):
    """The gate is only evidence if the fixture really carries NULLs in
    the columns these queries sort/compute on."""
    import pyarrow.parquet as pq

    for table, col in [
        ("orders", "o_orderdate"),
        ("customer", "c_acctbal"),
        ("part", "p_brand"),
        ("documents", "text"),
    ]:
        t = pq.read_table(os.path.join(null_sf_dir, f"{table}.parquet"), columns=[col])
        assert t.column(col).null_count > 0, f"{table}.{col} has no NULLs"
