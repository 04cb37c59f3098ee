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

Round 7 masked ``events.ts`` too (the r6 driver red hid in exactly
that exemption) and pins the 9 queries the extended gate caught:

- q153 — NULL ordering keys take the SQL NULL-peer-group RANGE frame
  (rolling_time_agg used to zero them — the r5/r6 driver red);
- q31 — lag/lead NULL ordering: NULLS LAST explicit both sides;
- q39 — as-of join: NULL times never match, either side;
- q80/q82/q87 — event-time windows drop NULL event times (Structured
  Streaming contract; oracle mirrors with WHERE ts IS NOT NULL);
- q81/q152/q156 — sessionization: a NULL-time event is its own
  session (q152/q156) / is dropped by session_window (q81).
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
    # r7: events.ts un-exempted
    "q31_lag_lead",
    "q39_asof_join",
    "q80_tumbling_window",
    "q81_session_window",
    "q82_sliding_window",
    "q87_hypertable_rollup",
    "q152_sessionization",
    "q153_rolling_window",
    "q156_session_funnel",
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
        ("events", "ts"),  # r7: the r6 driver red hid in this exemption
    ]:
        t = pq.read_table(os.path.join(null_sf_dir, f"{table}.parquet"), columns=[col])
        assert t.column(col).null_count > 0, f"{table}.{col} has no NULLs"


def test_null_join_keys_drop_identically(spark):
    """Contract assertion for the gate's remaining key-column
    exemption (gen_nulldata PLAN keeps join/id keys non-null): IF a
    key were NULL, an equi-join must drop the row in BOTH engines
    (NULL = NULL is not true), so the exemption hides no divergence
    class — only rows neither engine would match."""
    import duckdb

    left = [(1, "a"), (None, "b"), (2, "c")]
    right = [(1, "x"), (None, "y"), (3, "z")]
    l_df = spark.createDataFrame(left, "k bigint, lv string")
    r_df = spark.createDataFrame(right, "k bigint, rv string")
    got = sorted(
        (r.lv, r.rv)
        for r in l_df.join(r_df, l_df.k == r_df.k, "inner").collect()
    )
    con = duckdb.connect()
    con.register("l", l_df.toPandas())
    con.register("r", r_df.toPandas())
    want = sorted(
        (a, b)
        for a, b in con.execute(
            "SELECT l.lv, r.rv FROM l JOIN r ON l.k = r.k"
        ).fetchall()
    )
    con.close()
    assert got == want == [("a", "x")]
