"""Empty-input regression tests (round 6).

An empty snapshot or fully-filtered partition is routine at 100 TB.
The full gate is ``tools/verify_empty.py`` (every declared query on
0-row tables — 152/152, EMPTYCHECK_r6.json); this file pins the 7
queries that gate initially caught:

- q126/q127 — KMeans/LogisticRegression cannot fit zero rows: the ML
  operators now return correctly-typed empty frames instead;
- q73 — zero seeded IVF centroids gave a (0,)-shaped numpy matrix and
  an axis error; now explicit (0, 0) shapes;
- q157 — NULL fraction divided by COUNT(*)=0: try_divide yields NULL,
  matching DuckDB's NULL division-by-zero (ANSI Spark would raise);
- q23/q24/q28 — standard SQL emits the () grouping set's grand-total
  row even over empty input, Spark's Expand does not; the oracles
  carry HAVING COUNT(*) > 0 (a no-op on any non-empty input) so both
  engines agree everywhere.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cache_spark.plans import ORACLE, QUERIES
from tests.oracle import compare
from tools.gen_emptydata import ensure_emptydata

CAUGHT_BY_GATE = [
    "q23_rollup",
    "q24_cube",
    "q28_grouping_sets",
    "q73_ivf_cosine_topk",
    "q126_cluster_balanced_sample",
    "q127_quality_classifier",
    "q157_null_profile",
]


@pytest.fixture(scope="module")
def empty_sf_dir() -> str:
    return ensure_emptydata()


@pytest.mark.parametrize("name", CAUGHT_BY_GATE)
def test_empty_fixture_runs_and_matches(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    if name in ORACLE:
        compare(df, ORACLE[name], empty_sf_dir)
    else:
        assert df.count() == 0


def test_ivf_zero_centroids_both_impls(spark):
    """Zero seeded centroids (empty corpus): both the arrow and the
    fold candidate-generation impls must degrade gracefully — the fold
    loop would otherwise build withColumn(None) and fail at PLAN time,
    before any data is touched (r6 review follow-up)."""
    from iceberg_cache_spark.operators import similarity as S

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    for impl in ("fold", "arrow"):
        assigned = S.ivf_assign(empty, [], impl=impl)
        assert assigned.count() == 0 and "ivf_cell" in assigned.columns
        topk = S.ivf_cosine_topk(empty, empty.select(
            F.col("vec_id").alias("query_id"), "embedding"
        ), [], impl=impl)
        assert topk.count() == 0
        assert topk.columns == ["query_id", "vec_id", "sim", "rnk"]


def test_rollup_grand_total_alignment_documented(spark, empty_sf_dir):
    """The HAVING alignment must stay a no-op on non-empty input: on
    the standard fixtures q23 keeps its grand-total row (HAVING
    count>0 filters nothing)."""
    got = QUERIES["q23_rollup"](spark, "/root/testdata/sf0.001").collect()
    assert any(r.n_regionkey is None and r.n_name is None for r in got)
    assert QUERIES["q23_rollup"](spark, empty_sf_dir).count() == 0
