"""Partitioning-invariance guard: the determinism engineering (exact
DECIMAL aggregation, seeded hashes, fixed fold orders) must make results
identical under different parallelism — the property that lets the same
query hash-match from local[4] to a 1000-executor cluster."""

from __future__ import annotations

import pytest

from iceberg_cache_spark.plans import QUERIES
from tests.oracle import canonical_rows

# Representative of every determinism mechanism: decimal agg, window
# frames, minhash signatures, exact-dot similarity, text scoring.
PROBES = [
    "q17_multiway_join_agg",
    "q20_groupby_agg",
    "q26_stddev_var",
    "q32_window_frame",
    "q62_minhash_near_dup",
    "q66_quality_score",
    "q70_cosine_topk",
    "q88_count_min_sketch",
]


@pytest.mark.parametrize("name", PROBES)
def test_result_invariant_under_shuffle_partitioning(spark, sf_dir, name):
    def run():
        df = QUERIES[name](spark, sf_dir)
        return canonical_rows(df.columns, [tuple(r) for r in df.collect()])

    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        low = run()
        spark.conf.set("spark.sql.shuffle.partitions", "47")
        high = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert low == high and len(low) > 0
