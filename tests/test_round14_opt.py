"""Round-14 optimization invariants.

spread_scan's byte gate (round 14): the spread must keep firing for
sources big enough that per-task compute dominates, stay a no-op for
tiny sources (the driver-measured q117 regression: 32-way fan-out
jitter on sub-second single-task work), and respect the session conf
override.
"""

from __future__ import annotations

from iceberg_cache_spark.operators.materialize import (
    SPREAD_MIN_BYTES_CONF,
    spread_scan,
)


def _parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_spread_gate_small_source_is_noop(spark):
    # ~8 KB estimate in one partition: under the 256 KB/task default,
    # the spread must NOT fire.
    small = spark.range(0, 1000, 1, 1)
    assert _parts(spread_scan(small, "id")) == 1


def test_spread_gate_zero_threshold_restores_unconditional(spark):
    small = spark.range(0, 1000, 1, 1)
    n = spark.sparkContext.defaultParallelism
    assert _parts(spread_scan(small, "id", min_bytes_per_task=0)) == n


def test_spread_gate_big_source_spreads(spark):
    # ~80 MB estimate in one partition: well over any per-call floor
    # the operators use at this scale.
    big = spark.range(0, 10_000_000, 1, 1)
    n = spark.sparkContext.defaultParallelism
    assert _parts(spread_scan(big, "id")) == n


def test_spread_gate_already_parallel_is_noop(spark):
    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000_000, 1, n)
    out = spread_scan(wide, "id", min_bytes_per_task=0)
    assert out is wide


def test_q16_order_matches_r13_formulation(spark, sf_dir):
    """q16's round-14 form (per-distinct-size match arrays + pre-fan-out
    sort) must reproduce the round-13 output ROW FOR ROW — the total
    (p_partkey, s_suppkey) order is produced by construction (ordered
    range partitions × ascending arrays), not by a terminal sort, so
    pin it exactly."""
    from pyspark.sql import functions as F

    from iceberg_cache_spark.plans import QUERIES
    from iceberg_cache_spark.sources.testdata import load_table as T

    new = QUERIES["q16_theta_join"](spark, sf_dir).collect()

    p, s = T(spark, sf_dir, "part"), T(spark, sf_dir, "supplier")
    keys = s.agg(F.sort_array(F.collect_list("s_suppkey")).alias("_ks"))
    old = (
        p.repartitionByRange("p_partkey")
        .crossJoin(F.broadcast(keys))
        .select(
            "p_partkey",
            F.explode(
                F.filter(F.col("_ks"), lambda k: k > F.col("p_size"))
            ).alias("s_suppkey"),
        )
        .sortWithinPartitions("p_partkey", "s_suppkey")
    ).collect()

    assert new == old
    assert new == sorted(new, key=lambda r: (r.p_partkey, r.s_suppkey))


def test_spread_gate_conf_override_wins(spark):
    big = spark.range(0, 10_000_000, 1, 1)
    spark.conf.set(SPREAD_MIN_BYTES_CONF, str(1 << 40))
    try:
        assert _parts(spread_scan(big, "id")) == 1
    finally:
        spark.conf.unset(SPREAD_MIN_BYTES_CONF)
    n = spark.sparkContext.defaultParallelism
    assert _parts(spread_scan(big, "id")) == n
