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


def test_spread_gate_conf_override_wins(spark):
    big = spark.range(0, 10_000_000, 1, 1)
    spark.conf.set(SPREAD_MIN_BYTES_CONF, str(1 << 40))
    try:
        assert _parts(spread_scan(big, "id")) == 1
    finally:
        spark.conf.unset(SPREAD_MIN_BYTES_CONF)
    n = spark.sparkContext.defaultParallelism
    assert _parts(spread_scan(big, "id")) == n
