"""The ``unmaterialize`` successor guard (ADVICE r7).

The iterative CC loops release each round's local-checkpoint blocks
right after the round's probe action fills the NEXT round's lazy
checkpoint. That ordering used to be enforced only by comments at the
call sites — and local-checkpointed RDDs cannot recompute a
predecessor's unpersisted blocks, so a reordering would fail
unrecoverably. ``unmaterialize(df, successor=...)`` now verifies the
successor's checkpoint is complete before releasing, and SKIPS the
release (keeping correctness, deferring memory) otherwise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_cache_spark.operators.materialize import (
    _root_rdd,
    materialize,
    unmaterialize,
)


def test_guard_skips_release_until_successor_checkpointed(spark):
    base = materialize(spark.range(200).withColumn("x", F.col("id") * 2))
    succ = materialize(base.withColumn("y", F.col("x") + 1), eager=False)
    assert not _root_rdd(succ).isCheckpointed()

    # successor's lazy checkpoint not filled yet: release must be a no-op
    unmaterialize(base, successor=succ)
    assert _root_rdd(base).getStorageLevel().useMemory(), (
        "guard released the predecessor while the successor could "
        "still need its blocks"
    )

    succ.count()  # first action fills the local checkpoint
    assert _root_rdd(succ).isCheckpointed()
    unmaterialize(base, successor=succ)
    assert not _root_rdd(base).getStorageLevel().useMemory()
    assert [r["y"] for r in succ.orderBy("id").limit(3).collect()] == [1, 3, 5]


def test_unguarded_release_still_works(spark):
    base = materialize(spark.range(50))
    assert _root_rdd(base).getStorageLevel().useMemory()
    unmaterialize(base)
    assert not _root_rdd(base).getStorageLevel().useMemory()


def test_derived_frame_is_silent_noop(spark):
    base = materialize(spark.range(50))
    derived = base.filter(F.col("id") > 10)  # root is not the scan
    unmaterialize(derived)
    assert _root_rdd(base).getStorageLevel().useMemory()
    unmaterialize(base)
