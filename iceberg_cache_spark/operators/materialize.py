"""Lineage-truncating materialization with a cluster-grade fallback.

Every iterative / multi-consumer operator in the dedup tier must
materialize an intermediate exactly once (posting lists, signature
tables, per-round CC edge sets): an unmaterialized plan re-runs the
upstream — usually the most expensive stage in the job — once per
consumer or per iteration, and iterative lineage grows without bound.

``localCheckpoint`` is the right default on local[*] and in tests
(no configuration, RAM+disk blocks), but its blocks live on executors:
on a real cluster, losing one executor kills the cached partitions and
— because lineage was truncated — the JOB, not just the task. The
production-grade form is a RELIABLE checkpoint to the configured
checkpoint directory (HDFS/S3), which survives executor loss.

``materialize(df)`` picks per session:
- reliable ``checkpoint(eager=True)`` when the session opted in
  (``spark.iceberg_cache.reliableCheckpoint=true``) AND a checkpoint
  dir is configured (``sparkContext.setCheckpointDir``);
- ``localCheckpoint(eager=True)`` otherwise.

Opt-in (not auto-on-checkpoint-dir) so a session that sets a
checkpoint dir for unrelated reasons doesn't silently pay the
write-to-DFS cost in every dedup operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.iceberg_cache.reliableCheckpoint"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage and materialize ``df`` once (see module doc).

    ``eager=False`` truncates the logical plan immediately but defers
    the checkpoint write to the FIRST job that touches the result — the
    fused-job pattern for iterative loops that follow each round's
    materialization with a small aggregate (e.g. the star-CC fixpoint
    fingerprint): the aggregate both computes the round and persists its
    blocks, halving the loop's job count versus eager + aggregate."""
    spark = df.sparkSession
    try:
        reliable = spark.conf.get(RELIABLE_CONF, "false").lower() == "true"
    except Exception:
        reliable = False
    if reliable and spark.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
