"""SparkSession construction with scale-aware defaults.

Local mode is the test bed; the config block is written for a real
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized explicitly, Arrow enabled at the
Python boundary (the reference is Arrow-native end-to-end, ref
``src/core/lru_cache.py:38-41``), UTC session time so date semantics
are environment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Read nanosecond parquet timestamps as raw int64 ns instead of failing;
# sources.testdata converts them to proper microsecond timestamps.
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def get_spark(
    app_name: str = "iceberg_cache_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores) for
    dev; on a real cluster pass None and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(NANOS_AS_LONG, "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # Files: split large files into ~128 MiB tasks (default), but
        # coalesce small-file storms into fewer tasks at plan time.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_conf(
    data_tb: float = 100.0,
    executors: int = 1000,
    cores_per_executor: int = 8,
    executor_mem_gb: int = 64,
) -> dict[str, str]:
    """Recommended conf for the target deployment (100 TB / ~1000
    executors). Local mode ignores most of these; on a cluster pass them
    through ``get_spark(extra_conf=cluster_conf())`` or spark-submit.

    Sizing logic:
    - shuffle partitions ≈ max(2 × total cores, data / 200 MB-per-task),
      capped sanely — every big join/agg task should own a partition
      that fits in memory with headroom for AQE to coalesce.
    - AQE owns runtime re-planning (skew splits, partition coalescing,
      broadcast demotion); these are starting points, not hand tuning.
    """
    total_cores = executors * cores_per_executor
    by_size = int(data_tb * 1024 * 1024 / 200)  # 200 MB target per task
    shuffle_parts = max(2 * total_cores, min(by_size, 200_000))
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "268435456",  # 256 MB scan splits
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.executor.cores": str(cores_per_executor),
        "spark.memory.fraction": "0.6",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # Runtime row-level filtering: inject a bloom filter built from
        # the selective side of a join into the other side's scan —
        # at 100 TB this prunes shuffle input for star-schema joins
        # whose dim filters are only known at runtime. Thresholds are
        # cluster-scale (creation side <=10 MB by default), so this is
        # inert on local fixtures but load-bearing at target scale.
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1GB",
        # streaming state at scale
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }


def ensure_session_defaults(spark: SparkSession) -> None:
    """Make an externally-created session safe for this engine.

    The driver harness builds its own SparkSession; queries must not
    depend on how it was configured. Only runtime-settable confs here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(NANOS_AS_LONG, "true")
