"""Engine facade: SQL seam, read-through caching, snapshot-keyed misses."""

from __future__ import annotations

import os

import pytest

from iceberg_cache_spark.cache import CacheManager
from iceberg_cache_spark.engine import CachedQueryEngine
from iceberg_cache_spark.sources.catalog import SnapshotParquetCatalog


@pytest.fixture()
def engine(spark):
    return CachedQueryEngine(spark, CacheManager(capacity_bytes=10**9))


def test_sql_over_registered_tables(spark, sf_dir, engine):
    for t in ("region", "nation"):
        engine.register_parquet(t, os.path.join(sf_dir, f"{t}.parquet"))
    rows = engine.sql(
        "SELECT r.r_name, COUNT(*) AS n FROM region r "
        "JOIN nation n ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
    ).collect()
    assert len(rows) == 5 and all(r.n == 5 for r in rows)
    # second query reuses the registered views (register-once): the
    # cache keeps exactly one entry per table — no reload, no new miss
    misses_before = engine.stats()["misses"]
    entries_before = engine.stats()["entries"]
    n = engine.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n
    assert n == 25
    assert engine.stats()["misses"] == misses_before
    assert engine.stats()["entries"] == entries_before
    engine.cache.clear()


def test_snapshot_commit_is_cache_miss(spark, tmp_path, engine):
    catalog = SnapshotParquetCatalog(spark, str(tmp_path / "wh"))
    catalog.write_snapshot("t", spark.range(0, 10))
    engine.register_catalog_table(catalog, "t")

    assert engine.table("t").count() == 10
    assert engine.table("t").count() == 10  # cache hit, same snapshot
    stats = engine.stats()
    assert stats["hits"] == 1 and stats["misses"] == 1

    catalog.write_snapshot("t", spark.range(0, 30))
    assert engine.table("t").count() == 30  # new snapshot -> miss -> reload
    assert engine.stats()["misses"] == 2
    engine.cache.clear()


def test_column_subsumption_reuse(spark, tmp_path, engine):
    calls = []

    def loader():
        calls.append(1)
        return spark.range(100).selectExpr("id", "id * 2 AS a", "id * 3 AS b")

    engine.register_loader("t", loader)
    engine.table("t")  # full-column entry
    narrow = engine.table("t", columns=["id", "a"])  # served from cache
    assert len(calls) == 1
    assert narrow.columns == ["id", "a"] and narrow.count() == 100
    engine.cache.clear()


def test_build_engine_from_config(spark, sf_dir):
    import os as _os

    from iceberg_cache_spark.config import EngineConfig, build_engine

    cfg = EngineConfig(
        app_name="cfg_test",
        max_cache_bytes=64 << 20,
        eviction_policy="composite",
        start_maintenance=False,
        parquet_tables={"region": _os.path.join(sf_dir, "region.parquet")},
    )
    eng = build_engine(cfg)
    assert eng.sql("SELECT COUNT(*) AS n FROM region").collect()[0].n == 5
    assert eng.stats()["capacity_bytes"] == 64 << 20
    eng.cache.clear()

    with pytest.raises(ValueError):
        build_engine(EngineConfig(eviction_policy="nope"))


def test_plan_fingerprint_result_cache(spark, sf_dir, engine):
    import os as _os

    engine.register_parquet("region", _os.path.join(sf_dir, "region.parquet"))
    q1 = "SELECT r_regionkey, COUNT(*) AS n FROM region GROUP BY r_regionkey"
    # same plan, cosmetically different SQL
    q2 = "SELECT   r_regionkey,  COUNT(*)   AS n\nFROM region\nGROUP BY r_regionkey"
    d1 = engine.sql(q1, cache_result=True)
    misses_after_first = engine.stats()["misses"]
    d2 = engine.sql(q2, cache_result=True)
    assert engine.stats()["misses"] == misses_after_first  # plan-level hit
    assert d2.is_cached
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    # semantically different SQL is a different fingerprint
    engine.sql(q1 + " HAVING COUNT(*) > 0", cache_result=True)
    assert engine.stats()["misses"] == misses_after_first + 1
    engine.cache.clear()


def test_cluster_conf_sizing():
    from iceberg_cache_spark.session import cluster_conf

    conf = cluster_conf(data_tb=100, executors=1000, cores_per_executor=8)
    parts = int(conf["spark.sql.shuffle.partitions"])
    assert 16_000 <= parts <= 200_000  # ≥ 2x cores, bounded
    assert conf["spark.sql.adaptive.enabled"] == "true"
    small = cluster_conf(data_tb=0.1, executors=4, cores_per_executor=4)
    assert int(small["spark.sql.shuffle.partitions"]) >= 32


def test_point_lookup_with_bloom_skip(spark, sf_dir, engine):
    import os as _os

    engine.register_parquet("customer", _os.path.join(sf_dir, "customer.parquet"))
    engine.attach_bloom("customer", "c_custkey", num_bits=1 << 16)
    present = engine.point_lookup("customer", "c_custkey", 1)
    assert present.count() == 1
    absent = engine.point_lookup("customer", "c_custkey", 10**12)
    # bloom proved absence: optimizer folds limit(0) to an empty local
    # relation — no parquet scan in the plan at all
    plan = absent._jdf.queryExecution().executedPlan().toString()
    assert absent.count() == 0 and "Scan parquet" not in plan
    engine.cache.clear()


def test_reference_golden_sql(spark, engine):
    """The reference's one end-to-end SQL assertion, verbatim semantics:
    a 2-column table registered as a view, `SELECT id, value FROM
    test_table WHERE id > 1` returns exactly [(2,'b'), (3,'c')]
    (ref src/tests/test_sql_query_engine.py:18-33)."""
    engine.register_loader(
        "test_table",
        lambda: spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "value"]),
    )
    rows = engine.sql("SELECT id, value FROM test_table WHERE id > 1").collect()
    assert sorted((r.id, r.value) for r in rows) == [(2, "b"), (3, "c")]
    engine.cache.clear()


def test_event_driven_invalidation(spark, tmp_path, engine):
    catalog = SnapshotParquetCatalog(spark, str(tmp_path / "wh2"))
    catalog.write_snapshot("t2", spark.range(0, 5))
    engine.register_catalog_table(catalog, "t2")
    engine.watch_catalog(catalog, "t2")
    engine.table("t2").count()
    assert len(engine.cache.keys()) == 1
    catalog.write_snapshot("t2", spark.range(0, 9))  # commit fires listener
    assert engine.cache.keys() == []  # entries dropped eagerly
    assert engine.table("t2").count() == 9
    engine.cache.clear()


def test_sql_unknown_table_clean_error(spark, engine):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        engine.sql("SELECT * FROM definitely_not_a_table").collect()


def test_table_without_loader_raises_keyerror(engine):
    with pytest.raises(KeyError):
        engine.table("unregistered")
