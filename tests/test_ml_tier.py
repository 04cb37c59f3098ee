"""ML curation tier: planted-fixture tests that pin the semantics the
rows-only driver check can't (q126 cluster-balanced sampling, q127
quality classifier)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_cache_spark.operators.ml import (
    cluster_balanced_sample,
    kmeans_clusters,
    quality_classifier_scores,
)


def _blob_df(spark):
    # two well-separated 4-d blobs: ids 0-19 near (0,0,0,0), ids 20-39
    # near (10,10,10,10) with small deterministic jitter
    rows = []
    for i in range(20):
        j = (i % 5) * 0.01
        rows.append((i, [0.0 + j, 0.1, 0.0, 0.1 + j]))
    for i in range(20, 40):
        j = (i % 5) * 0.01
        rows.append((i, [10.0 + j, 10.1, 10.0, 10.1 + j]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_recovers_planted_blobs(spark):
    got = kmeans_clusters(_blob_df(spark), k=2, seed=7).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    assert len(by_cluster) == 2
    assert set(range(20)) in by_cluster.values()
    assert set(range(20, 40)) in by_cluster.values()


def test_cluster_balanced_sample_caps_and_determinism(spark):
    df = _blob_df(spark)
    got = cluster_balanced_sample(df, k=2, per_cluster=3, seed=7)
    rows = got.collect()
    # cap respected per cluster, min-id representatives kept
    per = {}
    for r in rows:
        per.setdefault(r.cluster, []).append(r.vec_id)
    assert all(len(v) == 3 for v in per.values())
    assert sorted(v for vs in per.values() for v in vs) == [0, 1, 2, 20, 21, 22]
    # deterministic across re-runs
    again = cluster_balanced_sample(df, k=2, per_cluster=3, seed=7).collect()
    assert sorted((r.vec_id, r.cluster) for r in rows) == sorted(
        (r.vec_id, r.cluster) for r in again
    )


def test_quality_classifier_recovers_rule(spark, sf_dir):
    from iceberg_cache_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents")
    scored = quality_classifier_scores(d)
    rows = scored.collect()
    assert len(rows) == d.count()
    # probabilities are valid and the model separates the classes:
    # mean P(pass) among rule-passing docs exceeds mean among failing
    for r in rows:
        assert 0.0 <= r.quality_prob <= 1.0
    passed = [r.quality_prob for r in rows if r.rule_pass == 1]
    failed = [r.quality_prob for r in rows if r.rule_pass == 0]
    if passed and failed:
        assert sum(passed) / len(passed) > sum(failed) / len(failed)


def test_cluster_assignment_covers_all_rows(spark, sf_dir):
    from iceberg_cache_spark.sources.testdata import load_table

    e = load_table(spark, sf_dir, "embeddings")
    got = kmeans_clusters(e, k=4, seed=42)
    assert got.count() == e.count()
    assert got.select("cluster").distinct().count() <= 4


def test_quality_classifier_fit_cap_still_separates(spark, sf_dir):
    # fit-small/apply-big: cap the fit at half the corpus — every row is
    # still scored and the learned rule still separates pass from fail
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    scored = quality_classifier_scores(d, fit_cap_rows=max(10, n // 2))
    rows = scored.collect()
    assert len(rows) == n  # apply-big: every doc scored
    import statistics

    p_pass = [r.quality_prob for r in rows if r.rule_pass == 1]
    p_fail = [r.quality_prob for r in rows if r.rule_pass == 0]
    assert p_pass and p_fail
    assert statistics.mean(p_pass) > statistics.mean(p_fail) + 0.2
