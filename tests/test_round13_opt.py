"""Optimization-round-13 guards: the star-CC local finish.

``connected_components_star`` now leaves Spark once the edge set fits
the driver budget (``spark.iceberg_cache.cc.localFinishEdges``): at
entry when the deduped input is already small, or mid-loop as soon as
a round's fingerprint count drops under the threshold. These tests pin
the contract that every path — entry-local, mid-loop-local, and pure
distributed (threshold 0) — yields IDENTICAL labels, on random graphs
and on the adversarial shapes (chains, stars, singletons-after-dedup).
"""

from __future__ import annotations

import random

import pytest

from iceberg_cache_spark.operators import dedup as D
from iceberg_cache_spark.operators.dedup import (
    CC_LOCAL_FINISH_CONF,
    connected_components,
    connected_components_star,
)


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def _labels(df) -> dict:
    return {r.id: r.cid for r in df.collect()}


@pytest.fixture
def distributed_only(spark):
    """Force the pure distributed star loop (the pre-r13 behavior)."""
    spark.conf.set(CC_LOCAL_FINISH_CONF, "0")
    yield
    spark.conf.unset(CC_LOCAL_FINISH_CONF)


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_nodes) * 7, rng.randrange(n_nodes) * 7)
        for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_local_finish_matches_distributed_random(spark, seed):
    edges = [e for e in _random_edges(seed, 60, 90) if e[0] != e[1]]
    pairs = _pairs_df(spark, edges)
    local = _labels(connected_components_star(pairs))  # entry-local path
    spark.conf.set(CC_LOCAL_FINISH_CONF, "0")
    try:
        dist = _labels(connected_components_star(pairs))
    finally:
        spark.conf.unset(CC_LOCAL_FINISH_CONF)
    assert local == dist
    # and both equal the independent min-label algorithm
    assert local == _labels(connected_components(pairs, max_iter=60))


def test_midloop_local_finish_matches(spark):
    """A chain graph contracts round by round; a threshold BELOW the
    input edge count but above a later round's forces the mid-loop
    local-finish branch specifically."""
    chain = [(i, i + 1) for i in range(40)]
    extra = [(100 + i, 100 + ((i + 1) % 5)) for i in range(5)]
    pairs = _pairs_df(spark, chain + extra)
    n_in = len(set(map(tuple, map(sorted, chain + extra))))
    # threshold between 1 and the deduped input size -> entry check
    # fails, and the first round's (still >=1 edge per non-root node)
    # count triggers the mid-loop branch once contraction shrinks it.
    spark.conf.set(CC_LOCAL_FINISH_CONF, str(n_in - 1))
    try:
        mid = _labels(connected_components_star(pairs))
        spark.conf.set(CC_LOCAL_FINISH_CONF, "0")
        dist = _labels(connected_components_star(pairs))
    finally:
        spark.conf.unset(CC_LOCAL_FINISH_CONF)
    assert mid == dist
    assert mid == _labels(connected_components(pairs, max_iter=60))
    # every chain node labeled with the chain minimum
    assert all(mid[i] == 0 for i in range(41))
    assert all(mid[100 + i] == 100 for i in range(5))


def test_local_finish_empty_and_selfloops(spark):
    pairs = _pairs_df(spark, [(5, 5), (9, 9)])
    assert connected_components_star(pairs).count() == 0


# --- embedding near-dup: arrow kernel vs fold reference ---------------------


def test_embedding_near_dup_arrow_matches_fold(spark):
    """The round-13 per-bucket matmul candidate kernel must emit the
    exact pair set and sims of the join+fold reference — including
    NULL-id rows, NULL vectors, and a planted near-pair."""
    import random

    from pyspark.sql import functions as F

    from iceberg_cache_spark.operators import similarity as S

    rng = random.Random(7)
    rows = []
    for i in range(80):
        rows.append((i, [rng.gauss(0.0, 1.0) for _ in range(8)]))
    # planted near-dups: tiny perturbation of rows 0..9
    for i in range(10):
        rows.append((1000 + i, [x + 0.01 for x in rows[i][1]]))
    # NULL id: must never pair. (A NULL *vector* is outside the arrow
    # path's pre-existing contract — with_lsh_bucket(impl="arrow")
    # raises on it by design; fold handles it — so it is not planted.)
    rows.append((None, [1.0] * 8))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    fold = {
        (r.id_a, r.id_b, r.sim)
        for r in S.embedding_near_dup_pairs(
            df, threshold=0.9, dim=8, n_planes=3, impl="fold"
        ).collect()
    }
    arrow = {
        (r.id_a, r.id_b, r.sim)
        for r in S.embedding_near_dup_pairs(
            df, threshold=0.9, dim=8, n_planes=3, impl="arrow"
        ).collect()
    }
    assert arrow == fold
    assert len(arrow) >= 10  # every planted pair recovered
