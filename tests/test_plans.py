"""Plan-quality guards: the physical plans we rely on at 100 TB. These
fail if a code change silently degrades pushdown, pruning, or join
strategy (e.g. losing a broadcast to a cartesian)."""

from __future__ import annotations

import pytest

from iceberg_cache_spark.plans import QUERIES


def physical(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_multiway_join_broadcasts_all_dims(spark, sf_dir):
    plan = physical(spark, sf_dir, "q17_multiway_join_agg")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_filter_query_prunes_columns(spark, sf_dir):
    plan = physical(spark, sf_dir, "q02_filter")
    # scan must not read unreferenced columns
    assert "l_tax" not in plan and "l_extendedprice" not in plan
    assert "l_quantity" in plan  # filter column does reach the scan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = physical(spark, sf_dir, "q40_order_limit")
    assert "TakeOrderedAndProject" in plan  # no full global sort for LIMIT


def test_theta_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = physical(spark, sf_dir, "q16_theta_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = physical(spark, sf_dir, "q13_semi_join")
    assert "LeftSemi" in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Co-bucketed tables join without an Exchange (the bucketing scale
    path from SURVEY/README); the unbucketed same join shuffles both
    sides."""
    import os as _os

    from iceberg_cache_spark.sources.catalog import write_bucketed_table
    from iceberg_cache_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed_table(orders, "orders_b", "o_custkey", 8, "o_custkey")
    write_bucketed_table(customer, "cust_b", "c_custkey", 8, "c_custkey")
    try:
        bo, bc = spark.table("orders_b"), spark.table("cust_b")
        joined = bo.join(
            bc.hint("merge"), bo.o_custkey == bc.c_custkey
        ).select("o_orderkey", "c_name")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert joined.count() == orders.count()  # and it's still correct
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_contamination_check_broadcasts_benchmark(spark, sf_dir):
    """q109's benchmark gram set must broadcast — the training-side scan
    never shuffles on the gram key (the 100 TB-safe shape)."""
    plan = physical(spark, sf_dir, "q109_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_is_scan_local(spark, sf_dir):
    """q107 is a pure filter: no Exchange before the output sort."""
    plan = physical(spark, sf_dir, "q107_stratified_sample")
    # exactly the one rangepartitioning exchange the ORDER BY demands
    assert plan.count("Exchange") == 1


def test_sequence_packing_single_shuffle_key(spark, sf_dir):
    """q114: the cumsum window and the bin aggregate share the lang key;
    no second full shuffle of the data between them."""
    plan = physical(spark, sf_dir, "q114_sequence_packing")
    assert "Window" in plan and "CartesianProduct" not in plan


def test_keep_best_quality_no_global_sort_before_filter(spark, sf_dir):
    """q113 is top-1-per-group: partitioned window, not a global sort."""
    plan = physical(spark, sf_dir, "q113_keep_best_quality")
    assert "Window" in plan


def test_tpch_q7_broadcasts_nation_dims(spark, sf_dir):
    plan = physical(spark, sf_dir, "q120_tpch_q7")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_tpch_q8_pushes_region_filter_and_broadcasts(spark, sf_dir):
    plan = physical(spark, sf_dir, "q121_tpch_q8")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    # the ASIA filter must reach the region scan, not sit above a join
    assert "r_name" in plan


def test_tpch_q10_pushes_date_window_to_scan(spark, sf_dir):
    plan = physical(spark, sf_dir, "q122_tpch_q10")
    # both date bounds and the returnflag filter appear as pushed filters
    assert "PushedFilters" in plan
    assert "TakeOrderedAndProject" in plan  # LIMIT 20, no global sort
    assert "CartesianProduct" not in plan


def test_small_qty_rewrite_has_no_subquery(spark, sf_dir):
    # the correlated AVG is expressed as aggregate + join: no per-row
    # scalar subquery node survives in the physical plan
    plan = physical(spark, sf_dir, "q125_small_qty_revenue")
    assert "Subquery" not in plan
    assert "CartesianProduct" not in plan


def test_domain_reweight_broadcasts_rates(spark, sf_dir):
    plan = physical(spark, sf_dir, "q119_domain_reweight")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_interval_join_is_not_cartesian(spark, sf_dir):
    # equi-key + range predicate: must plan as a hash join with the
    # range as a post-filter, never a cartesian / nested-loop over all
    # pairs
    plan = physical(spark, sf_dir, "q128_stream_interval_join")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_tpch_q2_correlated_min_is_window_not_subquery(spark, sf_dir):
    # the correlated MIN(s_acctbal) runs as one window over p_partkey —
    # no per-row scalar subquery, no cartesian
    plan = physical(spark, sf_dir, "q132_tpch_q2")
    assert "Window" in plan
    assert "Subquery" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q4_exists_is_semi_join(spark, sf_dir):
    plan = physical(spark, sf_dir, "q133_tpch_q4")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q6_pushes_every_predicate(spark, sf_dir):
    # pure scan+agg: date bounds, discount range, quantity all reach
    # the parquet scan; no join, no exchange beyond the 1-row combine
    plan = physical(spark, sf_dir, "q134_tpch_q6")
    assert "PushedFilters" in plan
    assert "Join" not in plan


def test_tpch_q16_not_in_is_anti_join(spark, sf_dir):
    plan = physical(spark, sf_dir, "q139_tpch_q16")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_semi_anti_pair(spark, sf_dir):
    # EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, all hash joins on the
    # order key (supplier inequality is a residual, not a loop)
    plan = physical(spark, sf_dir, "q143_tpch_q21")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q22_threshold_broadcasts(spark, sf_dir):
    # the 1-row threshold aggregate broadcasts; the NOT EXISTS is a
    # LeftAnti with the date filter pushed to the orders scan
    plan = physical(spark, sf_dir, "q144_tpch_q22")
    assert "BroadcastExchange" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


# -- expensive-tier regression guards (round-3 verdict item 4) -----------
#
# The round-3 wins being pinned: posting lists / signature tables /
# edge lists are materialized ONCE (localCheckpoint) — the final plan
# re-SCANS the checkpointed table (ExistingRDD) but never re-SCANS the
# parquet corpus. If someone drops a checkpoint, "Scan parquet" nodes
# reappear in the final plan and these fail. Exchange counts are upper
# bounds on the audited-good shapes so added shuffles can't slip in.


@pytest.mark.parametrize(
    "name,max_exchanges,max_parquet_scans",
    [
        ("q74_ppjoin_jaccard", 20, 0),
        ("q62_minhash_near_dup", 7, 0),
        ("q63_simhash_near_dup", 8, 0),  # +2 exchanges: hot-bucket cap semi-join
        ("q64_ngram_jaccard", 17, 0),
        ("q116_dedup_clusters", 3, 0),
        ("q73_ivf_cosine_topk", 5, 2),
        ("q127_quality_classifier", 5, 1),
        ("q149_incremental_dedup", 23, 3),  # exact-fp probe scans + checkpointed grams
        ("q148_dedup_clusters_star", 5, 0),
    ],
)
def test_expensive_tier_plan_shape(spark, sf_dir, name, max_exchanges, max_parquet_scans):
    plan = physical(spark, sf_dir, name)
    n_exchange = plan.count("Exchange")
    n_scan = plan.count("Scan parquet")
    assert n_exchange <= max_exchanges, (
        f"{name}: {n_exchange} Exchanges (audited-good bound {max_exchanges}) "
        "— a new shuffle crept into the expensive tier"
    )
    assert n_scan <= max_parquet_scans, (
        f"{name}: {n_scan} parquet scans in the final plan "
        f"(bound {max_parquet_scans}) — materialize-once regressed "
        "(checkpoint dropped => corpus re-scanned per consumer)"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name,max_hash_exchanges",
    [
        ("q152_sessionization", 1),  # both windows + groupBy share user_id
        ("q156_session_funnel", 1),  # session windows reuse user_id clustering
    ],
)
def test_event_window_single_shuffle(spark, sf_dir, name, max_hash_exchanges):
    """The event-window tier must keep ONE hash shuffle (user_id): the
    lag/running-sum windows and the session aggregate all share the
    key, and the rolling frame must never become a time self-join."""
    plan = physical(spark, sf_dir, name)
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= max_hash_exchanges, (
        f"{name}: {n_hash} hash Exchanges (bound {max_hash_exchanges}) — "
        "the shared user_id partitioning regressed"
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, (
        f"{name}: a join appeared in a pure window plan — rolling metric "
        "rewritten as a self-join?"
    )


def test_rolling_window_prefix_sum_shape(spark, sf_dir):
    """q153's audited-good shape (round-5 scale-probe fix): prefix
    cumulative windows over a real+probe union with one join-back on
    the event id. Two regressions to catch: (a) a BOUNDED sliding
    RANGE frame reappearing — Spark evaluates those O(n x frame_width)
    per partition, the quadratic the probe caught at x24 per x10 rows
    on bursty data; (b) shuffle creep beyond the audited
    window-shuffle + join-back (<=4 hash exchanges; the fixture plan
    broadcasts the probe side)."""
    plan = physical(spark, sf_dir, "q153_rolling_window")
    assert "RangeFrame, -" not in plan, (
        "a bounded sliding RANGE frame reappeared in q153 — that "
        "formulation is O(n x frame_width) per partition (no retraction)"
    )
    assert plan.count("Exchange hashpartitioning") <= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name,max_exchanges,max_scans",
    [
        # pack tier: the two-level prefix sum costs 4 hash exchanges
        # (doc agg, bucket agg, two window sorts) + the broadcast of
        # the narrow bucket offsets; 2 corpus scans (recompute of the
        # per-doc counts for the bucket subtotals — documented choice)
        ("q179_sequence_packing", 8, 2),
        ("q184_pack_manifest", 8, 2),
        ("q187_pack_stats", 10, 2),
        # decontam tier (r12 shape): the benchmark span set is built
        # ONCE per session, persisted via the engine CacheManager, and
        # served to the guard count + probe join from the same blocks
        # (_guarded_bench_spans) — the plan STRING therefore embeds
        # the cached build subtree under InMemoryRelation, whose
        # Exchanges/scans execute only on the first consumer; the
        # bounds below are the audited post-r12 string counts. The
        # InMemoryTableScan assertion is the keystone: losing it means
        # the bench side re-derives per consumer again (VERDICT r11 #3)
        ("q180_benchmark_decontam", 12, 5),
        ("q185_decontam_rewrite", 8, 4),
        ("q186_decontam_accounting", 7, 3),
    ],
)
def test_pack_decontam_tier_plan_shape(spark, sf_dir, name, max_exchanges, max_scans):
    """Round-11 tier guards (audited shapes): the packing prefix sum
    and the decontamination span probe must keep their broadcast +
    bounded-exchange plans — a lost broadcast here becomes a corpus
    shuffle at 100 TB."""
    plan = physical(spark, sf_dir, name)
    assert plan.count("Exchange") <= max_exchanges, (
        f"{name}: {plan.count('Exchange')} Exchanges "
        f"(audited-good bound {max_exchanges})"
    )
    assert plan.count("Scan parquet") <= max_scans
    assert plan.count("BroadcastHashJoin") >= 1  # the tier's keystone
    if name.startswith(("q180", "q185", "q186")):
        assert "InMemoryTableScan" in plan  # persisted bench side (r12)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
