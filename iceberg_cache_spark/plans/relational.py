"""Relational operator corpus (SURVEY.md §2.2: Q01–Q59 families, plus
grouping sets / percentiles / window frames / pivot / set-op variants).

Each query exists twice: a Spark-first DataFrame plan (what this engine
runs — Catalyst picks the physical strategy) and a DuckDB oracle SQL
string (what the driver hash-matches against at sf0.01).

The reference exposes this entire surface through one DataFusion call
site (ref ``src/sql/engine.py:70``); here every operator is expressed
declaratively so predicate pushdown / column pruning / join selection /
AQE apply unchanged at 100 TB.

Determinism notes (why the DECIMAL casts): double SUM/AVG is
order-dependent; both engines are forced through exact DECIMAL(25,6)
accumulation of a row-level double expression, which is bit-reproducible
under any partitioning/parallelism — on a 1000-executor cluster just as
on DuckDB's single thread. Cheap: decimal agg is still JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_cache_spark.plans.registry import declared
from iceberg_cache_spark.sources.testdata import load_table as T

DEC = "decimal(25,6)"


def _dsum(col: F.Column) -> F.Column:
    """Exact (order-independent) sum of a double expression."""
    return F.sum(col.cast(DEC))


def _money(col: F.Column, scale: int = 2) -> F.Column:
    """ROUND(exact_decimal, scale) → DOUBLE, identical in both engines."""
    return F.round(col, scale).cast("double")


# ---------------------------------------------------------------------------
# Projection / filter / scalar  (Q01–Q06)
# ---------------------------------------------------------------------------


@declared(
    "q01_projection",
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")


@declared(
    "q02_filter",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_quantity > 45 AND l_returnflag = 'R'
       ORDER BY l_orderkey, l_linenumber""",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@declared(
    "q03_between_like",
    """SELECT p_partkey FROM part
       WHERE p_size BETWEEN 10 AND 20 AND p_brand LIKE 'Brand%'
         AND p_type IS NOT NULL
       ORDER BY p_partkey""",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "part")
        .filter(
            F.col("p_size").between(10, 20)
            & F.col("p_brand").like("Brand%")
            & F.col("p_type").isNotNull()
        )
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@declared(
    "q04_case_when",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 200000 THEN 'big'
                   WHEN o_totalprice > 50000 THEN 'mid'
                   ELSE 'small' END AS bucket
       FROM orders ORDER BY o_orderkey""",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "big")
            .when(F.col("o_totalprice") > 50000, "mid")
            .otherwise("small")
            .alias("bucket"),
        )
        .orderBy("o_orderkey")
    )


@declared(
    "q05_cast_coalesce",
    """SELECT c_custkey,
              COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
              CAST(FLOOR(c_acctbal) AS BIGINT) AS bal
       FROM customer ORDER BY c_custkey""",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    # FLOOR before the integer cast: Spark's double->bigint cast truncates
    # while DuckDB's rounds — FLOOR pins both to the same value.
    return (
        T(spark, sf, "customer")
        .select(
            "c_custkey",
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
            ).alias("seg"),
            F.floor("c_acctbal").cast("bigint").alias("bal"),
        )
        .orderBy("c_custkey")
    )


@declared(
    "q06_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
       ORDER BY l_returnflag, l_linestatus""",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Joins  (Q10–Q18)
# ---------------------------------------------------------------------------


@declared(
    "q10_inner_join",
    """SELECT c.c_custkey, n.n_name FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       ORDER BY c.c_custkey""",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c, n = T(spark, sf, "customer"), T(spark, sf, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .select("c_custkey", "n_name")
        .orderBy("c_custkey")
    )


@declared(
    "q11_left_join",
    """SELECT o.o_orderkey, c.c_name FROM orders o
       LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY o.o_orderkey""",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@declared(
    "q12_full_join",
    """SELECT o.o_orderkey, c.c_name FROM orders o
       FULL JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY o.o_orderkey NULLS FIRST, c.c_name NULLS FIRST""",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "full")
        .select("o_orderkey", "c_name")
        .orderBy(F.col("o_orderkey").asc_nulls_first(), F.col("c_name").asc_nulls_first())
    )


@declared(
    "q13_semi_join",
    """SELECT s_suppkey FROM supplier s
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
       ORDER BY s_suppkey""",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    s, li = T(spark, sf, "supplier"), T(spark, sf, "lineitem")
    big = li.filter(F.col("l_quantity") > 49)
    return (
        s.join(big, s.s_suppkey == big.l_suppkey, "left_semi")
        .select("s_suppkey")
        .orderBy("s_suppkey")
    )


@declared(
    "q14_anti_join",
    """SELECT s_suppkey FROM supplier s
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
       ORDER BY s_suppkey""",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    s, li = T(spark, sf, "supplier"), T(spark, sf, "lineitem")
    big = li.filter(F.col("l_quantity") > 49)
    return (
        s.join(big, s.s_suppkey == big.l_suppkey, "left_anti")
        .select("s_suppkey")
        .orderBy("s_suppkey")
    )


@declared(
    "q15_cross_join",
    """SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
       ORDER BY r.r_name, n.n_name""",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    r, n = T(spark, sf, "region"), T(spark, sf, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@declared(
    "q16_theta_join",
    """SELECT p.p_partkey, s.s_suppkey FROM part p
       JOIN supplier s ON p.p_size < s.s_suppkey
       ORDER BY p.p_partkey, s.s_suppkey""",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    p, s = T(spark, sf, "part"), T(spark, sf, "supplier")
    # Band theta join, output-bound (~|p|x|s|/2 rows). Round 13: the
    # old BroadcastNestedLoopJoin fed the full pair stream through a
    # global ORDER BY — one range exchange + sort of the OUTPUT. The
    # join collapses to exploding each part row's match array — the
    # tail of the sorted supplier-key array above p_size (exact
    # multiplicity: collect_list keeps duplicate keys and drops NULLs,
    # matching the join's NULL-rejecting predicate) — and the total
    # order is produced WITHOUT moving the output: range-partition the
    # 20k-row part side by p_partkey BEFORE the fan-out, so the
    # exchange carries |p| rows instead of the |p|x|s|/2-row result.
    #
    # Round 14, two residual costs deleted with the same output:
    # (a) the interpreted higher-order filter(sorted_keys, k > p_size)
    #     ran per PART ROW (~20M lambda evaluations — Catalyst HOFs
    #     are interpreted per element, the round-13 q72 lesson); the
    #     match array is a function of p_size ALONE, whose domain is
    #     tiny (TPC-H p_size is 1..50), so it is now computed once per
    #     DISTINCT p_size and broadcast-joined back — the fan-out rows
    #     never touch a lambda.
    # (b) sortWithinPartitions ran AFTER the explode, sorting the
    #     ~19.5M-row output; the sort now runs on the ~20k part rows
    #     BEFORE the fan-out. Order is preserved by construction: a
    #     BroadcastHashJoin streams its probe side and Generate emits
    #     array elements in order, so ordered part rows × ascending
    #     match arrays = the same (p_partkey, s_suppkey) total order
    #     (asserted row-for-row against the round-13 formulation in
    #     tests/test_round14_opt.py; NULL p_size rows drop on the
    #     inner size join exactly as their empty match array did).
    keys = s.agg(F.sort_array(F.collect_list("s_suppkey")).alias("_ks"))
    sizes = (
        p.select("p_size")
        .distinct()
        .crossJoin(F.broadcast(keys))
        .select(
            "p_size",
            F.filter(F.col("_ks"), lambda k: k > F.col("p_size")).alias("_match"),
        )
    )
    return (
        p.repartitionByRange("p_partkey")
        .join(F.broadcast(sizes), "p_size")
        .sortWithinPartitions("p_partkey")
        .select("p_partkey", F.explode("_match").alias("s_suppkey"))
    )


@declared(
    "q17_multiway_join_agg",
    """SELECT n.n_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(25,6))), 2) AS DOUBLE) AS rev
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name ORDER BY rev DESC, n.n_name""",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    n = T(spark, sf, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_money(_dsum(rev)).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("n_name"))
    )


@declared(
    "q18_broadcast_join",
    """SELECT c.c_custkey, n.n_name FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       ORDER BY c.c_custkey""",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    # Same semantics as q10 with an explicit broadcast hint on the dim —
    # the pattern every fact×dim join at 100 TB should use.
    c, n = T(spark, sf, "customer"), T(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .select("c_custkey", "n_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Aggregation  (Q20–Q26)
# ---------------------------------------------------------------------------


@declared(
    "q20_groupby_agg",
    """SELECT l_returnflag, l_linestatus,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_qty,
              ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
                    / COUNT(l_extendedprice), 4) AS avg_price,
              MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            _money(_dsum(F.col("l_quantity"))).alias("sum_qty"),
            F.round(
                _dsum(F.col("l_extendedprice")).cast("double")
                / F.count("l_extendedprice"),
                4,
            ).alias("avg_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@declared(
    "q21_count_distinct",
    """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS u
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("u"))
        .orderBy("o_orderpriority")
    )


@declared(
    "q22_having",
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders
       GROUP BY o_custkey HAVING COUNT(*) > 15 ORDER BY o_custkey""",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 15)
        .orderBy("o_custkey")
    )


@declared(
    "q23_rollup",
    """SELECT n_regionkey, n_name, CAST(COUNT(*) AS BIGINT) AS n FROM nation
       GROUP BY ROLLUP(n_regionkey, n_name)
       HAVING COUNT(*) > 0
       ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST""",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    """The oracle's HAVING COUNT(*) > 0 is an empty-input dialect
    alignment (no-op on any non-empty input): standard SQL emits the
    () grouping set's grand-total row even over zero input rows, but
    Spark's Expand-based ROLLUP/CUBE/GROUPING SETS generates rows FROM
    input rows, so an empty scan yields an empty result — caught by
    the r6 empty-input gate (tools/verify_empty.py). Same note applies
    to q24/q28."""
    return (
        T(spark, sf, "nation")
        .rollup("n_regionkey", "n_name")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n_regionkey").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@declared(
    "q24_cube",
    """SELECT n_regionkey, n_name, CAST(COUNT(*) AS BIGINT) AS n FROM nation
       GROUP BY CUBE(n_regionkey, n_name)
       HAVING COUNT(*) > 0
       ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST""",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "nation")
        .cube("n_regionkey", "n_name")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n_regionkey").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@declared(
    "q25_scalar_agg",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
       FROM lineitem""",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").agg(
        F.count("*").alias("n"),
        _money(_dsum(F.col("l_extendedprice"))).alias("total"),
    )


@declared(
    "q26_stddev_var",
    """SELECT l_returnflag,
              ROUND((s2 - s1*s1/n)/(n-1), 4) AS var_qty,
              ROUND(SQRT((s2 - s1*s1/n)/(n-1)), 4) AS sd_qty
       FROM (SELECT l_returnflag,
                    COUNT(l_quantity) AS n,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1,
                    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s2
             FROM lineitem GROUP BY l_returnflag) g
       ORDER BY l_returnflag""",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    # var/stddev recomputed from exact decimal sums so both engines agree
    # bit-for-bit (native STDDEV_SAMP is summation-order dependent).
    li = T(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        _dsum(F.col("l_quantity")).cast("double").alias("s1"),
        _dsum(F.col("l_quantity") * F.col("l_quantity")).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return g.select(
        "l_returnflag",
        F.round(var, 4).alias("var_qty"),
        F.round(F.sqrt(var), 4).alias("sd_qty"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Window functions  (Q30–Q34)
# ---------------------------------------------------------------------------


@declared(
    "q30_row_number",
    """SELECT o_custkey, o_orderkey,
              CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate NULLS LAST, o_orderkey) AS BIGINT) AS rn
       FROM orders ORDER BY o_custkey, rn""",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    # explicit NULLS LAST on the nullable sort key: Spark ASC defaults
    # NULLS FIRST, DuckDB NULLS LAST — divergent row numbering on
    # NULL-bearing data (caught by the r6 NULL-robustness gate)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey"
    )
    return (
        T(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


@declared(
    "q31_lag_lead",
    """SELECT event_id,
              LAG(value) OVER (PARTITION BY user_id
                               ORDER BY ts NULLS LAST, event_id) AS prev,
              LEAD(value) OVER (PARTITION BY user_id
                                ORDER BY ts NULLS LAST, event_id) AS nxt
       FROM events ORDER BY event_id""",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    # NULLS LAST both sides: lag/lead depend on row order and the
    # engines' ASC NULL defaults differ (r7 NULL gate, ts now masked)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    return (
        T(spark, sf, "events")
        .select(
            "event_id",
            F.lag("value").over(w).alias("prev"),
            F.lead("value").over(w).alias("nxt"),
        )
        .orderBy("event_id")
    )


@declared(
    "q32_window_frame",
    """SELECT o_orderkey,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate NULLS LAST, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS DOUBLE) AS running
       FROM orders ORDER BY o_orderkey""",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    # NULLS LAST both sides: running sums depend on row order, and the
    # engines' ASC NULL defaults differ (r6 NULL gate)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        T(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
            .cast("double")
            .alias("running"),
        )
        .orderBy("o_orderkey")
    )


@declared(
    "q33_ntile",
    """SELECT c_custkey,
              CAST(NTILE(4) OVER (ORDER BY c_acctbal NULLS LAST, c_custkey)
                   AS BIGINT) AS q
       FROM customer ORDER BY c_custkey""",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    w = W.orderBy(F.col("c_acctbal").asc_nulls_last(), "c_custkey")
    return (
        T(spark, sf, "customer")
        .select("c_custkey", F.ntile(4).over(w).cast("bigint").alias("q"))
        .orderBy("c_custkey")
    )


@declared(
    "q34_topk_per_group",
    """SELECT l_orderkey, l_linenumber, r FROM (
         SELECT l_orderkey, l_linenumber,
                CAST(RANK() OVER (PARTITION BY l_orderkey
                     ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT) AS r
         FROM lineitem) t
       WHERE r <= 2 ORDER BY l_orderkey, l_linenumber""",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        T(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.rank().over(w).cast("bigint").alias("r"),
        )
        .filter(F.col("r") <= 2)
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops / subqueries  (Q40–Q48)
# ---------------------------------------------------------------------------


@declared(
    "q40_order_limit",
    """SELECT c_custkey FROM customer
       ORDER BY c_acctbal DESC, c_custkey LIMIT 50""",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    # Global top-k: Catalyst plans TakeOrderedAndProject (no full sort).
    return (
        T(spark, sf, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .select("c_custkey")
        .limit(50)
    )


@declared(
    "q41_offset",
    "SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 10",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "customer").select("c_custkey").orderBy("c_custkey").offset(10).limit(20)


@declared(
    "q42_union_all",
    """SELECT n_name AS name FROM nation
       UNION ALL SELECT r_name FROM region ORDER BY name""",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation").select(F.col("n_name").alias("name"))
    r = T(spark, sf, "region").select(F.col("r_name").alias("name"))
    return n.unionAll(r).orderBy("name")


@declared(
    "q43_union_distinct",
    """SELECT n_name AS name FROM nation
       UNION SELECT r_name FROM region ORDER BY name""",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation").select(F.col("n_name").alias("name"))
    r = T(spark, sf, "region").select(F.col("r_name").alias("name"))
    return n.union(r).distinct().orderBy("name")


@declared(
    "q44_intersect",
    """SELECT o_custkey FROM orders INTERSECT
       SELECT c_custkey FROM customer ORDER BY o_custkey""",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select("o_custkey")
    c = T(spark, sf, "customer").select("c_custkey")
    return o.intersect(c).orderBy("o_custkey")


@declared(
    "q45_except",
    """SELECT c_custkey FROM customer EXCEPT
       SELECT o_custkey FROM orders ORDER BY c_custkey""",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select("c_custkey")
    o = T(spark, sf, "orders").select("o_custkey")
    return c.subtract(o).orderBy("c_custkey")


@declared(
    "q46_scalar_subquery",
    """SELECT c_custkey FROM customer
       WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                                 / COUNT(c_acctbal) FROM customer)
       ORDER BY c_custkey""",
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    # Scalar subquery as a 1-row broadcast cross join — no driver collect,
    # and the exact-decimal average matches DuckDB's bit-for-bit.
    avg_df = c.agg(
        (_dsum(F.col("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@declared(
    "q47_in_subquery",
    """SELECT o_orderkey FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer
                           WHERE c_mktsegment = 'BUILDING')
       ORDER BY o_orderkey""",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@declared(
    "q48_cte",
    """WITH big AS (SELECT o_custkey,
                           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6))), 2)
                                AS DOUBLE) AS tot
                    FROM orders GROUP BY o_custkey)
       SELECT c.c_name, b.tot FROM big b
       JOIN customer c ON b.o_custkey = c.c_custkey
       ORDER BY c.c_name""",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    big = o.groupBy("o_custkey").agg(_money(_dsum(F.col("o_totalprice"))).alias("tot"))
    return (
        big.join(c, big.o_custkey == c.c_custkey)
        .select("c_name", "tot")
        .orderBy("c_name")
    )


# ---------------------------------------------------------------------------
# Scalar function families  (Q50–Q58)
# ---------------------------------------------------------------------------


@declared(
    "q50_string_funcs",
    """SELECT p_partkey, UPPER(p_brand) AS ub, SUBSTRING(p_name, 1, 5) AS pre,
              CAST(LENGTH(p_type) AS BIGINT) AS tlen,
              CONCAT_WS('-', p_brand, p_type) AS bt,
              LOWER(p_brand) AS lb, TRIM(p_name) AS tn,
              REPLACE(p_brand, 'Brand', 'B') AS rb,
              LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS pid
       FROM part ORDER BY p_partkey""",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("ub"),
        F.substring("p_name", 1, 5).alias("pre"),
        F.length("p_type").cast("bigint").alias("tlen"),
        F.concat_ws("-", "p_brand", "p_type").alias("bt"),
        F.lower("p_brand").alias("lb"),
        F.trim(F.col("p_name")).alias("tn"),
        F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("rb"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("pid"),
    ).orderBy("p_partkey")


@declared(
    "q51_regex",
    """SELECT doc_id, REGEXP_REPLACE(lang, '[aeiou]', '_', 'g') AS masked,
              REGEXP_EXTRACT(source, '([a-z]+)', 1) AS src1,
              CAST(REGEXP_MATCHES(lang, '^[a-z]{2}$') AS BOOLEAN) AS is2
       FROM documents ORDER BY doc_id""",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace("lang", "[aeiou]", "_").alias("masked"),
        F.regexp_extract("source", "([a-z]+)", 1).alias("src1"),
        F.col("lang").rlike("^[a-z]{2}$").alias("is2"),
    ).orderBy("doc_id")


@declared(
    "q52_math_funcs",
    """SELECT l_orderkey, l_linenumber,
              ABS(l_discount - 0.05) AS ad,
              CAST(FLOOR(l_quantity) AS BIGINT) AS fq,
              CAST(CEIL(l_quantity) AS BIGINT) AS cq,
              ROUND(SQRT(l_extendedprice), 4) AS sq,
              CAST(MOD(CAST(FLOOR(l_quantity) AS BIGINT), 7) AS BIGINT) AS m7,
              CAST(SIGN(l_discount - 0.05) AS BIGINT) AS sg
       FROM lineitem ORDER BY l_orderkey, l_linenumber""",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("ad"),
        F.floor("l_quantity").cast("bigint").alias("fq"),
        F.ceil("l_quantity").cast("bigint").alias("cq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        (F.floor("l_quantity").cast("bigint") % 7).cast("bigint").alias("m7"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("sg"),
    ).orderBy("l_orderkey", "l_linenumber")


@declared(
    "q53_date_funcs",
    """SELECT o_orderkey,
              CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
              CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
              CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
              CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mo
       FROM orders ORDER BY o_orderkey""",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("mo"),
    ).orderBy("o_orderkey")


@declared(
    "q54_timestamp_trunc",
    """SELECT event_id,
              CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hr
       FROM events ORDER BY event_id""",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return e.select(
        "event_id", F.date_trunc("hour", "ts").alias("hr")
    ).orderBy("event_id")


@declared(
    "q55_greatest_least",
    """SELECT s_suppkey, GREATEST(s_acctbal, 0.0) AS g, LEAST(s_acctbal, 1000.0) AS l
       FROM supplier ORDER BY s_suppkey""",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "supplier")
    return s.select(
        "s_suppkey",
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("g"),
        F.least(F.col("s_acctbal"), F.lit(1000.0)).alias("l"),
    ).orderBy("s_suppkey")


@declared(
    "q56_hash_funcs",
    "SELECT r_regionkey, MD5(r_name) AS h FROM region ORDER BY r_regionkey",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    r = T(spark, sf, "region")
    return r.select("r_regionkey", F.expr("md5(r_name)").alias("h")).orderBy(
        "r_regionkey"
    )


@declared(
    "q57_array_funcs",
    """SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS d,
              ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e0,
              CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS npos
       FROM embeddings ORDER BY vec_id""",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("d"),
        # + 0.0 normalizes IEEE negative zero: DuckDB ROUND keeps -0.0
        # where Spark produces 0.0 — the only value the addition changes
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + 0.0).alias("e0"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("npos"),
    ).orderBy("vec_id")


@declared(
    "q58_json",
    """SELECT event_id, json_extract_string(props, '$.k') AS k
       FROM events ORDER BY event_id""",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Coverage batch 2: grouping sets, frames, analytics, more scalar families
# ---------------------------------------------------------------------------

from iceberg_cache_spark.sources.testdata import register_views  # noqa: E402


@declared(
    "q28_grouping_sets",
    """SELECT n_regionkey, n_name, CAST(COUNT(*) AS BIGINT) AS n FROM nation
       GROUP BY GROUPING SETS ((n_regionkey), (n_name), ())
       HAVING COUNT(*) > 0
       ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST""",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    # GROUPING SETS has no DataFrame-API form; the SQL seam is the
    # idiomatic Spark expression (same Catalyst Expand plan as rollup).
    register_views(spark, sf)
    return spark.sql(
        """SELECT n_regionkey, n_name, CAST(COUNT(*) AS BIGINT) AS n FROM nation
           GROUP BY GROUPING SETS ((n_regionkey), (n_name), ())
           ORDER BY n_regionkey ASC NULLS FIRST, n_name ASC NULLS FIRST"""
    )


@declared(
    "q29_percentile",
    """SELECT l_returnflag,
              ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
              ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


@declared(
    "q35_range_frame",
    """SELECT o_orderkey,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                   OVER (ORDER BY o_orderkey
                         RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 2)
                   AS DOUBLE) AS win_sum
       FROM orders ORDER BY o_orderkey""",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    w = W.orderBy("o_orderkey").rangeBetween(-10, W.currentRow)
    return (
        T(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
            .cast("double")
            .alias("win_sum"),
        )
        .orderBy("o_orderkey")
    )


@declared(
    "q36_first_last_nth",
    """SELECT o_orderkey,
              FIRST_VALUE(o_orderkey) OVER w AS fv,
              LAST_VALUE(o_orderkey) OVER w AS lv,
              NTH_VALUE(o_orderkey, 2) OVER w AS nv
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate NULLS LAST, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_orderkey""",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        T(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("fv"),
            F.last("o_orderkey").over(w).alias("lv"),
            F.nth_value("o_orderkey", 2).over(w).alias("nv"),
        )
        .orderBy("o_orderkey")
    )


@declared(
    "q49_string_position",
    """SELECT p_partkey,
              CAST(instr(p_name, 'a') AS BIGINT) AS ia,
              string_split(p_type, ' ')[1] AS t1,
              repeat(p_brand, 2) AS b2,
              reverse(p_brand) AS rb
       FROM part ORDER BY p_partkey""",
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", "a").cast("bigint").alias("ia"),
        F.element_at(F.split("p_type", " "), 1).alias("t1"),
        F.repeat("p_brand", 2).alias("b2"),
        F.reverse(F.col("p_brand")).alias("rb"),
    ).orderBy("p_partkey")


@declared(
    "q59_ts_arith",
    """SELECT event_id,
              CAST(CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS TIMESTAMP) AS plus1h,
              CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT) AS unix_s,
              CAST(CAST(ts AS DATE) + 5 AS DATE) AS d5,
              CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS dd
       FROM events ORDER BY event_id""",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("plus1h"),
        F.unix_timestamp("ts").cast("bigint").alias("unix_s"),
        F.date_add(F.col("ts").cast("date"), 5).alias("d5"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("dd"),
    ).orderBy("event_id")


@declared(
    "q37_posexplode",
    """SELECT vec_id, CAST(i AS BIGINT) AS pos,
              ROUND(CAST(embedding[i+1] AS DOUBLE), 4) + 0.0 AS val
       FROM embeddings, UNNEST(range(len(embedding))) AS u(i)
       WHERE vec_id < 3 ORDER BY vec_id, pos""",
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings").filter(F.col("vec_id") < 3)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            F.col("pos").cast("bigint").alias("pos"),
            (F.round(F.col("v").cast("double"), 4) + 0.0).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


@declared(
    "q75_pivot",
    """SELECT l_returnflag,
              CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F'
                   THEN CAST(l_quantity AS DECIMAL(25,6)) END), 2) AS DOUBLE) AS qty_F,
              CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O'
                   THEN CAST(l_quantity AS DECIMAL(25,6)) END), 2) AS DOUBLE) AS qty_O
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)), 2).cast("double"))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    ).orderBy("l_returnflag")


@declared(
    "q76_values_inline",
    """SELECT v.k, v.name, r.r_name FROM
       (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS v(k, name)
       JOIN region r ON r.r_regionkey = v.k ORDER BY v.k""",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    r = T(spark, sf, "region")
    v = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two")], ["k", "name"])
    return (
        v.join(r, v.k == r.r_regionkey)
        .select("k", "name", "r_name")
        .orderBy("k")
    )


@declared(
    "q77_except_all",
    """SELECT o_custkey FROM orders EXCEPT ALL
       SELECT c_custkey FROM customer ORDER BY o_custkey""",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select("o_custkey")
    c = T(spark, sf, "customer").select("c_custkey")
    return o.exceptAll(c).orderBy("o_custkey")


@declared(
    "q78_intersect_all",
    """SELECT o_custkey FROM orders INTERSECT ALL
       SELECT c_custkey FROM customer ORDER BY o_custkey""",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select("o_custkey")
    c = T(spark, sf, "customer").select("c_custkey")
    return o.intersectAll(c).orderBy("o_custkey")


@declared(
    "q79_correlated_exists_ineq",
    """SELECT o_orderkey FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_extendedprice > o.o_totalprice * 0.5)
       ORDER BY o_orderkey""",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_extendedprice > o.o_totalprice * 0.5
    )
    return o.join(li, cond, "left_semi").select("o_orderkey").orderBy("o_orderkey")


@declared(
    "q38_struct_map",
    """SELECT r_regionkey,
              struct_pack(key := r_regionkey, name := r_name).name AS sname,
              MAP([r_name], [r_regionkey])[r_name][1] AS mval
       FROM region ORDER BY r_regionkey""",
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    """Struct construction + field access and map construction + key
    lookup — nested types round-tripped back to scalars so the output
    schema is engine-neutral."""
    r = T(spark, sf, "region")
    return r.select(
        "r_regionkey",
        F.struct(
            F.col("r_regionkey").alias("key"), F.col("r_name").alias("name")
        ).getField("name").alias("sname"),
        F.element_at(
            F.create_map(F.col("r_name"), F.col("r_regionkey")), F.col("r_name")
        ).alias("mval"),
    ).orderBy("r_regionkey")


@declared(
    "q19_tpch_q3",
    """SELECT o.o_orderkey,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(25,6))), 2) AS DOUBLE) AS rev,
              o.o_orderdate
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY o.o_orderkey, o.o_orderdate
       ORDER BY rev DESC, o.o_orderkey LIMIT 10""",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) skeleton: selective dim filter +
    two-fact join + grouped revenue + top-10. The plan to expect at
    scale: filters pushed to all three scans, customer broadcast,
    partial aggregation before the final top-k."""
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = T(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_money(_dsum(rev)).alias("rev"))
        .select("o_orderkey", "rev", "o_orderdate")
        .orderBy(F.col("rev").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@declared(
    "q103_more_strings",
    """SELECT p_partkey,
              ascii(p_brand) AS ab,
              left(p_name, 4) AS l4,
              right(p_type, 3) AS r3,
              translate(p_brand, 'Brand#', 'BRAND_') AS tr,
              CAST(strpos(p_type, 'a') AS BIGINT) AS pa
       FROM part ORDER BY p_partkey""",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.ascii("p_brand").alias("ab"),
        F.expr("left(p_name, 4)").alias("l4"),
        F.expr("right(p_type, 3)").alias("r3"),
        F.translate("p_brand", "Brand#", "BRAND_").alias("tr"),
        F.instr("p_type", "a").cast("bigint").alias("pa"),
    ).orderBy("p_partkey")


@declared(
    "q104_null_safe_eq",
    """SELECT c_custkey,
              NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM
              NULLIF(c_mktsegment, 'AUTOMOBILE') AS same_seg,
              NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_b
       FROM customer ORDER BY c_custkey""",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    a = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    b = F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE"))
    return c.select(
        "c_custkey",
        a.eqNullSafe(b).alias("same_seg"),
        a.isNull().alias("is_b"),
    ).orderBy("c_custkey")


@declared(
    "q105_rank_fns",
    """SELECT c_custkey,
              ROUND(percent_rank() OVER w, 6) AS pr,
              ROUND(cume_dist() OVER w, 6) AS cd
       FROM customer
       WINDOW w AS (ORDER BY c_acctbal NULLS LAST, c_custkey)
       ORDER BY c_custkey""",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    w = W.orderBy(F.col("c_acctbal").asc_nulls_last(), "c_custkey")
    return (
        T(spark, sf, "customer")
        .select(
            "c_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Round 3: TPC-H join-planning tier (Q7/Q8/Q10/Q12/Q14/Q17 shapes,
# adapted to the synthetic schema — no partsupp table, no l_shipmode /
# p_container columns; predicates use the columns that exist).
# All money aggregates follow the DECIMAL(25,6)-exact _dsum/_money
# pattern so sums are order-independent and engine-identical.
# ---------------------------------------------------------------------------


@declared(
    "q120_tpch_q7",
    """SELECT supp_nation, cust_nation, l_year, rev FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
                CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(25,6))), 2) AS DOUBLE) AS rev
         FROM supplier s
         JOIN lineitem l ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         GROUP BY supp_nation, cust_nation, l_year) t
       ORDER BY supp_nation, cust_nation, l_year""",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue between two nations by year.
    The two nation-dim joins BROADCAST; the nation-pair predicate prunes
    before the fact-fact join chain. ref test coverage model: SURVEY §5
    (TPC-H operator corpus)."""
    s, li = T(spark, sf, "supplier"), T(spark, sf, "lineitem")
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_money(_dsum(rev)).alias("rev"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@declared(
    "q121_tpch_q8",
    """SELECT o_year,
              ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                                  ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
                    / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
       FROM (
         SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
                CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
                  AS volume,
                n2.n_name AS nation
         FROM part p
         JOIN lineitem l ON p.p_partkey = l.l_partkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
         JOIN region r ON r.r_regionkey = n1.n_regionkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
         WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD') t
       GROUP BY o_year ORDER BY o_year""",
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (market share): one supplier nation's share of ASIA
    revenue by year — 8-table join; every dimension (part filter,
    nations, region) broadcasts, the fact chain shuffles on its keys.
    The share divides two DECIMAL-exact sums AFTER casting to double
    (decimal÷decimal scale rules differ across engines)."""
    p, li = T(spark, sf, "part"), T(spark, sf, "lineitem")
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    s, n = T(spark, sf, "supplier"), T(spark, sf, "nation")
    r = T(spark, sf, "region")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    part_share = F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        p.filter(F.col("p_type") == "STANDARD")
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(part_share).cast("double") / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@declared(
    "q122_tpch_q10",
    """SELECT c.c_custkey, c.c_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(25,6))), 2) AS DOUBLE) AS rev,
              c.c_acctbal, n.n_name
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1996-04-01'
         AND l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
       ORDER BY rev DESC, c.c_custkey LIMIT 20""",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by lost revenue in a
    quarter. Date + returnflag predicates push to the lineitem/orders
    scans; nation broadcasts; c_custkey tie-break makes the LIMIT
    deterministic."""
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    li, n = T(spark, sf, "lineitem"), T(spark, sf, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money(_dsum(rev)).alias("rev"))
        .select("c_custkey", "c_name", "rev", "c_acctbal", "n_name")
        .orderBy(F.col("rev").desc(), "c_custkey")
        .limit(20)
    )


@declared(
    "q123_late_shipments",
    """SELECT o.o_orderpriority,
              CAST(COUNT(*) AS BIGINT) AS n_items,
              CAST(COALESCE(SUM(CASE WHEN l.l_shipdate >
                     o.o_orderdate + INTERVAL 30 DAY THEN 1 END), 0) AS BIGINT)
                AS n_late
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (the synthetic lineitem has no l_shipmode, so the
    category is o_orderpriority and "late" is shipped >30 days after the
    order date): join + conditional counts per category — one fact-fact
    join on the order key, one small aggregate."""
    o, li = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.coalesce(F.sum(F.when(late, 1)), F.lit(0))
            .cast("bigint")
            .alias("n_late"),
        )
        .orderBy("o_orderpriority")
    )


@declared(
    "q124_tpch_q14",
    """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
                ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
              / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(25,6))) AS DOUBLE), 4) AS promo_share
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1996-03-01'""",
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share): scalar aggregate over a
    fact×dim join with a pushed date window; both sums are
    DECIMAL-exact, the final ratio divides doubles."""
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-03-01").cast("timestamp"))
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@declared(
    "q125_small_qty_revenue",
    """SELECT CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,6)))
                AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#11'
         AND l.l_quantity < (
           SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)""",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity orders): the correlated scalar
    AVG subquery is expressed as its scalable rewrite — a per-part
    aggregate joined back (exactly what Catalyst de-correlates to), so
    the plan is two hash joins + one aggregate, never a per-row
    subquery."""
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_brand") == "Brand#11")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(avg_qty, F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice")).cast("double") / F.lit(7.0), 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )
