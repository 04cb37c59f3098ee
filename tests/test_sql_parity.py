"""SQL-API parity: the oracle SQL strings are written for DuckDB, but
the ANSI subset must also run *unmodified* through spark.sql over the
registered views and produce the same rows as the DataFrame plans —
evidence that a reference user could bring their SQL verbatim."""

from __future__ import annotations

from pyspark.sql.utils import AnalysisException, ParseException

from iceberg_cache_spark.plans import ORACLE, QUERIES
from iceberg_cache_spark.sources.testdata import register_views
from tests.oracle import canonical_rows

# Queries whose oracle text is pure ANSI (no DuckDB-only functions).
ANSI_SQL = [
    "q01_projection",
    "q02_filter",
    "q03_between_like",
    "q04_case_when",
    "q05_cast_coalesce",
    "q06_distinct",
    "q10_inner_join",
    "q11_left_join",
    "q12_full_join",
    "q13_semi_join",
    "q14_anti_join",
    "q15_cross_join",
    "q16_theta_join",
    "q17_multiway_join_agg",
    "q20_groupby_agg",
    "q21_count_distinct",
    "q22_having",
    "q25_scalar_agg",
    "q26_stddev_var",
    "q30_row_number",
    "q31_lag_lead",
    "q32_window_frame",
    "q33_ntile",
    "q34_topk_per_group",
    "q35_range_frame",
    "q36_first_last_nth",
    "q40_order_limit",
    "q41_offset",
    "q42_union_all",
    "q43_union_distinct",
    "q44_intersect",
    "q45_except",
    "q46_scalar_subquery",
    "q47_in_subquery",
    "q48_cte",
    "q53_date_funcs",
    "q55_greatest_least",
    "q56_hash_funcs",
    "q77_except_all",
    "q78_intersect_all",
    "q79_correlated_exists_ineq",
    "q98_corr_covar",
]


def test_oracle_sql_runs_on_spark_unmodified(spark, sf_dir):
    register_views(spark, sf_dir)
    ran, failed = 0, []
    for name in ANSI_SQL:
        try:
            sql_df = spark.sql(ORACLE[name])
        except (ParseException, AnalysisException) as exc:
            failed.append((name, f"parse: {str(exc)[:100]}"))
            continue
        api_df = QUERIES[name](spark, sf_dir)
        got = canonical_rows(sql_df.columns, [tuple(r) for r in sql_df.collect()])
        want = canonical_rows(api_df.columns, [tuple(r) for r in api_df.collect()])
        if got != want:
            failed.append((name, "value mismatch"))
        else:
            ran += 1
    assert not failed, f"{len(failed)} SQL-parity failures: {failed[:5]}"
    assert ran == len(ANSI_SQL)
