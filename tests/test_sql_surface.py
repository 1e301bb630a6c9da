"""The SQL entry point as a first-class surface (SURVEY §3): every
engine-portable oracle string runs through ``register_views`` +
``spark.sql`` and must produce EXACTLY the rows of its DataFrame builder —
a three-way parity gate (Spark DF ≡ Spark SQL ≡ DuckDB, the last via the
driver's oracle run)."""

from __future__ import annotations

import pytest

from crowdsorsa_etl_spark.queries import ORACLES, QUERIES
from crowdsorsa_etl_spark.sources.parquet import register_views

SF_DIR = "/root/testdata/sf0.001"

#: Oracle strings that are pure ANSI (no DuckDB-only routines) — verified to
#: parse AND hash-match on both engines. DuckDB-specific oracles (strftime,
#: unnest, list_* lambdas) stay DuckDB-only by design.
PORTABLE = [
    "q01_pricing_summary", "q02_revenue_filter", "q03_star_join",
    "q04_bigjoin_priority", "q05_semi_join", "q06_anti_join",
    "q07_topk_per_group", "q09_rollup", "q10_distinct_agg", "q11_set_ops",
    "q15_pivot", "q17_grouping_sets", "q20_range_join", "q22_cross_join",
    "q24_correlated_agg", "q26_math_funcs", "q27_null_funcs", "q28_having",
    "q29_top10_global", "q31_rank_distributions", "q32_first_last_value",
    "q36_unpivot", "q37_conditional_aggs", "q38_salted_distinct",
    "q39_salted_join", "q41_cube", "q44_regional_volume",
    "q45_bination_volume", "q48_range_join_binned", "q50_sql_parity",
    "q51_decimal_aggs", "q52_schema_evolution",
    # round 3
    "q54_table_diff", "q55_min_acctbal_supplier", "q56_nation_value_share",
    "q57_top_revenue_supplier", "q58_supplier_part_counts",
    "q59_large_orders", "q60_dormant_customers", "q62_stratified_sample",
    "q66_histogram_quantiles", "q67_incremental_agg", "q69_rank_funcs",
    "q71_nullsafe_join", "q72_bitwise_aggs", "q73_stats_aggs",
    "q74_data_quality", "q75_rolling_stats", "q77_promo_revenue",
    "q78_small_qty_revenue", "q79_or_predicates",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_DIR)
    return spark


class TestSqlParity:
    @pytest.mark.parametrize("name", PORTABLE)
    def test_sql_equals_dataframe(self, views, name):
        df_rows = _canon(QUERIES[name](views, SF_DIR))
        sql_rows = _canon(views.sql(ORACLES[name]))
        assert df_rows == sql_rows

    def test_coverage_floor(self):
        # the SQL surface must keep covering a substantial slice of the
        # registry; shrinking this list needs a deliberate decision
        assert len(PORTABLE) >= 30
        assert set(PORTABLE) <= set(ORACLES)
