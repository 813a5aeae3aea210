"""Spark SQL entry-point parity: the ANSI subset of the oracle SQL must
run through spark.sql() on registered views and match the DataFrame
implementation row-for-row.

This proves two things the DuckDB gate can't: the engine's SQL surface
(register_views + spark.sql) is usable as a first-class entry point,
and the DataFrame plans match the SQL semantics under SPARK's own
analyzer too. Queries using DuckDB-only syntax (lambdas, LATERAL
UNNEST, epoch_us, //, generate_series) are excluded.
"""

from __future__ import annotations

import pytest

from kwwhat_spark.queries import REGISTRY
from kwwhat_spark.sources.testdata import register_views
from tests.oracle_harness import normalize, spark_result

ANSI_QUERIES = [
    "pricing_summary",
    "filter_pushdown",
    "join_broadcast_dims",
    "join_fact_fact",
    "anti_join_no_orders",
    "union_branches",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q12_late_lines",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q19_disc_revenue",
    "tpch_q20_excess_suppliers",
    "tpch_q21_blamed_suppliers",
    "tpch_q22_sales_opportunity",
    "pivot_event_matrix",
    "unpivot_event_matrix",
    "topk_per_group",
]
# Excluded: oracles leaning on DuckDB-only syntax (CAST(x AS VARCHAR)
# without length, 3-arg datediff, lambdas, LATERAL UNNEST, epoch_us,
# // floor-division, generate_series).


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_sql_entry_matches_dataframe(spark, sf_dir, name):
    q = REGISTRY[name]
    via_sql = spark.sql(q.oracle)
    s_cols, s_rows = spark_result(q.spark(spark, sf_dir))
    q_cols, q_rows = normalize(via_sql.columns, [tuple(r) for r in via_sql.collect()])
    assert s_cols == q_cols
    assert s_rows == q_rows
