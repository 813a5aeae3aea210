"""Analytics-module checks that the DuckDB oracle cannot express:
sketch error bounds and as-of join ordering invariants.
(Exact-value correctness for the other entries is covered by the
auto-parametrized oracle gate in test_catalog_oracle.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kwwhat_spark.queries import REGISTRY


def test_sketch_error_bounds(spark, sf_dir):
    rows = REGISTRY["sketch_aggregates"].spark(spark, sf_dir).collect()
    assert rows, "sketch query returned no groups"
    for r in rows:
        # HLL++ with rsd=0.01 on |users| <= 150 is near-exact; allow 5%.
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.05 * r.exact_users), (
            r.event_type, r.approx_users, r.exact_users)
        assert r.approx_p50 <= r.approx_p90


def test_asof_join_orders_strictly_before(spark, sf_dir):
    df = REGISTRY["asof_join_last_click"].spark(spark, sf_dir)
    bad = df.filter(F.col("last_click_ts") >= F.col("ts")).count()
    assert bad == 0
    # every error event appears exactly once (left-join semantics)
    from kwwhat_spark.sources.testdata import load_table
    n_errors = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error").count()
    assert df.count() == n_errors
