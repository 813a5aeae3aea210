"""Analytics-module checks that the DuckDB oracle cannot express:
sketch error bounds and as-of join ordering invariants.
(Exact-value correctness for the other entries is covered by the
auto-parametrized oracle gate in test_catalog_oracle.py.)
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kwwhat_spark.queries import REGISTRY


@pytest.mark.full
def test_sketch_error_bounds(spark, sf_dir):
    # Round 4: the entry emits exact counts + boolean bound assertions
    # (the oracle-gateable form); the sketch error bounds are now IN the
    # query (HLL within a 5% / ~5-sigma band), so the test checks every
    # boolean holds and counts are sane.
    rows = REGISTRY["sketch_aggregates"].spark(spark, sf_dir).collect()
    assert rows, "sketch query returned no groups"
    for r in rows:
        assert r.exact_users > 0, r.event_type
        assert r.approx_users_within_5pct, (r.event_type, r.exact_users)
        assert r.p50_within_band and r.p90_within_band, r.event_type


def test_asof_join_orders_strictly_before(spark, sf_dir):
    df = REGISTRY["asof_join_last_click"].spark(spark, sf_dir)
    bad = df.filter(F.col("last_click_ts") >= F.col("ts")).count()
    assert bad == 0
    # every error event appears exactly once (left-join semantics)
    from kwwhat_spark.sources.testdata import load_table
    n_errors = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error").count()
    assert df.count() == n_errors
