"""Generic temporal operators vs independent oracles.

asof_join is checked against pandas.merge_asof (an implementation with
completely different mechanics); interval_join against the naive theta
join it replaces. Plans are asserted free of nested-loop strategies.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kwwhat_spark.operators.temporal import asof_join, interval_join
from kwwhat_spark.sources.testdata import load_table


def _streams(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value"))
    return left, right


def _pandas_asof(left, right, strict, tolerance_seconds=None):
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas().sort_values("click_ts").reset_index(drop=True)
    kwargs = {"allow_exact_matches": not strict}
    if tolerance_seconds is not None:
        kwargs["tolerance"] = pd.Timedelta(seconds=tolerance_seconds)
    merged = pd.merge_asof(
        lp, rp, left_on="ts", right_on="click_ts", by="user_id",
        direction="backward", **kwargs)
    return {
        (r.event_id): (None if pd.isna(r.click_ts) else r.click_ts.isoformat(),
                       None if pd.isna(r.click_value) else round(r.click_value, 6))
        for r in merged.itertuples()
    }


def _spark_asof_map(df):
    return {
        r.event_id: (None if r.click_ts is None else r.click_ts.isoformat(),
                     None if r.click_value is None else round(r.click_value, 6))
        for r in df.collect()
    }


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    left, right = _streams(spark, sf_dir)
    for strict in (True, False):
        got = asof_join(left, right, on=["user_id"], left_ts="ts",
                        right_ts="click_ts", value_cols=["click_ts", "click_value"],
                        strict=strict)
        assert _spark_asof_map(got) == _pandas_asof(left, right, strict)


def test_asof_tolerance(spark, sf_dir):
    left, right = _streams(spark, sf_dir)
    got = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="click_ts", value_cols=["click_ts", "click_value"],
                    strict=True, tolerance_seconds=1800)
    expected = _pandas_asof(left, right, True, tolerance_seconds=1800)
    assert _spark_asof_map(got) == expected
    # tolerance must actually null out stale matches somewhere
    assert any(v == (None, None) for v in expected.values())


def test_asof_rejects_column_collision(spark, sf_dir):
    left, right = _streams(spark, sf_dir)
    try:
        asof_join(left, right.withColumnRenamed("click_ts", "ts"),
                  on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["ts"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def _incidents(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .select("start_ts", "end_ts")
    )


def test_interval_join_matches_naive(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = _incidents(spark, sf_dir).withColumn("iv_id", F.monotonically_increasing_id())
    bucketed = interval_join(e, iv, "ts", "start_ts", "end_ts", bucket_seconds=1800)
    naive = e.join(iv, (e.ts >= iv.start_ts) & (e.ts <= iv.end_ts))
    key = lambda df: sorted((r.event_id, r.start_ts) for r in df.collect())
    assert key(bucketed) == key(naive.select("event_id", "start_ts"))


def test_interval_join_left_keeps_unmatched(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = _incidents(spark, sf_dir)
    out = interval_join(e, iv, "ts", "start_ts", "end_ts",
                        bucket_seconds=1800, how="left")
    assert out.count() >= e.count()
    assert out.filter(F.col("start_ts").isNull()).count() == (
        out.count() - interval_join(e, iv, "ts", "start_ts", "end_ts",
                                    bucket_seconds=1800).count()
    )


def test_temporal_plans_have_no_nested_loops(spark, sf_dir):
    left, right = _streams(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = _incidents(spark, sf_dir)
    for df in (
        asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
                  value_cols=["click_ts", "click_value"]),
        interval_join(e, iv, "ts", "start_ts", "end_ts", bucket_seconds=1800),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_uid_window_join_rejects_nonpositive_window(spark):
    """window_s <= 0 would zero the bucket width (NULL buckets -> every
    row silently unmatched); the operator must refuse instead (ADVICE r9)."""
    import pytest

    from kwwhat_spark.operators.temporal import uid_window_join

    df = spark.createDataFrame([(1, "u", "2024-01-01 00:00:00")],
                               "id long, uid string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    for bad in (0, -5):
        with pytest.raises(ValueError, match="window_s"):
            uid_window_join(df, df.select(F.col("uid").alias("u2"),
                                          F.col("ts").alias("ts2")),
                            "uid", "u2", "ts", "ts2", window_s=bad)
