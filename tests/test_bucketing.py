"""Bucketed materialization must remove the Exchange from co-located
joins and aggregations, and keep results identical to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kwwhat_spark.operators.bucketing import bucketed_join_ready, write_bucketed
from kwwhat_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "b_lineitem", ["o_orderkey"], 8)
    # At test scale the planner would broadcast instead of exercising the
    # bucketed sort-merge path; force SMJ as a large-fact stand-in.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield "b_orders", "b_lineitem"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    assert bucketed_join_ready(spark, ta, tb)
    joined = spark.table(ta).join(spark.table(tb), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, tb = bucketed_tables
    agg = spark.table(tb).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ta, tb = bucketed_tables
    bucketed = (
        spark.table(ta).join(spark.table(tb), "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_mismatched_buckets_not_ready(spark, sf_dir, bucketed_tables):
    ta, _ = bucketed_tables
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    write_bucketed(c, "b_cust_16", ["c_custkey"], 16)
    try:
        assert not bucketed_join_ready(spark, ta, "b_cust_16")
        assert not bucketed_join_ready(spark, ta, "no_such_table")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cust_16")
