"""Salting operators: results must be identical to the unsalted plans on
skewed synthetic data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kwwhat_spark.operators.skew import salted_groupby_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # One hot key (80% of rows) + uniform tail.
    hot = spark.range(8000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(2000).select(
        F.concat_ws("-", F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_groupby_matches_plain(spark, skewed):
    aggs = {
        "total": ("sum", "v"),
        "n": ("count", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
        "mean": ("avg", "v"),
    }
    plain = {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"], round(r["mean"], 9))
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"], round(r["mean"], 9))
        for r in salted_groupby_agg(skewed, ["k"], aggs, salt=8).collect()
    }
    assert salted == plain


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    dim = spark.createDataFrame(
        [("HOT", "hot meta"), ("t-1", "tail meta")], "k string, meta string"
    )
    plain = sorted(
        tuple(r) for r in skewed.join(dim, ["k"], how).collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(skewed, dim, ["k"], salt=8, how=how).collect()
    )
    assert salted == plain


def test_salted_join_rejects_right_outer(spark, skewed):
    dim = spark.createDataFrame([("HOT", 1)], "k string, m int")
    with pytest.raises(ValueError):
        salted_join(skewed, dim, ["k"], how="full_outer")
