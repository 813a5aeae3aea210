"""Misra-Gries heavy hitters: the exactness guarantee must hold when the
summary actually evicts (the catalog fixture's bigram cardinality is
below k, so eviction is only exercised here), across skewed and
adversarially flat distributions and arbitrary partitionings.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kwwhat_spark.operators.frequency import (
    frequent_items,
    misra_gries_candidates,
    word_bigrams,
)


def _exact_hh(items: list[str], theta: float) -> dict[str, int]:
    n = len(items)
    import math

    thr = math.ceil(theta * n)
    return {k: c for k, c in Counter(items).items() if c >= thr}


def _run(spark, items: list[str], theta: float, k: int, partitions: int):
    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(partitions)
    got = {
        r.item: r.cnt
        for r in frequent_items(df, "item", theta=theta, k=k).collect()
    }
    assert got == _exact_hh(items, theta)


def test_zipf_with_eviction(spark):
    rng = random.Random(6)
    # 2000 distinct keys, zipf-ish tail, k=25 forces heavy eviction.
    items = [f"k{int(rng.paretovariate(1.1))}" for _ in range(20000)]
    _run(spark, items, theta=0.05, k=25, partitions=7)


def test_flat_distribution_near_threshold(spark):
    # Adversarially flat head: 50 keys each exactly at/just below the
    # threshold, plus a 500-key singleton tail so the 55-counter summary
    # (valid: k+1=56 > 1/theta=54.9) must evict constantly.
    items = []
    for i in range(50):
        items += [f"f{i}"] * (100 if i % 2 == 0 else 99)
    items += [f"tail{j}" for j in range(500)]
    rng = random.Random(7)
    rng.shuffle(items)
    # N=5475, theta=0.0182 -> thr=ceil(99.645)=100: exactly the 25 even keys.
    _run(spark, items, theta=0.0182, k=55, partitions=5)


def test_single_partition_equals_many(spark):
    rng = random.Random(8)
    items = [f"s{rng.randrange(300)}" for _ in range(5000)]
    for parts in (1, 3, 11):
        _run(spark, items, theta=0.01, k=150, partitions=parts)


def test_candidates_bounded_by_k_per_partition(spark):
    items = [f"c{i % 500}" for i in range(5000)]
    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(4)
    k = 30
    n_cand = misra_gries_candidates(df, "item", k=k).count()
    assert n_cand <= k * 4


def test_theta_k_contract(spark):
    df = spark.createDataFrame([("a",)], "item string")
    # k+1 <= 1/theta -> exactness guarantee void -> refused.
    with pytest.raises(ValueError):
        frequent_items(df, "item", theta=0.001, k=500)
    with pytest.raises(ValueError):
        frequent_items(df, "item", theta=1.5)


def test_word_bigrams_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("",), ("  x   y  ",)], "text string"
    )
    rows = df.select(word_bigrams(F.col("text")).alias("g")).collect()
    assert rows[0].g == ["a b", "b c"]
    assert rows[1].g == []
    assert rows[2].g == []
    assert rows[3].g == ["x y"]


def test_exact_mode_equals_mg(spark):
    rng = random.Random(9)
    items = [f"e{int(rng.paretovariate(1.2))}" for _ in range(8000)]
    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(5)
    mg = {r.item: r.cnt for r in frequent_items(df, "item", theta=0.02, k=120).collect()}
    ex = {
        r.item: r.cnt
        for r in frequent_items(df, "item", theta=0.02, k=120, mode="exact").collect()
    }
    assert mg == ex == _exact_hh(items, 0.02)
    with pytest.raises(ValueError):
        frequent_items(df, "item", theta=0.02, mode="nope")


def test_auto_plan_choice(spark):
    from kwwhat_spark.operators.frequency import choose_frequent_items_plan

    low = spark.createDataFrame(
        [(f"k{i % 40}",) for i in range(20_000)], "item string"
    )
    high = spark.createDataFrame(
        [(f"unique-{i}",) for i in range(20_000)], "item string"
    )
    assert choose_frequent_items_plan(low, "item") == "exact"
    assert choose_frequent_items_plan(high, "item") == "mg"


def test_auto_mode_matches_both_plans(spark):
    rng = random.Random(11)
    items = [f"hot{i}" for i in range(5) for _ in range(300)] + [
        f"cold{rng.randrange(10_000)}" for _ in range(3_000)
    ]
    rng.shuffle(items)
    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(8)
    kw = dict(theta=0.02, k=120)
    auto = {r.item: r.cnt for r in frequent_items(df, "item", **kw).collect()}
    mg = {r.item: r.cnt for r in frequent_items(df, "item", mode="mg", **kw).collect()}
    exact = {
        r.item: r.cnt
        for r in frequent_items(df, "item", mode="exact", **kw).collect()
    }
    assert auto == mg == exact == _exact_hh(items, 0.02)
