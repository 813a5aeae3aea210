"""operators/scaling.widen: narrow inputs are repartitioned up to the
session's default parallelism; wide inputs pass through untouched."""

from __future__ import annotations

from kwwhat_spark.operators.scaling import widen


def test_widen_narrow_input(spark):
    narrow = spark.range(0, 1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    wide = widen(narrow)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert wide.count() == 1000


def test_widen_preserves_rows(spark):
    narrow = spark.range(0, 100).coalesce(1)
    assert sorted(r.id for r in widen(narrow).collect()) == list(range(100))


def test_widen_wide_input_is_noop(spark):
    target = spark.sparkContext.defaultParallelism
    already_wide = spark.range(0, 1000, numPartitions=target + 4)
    assert widen(already_wide) is already_wide


def test_widen_explicit_target(spark):
    narrow = spark.range(0, 10).coalesce(1)
    assert widen(narrow, min_partitions=4).rdd.getNumPartitions() == 4
