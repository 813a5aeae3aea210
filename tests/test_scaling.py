"""operators/scaling.widen: narrow inputs are repartitioned up to a
size-derived target (ceil(input_bytes / 64 KB), capped at the session's
default parallelism — guide §2, partitioning derived from input size);
wide inputs pass through untouched; explicit targets override."""

from __future__ import annotations

from kwwhat_spark.operators.scaling import _WIDEN_CHUNK_BYTES, widen


def test_widen_large_input_reaches_parallelism(spark):
    # Stats must exceed dp * chunk for the parallelism cap to bind:
    # a long column is 8 bytes/row, so dp*chunk/8 rows clears it.
    dp = spark.sparkContext.defaultParallelism
    n = dp * _WIDEN_CHUNK_BYTES // 8 + 4096
    narrow = spark.range(0, n).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    wide = widen(narrow)
    assert wide.rdd.getNumPartitions() == dp
    assert wide.count() == n


def test_widen_tiny_input_stays_narrow(spark):
    # 1000 longs ≈ 8 KB of stats — one 64 KB chunk covers it, so the
    # size-derived target is 1 and no repartition shuffle is added.
    narrow = spark.range(0, 1000).coalesce(1)
    assert widen(narrow) is narrow


def test_widen_midsize_input_gets_size_derived_target(spark):
    # ~3 chunks of stats bytes → target 3 (below the parallelism cap
    # when dp >= 4, as in the test session's local[4]).
    n = 3 * _WIDEN_CHUNK_BYTES // 8
    narrow = spark.range(0, n).coalesce(1)
    got = widen(narrow).rdd.getNumPartitions()
    dp = spark.sparkContext.defaultParallelism
    assert 1 < got <= dp
    assert got == min(dp, 3)


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
