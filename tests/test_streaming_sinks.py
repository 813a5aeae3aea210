"""Streaming dedup + MERGE sink: exactness within the watermark horizon
and batch-equivalent upsert semantics across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kwwhat_spark.plans.incremental import ParquetStateStore, PartitionedStateStore
from kwwhat_spark.sources.testdata import load_table
from kwwhat_spark.streaming.sinks import merge_sink, stream_dedup

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


@pytest.fixture()
def dup_dir(spark, sf_dir, tmp_path):
    """Events written twice (two files) → every row is a duplicate."""
    d = str(tmp_path / "dup_events")
    e = load_table(spark, sf_dir, "events").limit(500)
    e.write.mode("overwrite").parquet(d)
    e.write.mode("append").parquet(d)
    return d


def test_stream_dedup_drops_within_watermark(spark, dup_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(dup_dir)
    deduped = stream_dedup(stream, ["event_id"], "ts", "1 hour")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_out")
    assert out.count() == 500
    assert out.select("event_id").distinct().count() == 500


@pytest.mark.parametrize("store_fn", [
    lambda spark, p: ParquetStateStore(spark, p),
    lambda spark, p: PartitionedStateStore(
        spark, p, partition_exprs={"events_mart": "to_date(ts)"}
    ),
])
def test_merge_sink_upserts_across_microbatches(spark, sf_dir, tmp_path, store_fn):
    src = str(tmp_path / "merge_src")
    e = load_table(spark, sf_dir, "events").limit(300).select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    # File 1: original rows. File 2: same keys, value shifted — the
    # second micro-batch must REPLACE, not append.
    e.coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    e.withColumn("value", F.col("value") + 1000.0).coalesce(1).write.mode(
        "overwrite").parquet(src + "/f2")
    import glob
    import shutil
    d = str(tmp_path / "stream_in")
    import os
    os.makedirs(d)
    shutil.copy(glob.glob(src + "/f1/*.parquet")[0], d + "/0001.parquet")
    shutil.copy(glob.glob(src + "/f2/*.parquet")[0], d + "/0002.parquet")

    store = store_fn(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d)
    )
    q = merge_sink(stream, store, "events_mart", ["event_id"],
                   checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    final = store.read("events_mart")
    assert final.count() == 300  # keys replaced, not appended
    # Every value reflects the LAST file (shifted by 1000).
    orig = {r.event_id: r.value for r in e.collect()}
    got = {r.event_id: r.value for r in final.collect()}
    assert got == {k: v + 1000.0 for k, v in orig.items()}


def test_merge_sink_is_idempotent_on_redelivery(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events").limit(100).select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    store = ParquetStateStore(spark, str(tmp_path / "state2"))
    # Simulate redelivery by merging the same batch twice directly.
    store.merge("m", e, ["event_id"])
    store.merge("m", e, ["event_id"])
    assert store.read("m").count() == 100
