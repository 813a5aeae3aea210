"""Mart sinks: date-partitioned parquet writes.

The reference clusters every incremental table by its timestamp column
(`cluster_by`, e.g. int_status_changes.sql:6; SURVEY §4 "data
clustering"). The Spark-native analogue is directory partitioning by the
event date: scans with a date predicate prune whole partitions, and
downstream jobs (the incremental runner's windowed re-reads in
particular) touch only the affected days. On Delta/Iceberg the same
mapping becomes Z-ORDER / liquid clustering — the writer contract is
unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kwwhat_spark.models.base import Pipeline

# Mart -> timestamp/date column that mirrors the reference's cluster_by.
PARTITION_COLUMN: dict[str, str] = {
    "fact_charge_attempts": "charge_attempt_start_ts",
    "fact_visits": "visit_start_ts",
    "fact_interval_data": "meter_15min_interval_start",
    "fact_downtime_daily": "date_id",
    "fact_uptime": "date_id",
    "fact_charger_commissioned_daily": "date_id",
    "int_status_changes": "ingested_ts",
    "int_transactions": "ingested_ts",
    "int_connector_preparing": "ingested_ts",
    "int_meter_values": "ingested_ts",
    "int_offline_outages": "from_ts",
    "int_faulted_outages": "from_ts",
}


def write_partitioned(df: DataFrame, path: str, ts_col: str | None) -> None:
    if ts_col is None:
        df.write.mode("overwrite").parquet(path)
        return
    (
        df.withColumn("_date", F.to_date(F.col(ts_col)))
        # Sorting by the cluster timestamp WITHIN each date partition is
        # the second half of the reference's cluster_by: directory
        # pruning handles the date predicate, and ordered parquet
        # row-group min/max stats prune sub-day time ranges at scan time
        # — at 100 TB an hourly window touches a handful of row groups
        # instead of the whole day's files.
        .sortWithinPartitions("_date", ts_col)
        .write.mode("overwrite")
        .partitionBy("_date")
        .parquet(path)
    )


def write_marts(pipe: Pipeline, out_dir: str, models: list[str] | None = None) -> dict[str, str]:
    """Materialize models under out_dir, date-partitioned where declared.
    Returns {model: path}."""
    names = models or list(PARTITION_COLUMN)
    paths = {}
    for name in names:
        path = os.path.join(out_dir, name)
        write_partitioned(pipe.ref(name), path, PARTITION_COLUMN.get(name))
        paths[name] = path
    return paths


def compact_partitioned(
    spark,
    path: str,
    *,
    target_mb: int = 128,
    min_files: int = 4,
    sort_col: str | None = None,
) -> dict[str, int]:
    """Compact small files inside a date/part-partitioned parquet table.

    Incremental merges (PartitionedStateStore, dynamic partition
    overwrite) leave a few small files per touched partition per batch;
    over months the file count grows linearly and at 100 TB the metadata
    (listing, footers, task scheduling) dominates scan cost long before
    the bytes do. This rewrites ONLY partitions whose layout is bad —
    at least `min_files` files AND mean file size under half of
    `target_mb` — coalescing each to ceil(bytes/target) files, restoring
    the within-partition sort (`sort_col`) so row-group min/max pruning
    keeps working. Untouched partitions keep their exact files, the same
    contract the merge itself honors.

    Returns {partition_dir: files_before} for the rewritten partitions.
    Local-filesystem listing (os.walk); on HDFS/S3 swap the listing for
    the FileSystem API / S3 inventory — the rewrite plan is unchanged.
    On Delta/Iceberg this is OPTIMIZE / rewrite_data_files.
    """
    target_bytes = target_mb << 20
    rewritten: dict[str, int] = {}
    for root, dirs, files in os.walk(path):
        parts = [f for f in files if f.endswith(".parquet") and not f.startswith((".", "_"))]
        if len(parts) < min_files or "=" not in os.path.basename(root):
            continue
        total = sum(os.path.getsize(os.path.join(root, f)) for f in parts)
        if total / len(parts) >= target_bytes / 2:
            continue
        n_out = max(1, -(-total // target_bytes))
        df = spark.read.parquet(root).coalesce(int(n_out))
        if sort_col is not None:
            df = df.sortWithinPartitions(sort_col)
        # Materialize before overwriting the directory the plan reads.
        df.localCheckpoint(eager=True).write.mode("overwrite").parquet(root)
        rewritten[root] = len(parts)
        dirs[:] = []  # partition dirs are leaves; don't descend further
    return rewritten


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    order_by: list[str],
    rows_per_shard: int,
    n_partitions: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Export a corpus as deterministic, size-bounded training shards.

    Spark-native total-order sharding: `repartitionByRange` on the sort
    key gives non-overlapping, globally ordered partitions (one range
    shuffle — the same machinery as a global sort), rows are sorted
    within each partition, and `maxRecordsPerFile` caps shard size so
    downstream loaders stream fixed-size files without a planner.

    At 100 TB this is the right shape: the range exchange samples key
    quantiles (no driver materialization), every executor writes its own
    shard files, and no stage ever sees a global collect. `fmt` is
    "parquet" (training features) or "json" (JSONL text corpora).
    """
    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    if fmt not in ("parquet", "json"):
        raise ValueError("fmt must be 'parquet' or 'json'")
    cols = [F.col(c) for c in order_by]
    ranged = (
        df.repartitionByRange(n_partitions, *cols)
        if n_partitions
        else df.repartitionByRange(*cols)
    )
    (
        ranged.sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .format(fmt)
        .save(path)
    )
