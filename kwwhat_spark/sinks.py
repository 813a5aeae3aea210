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
