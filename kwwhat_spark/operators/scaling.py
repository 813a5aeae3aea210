"""Input-parallelism repair for CPU-dense operators.

Spark sizes parquet splits by BYTES (spark.sql.files.maxPartitionBytes),
which is the right heuristic for I/O-bound scans and exactly wrong for
CPU-dense per-row work: a 600 KB compressed documents file expands into
seconds of shingling/MinHash CPU but arrives as ONE input partition, so
the whole map stage runs on one core of the cluster. Measured at sf0.1:
the shingle pass of MinHash-LSH spent 1.7 s on 1 of 32 cores.

`widen()` round-robin-repartitions a narrow input up to the session's
default parallelism before the expensive expressions run. The extra
shuffle moves each document once — negligible next to the CPU it
unlocks — and is a no-op when the scan is already wide (the 100 TB case,
where bytes-based splitting yields thousands of partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition `df` up to `min_partitions` (default: the session's
    defaultParallelism) if its current plan yields fewer partitions.
    Never narrows an already-wide input."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def shard_column(df: DataFrame, key: str, n_shards: int, out: str = "shard") -> DataFrame:
    """Add a deterministic uniform shard id: pmod(xxhash64(key), n).

    For operators whose parallelism is bounded by a partition column's
    cardinality (pack_sequences per lang = 5-way ceiling; any
    per-partition running-sum/window), shard first and partition by
    (natural_col, shard) or shard alone — n_shards sized so one shard's
    rows fit an executor's window buffer. Membership is a pure function
    of the key: reruns and both engines agree on shard contents.
    """
    from pyspark.sql import functions as F

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_shards)))
