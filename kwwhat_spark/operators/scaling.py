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

import os

from pyspark.sql import DataFrame

# Bytes of (compressed) input per widened partition. 64 KB reflects the
# measured CPU density of the operators widen() serves — shingling runs
# ~3 s/MB of compressed documents (r11: 1.7 s single-core at sf0.1's
# 594 KB), so a 64 KB slice is ~0.2 s of CPU, comfortably above the
# per-task overhead it buys. Env-tunable for corpora with a different
# CPU/byte profile; the DEFAULT is what the driver's bench sees.
_WIDEN_CHUNK_BYTES = int(os.environ.get("SPARK_GRAFT_WIDEN_CHUNK_BYTES", 64 * 1024))


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition `df` up to a size-derived target if its current plan
    yields fewer partitions. Never narrows an already-wide input.

    The target is ``min(defaultParallelism, ceil(input_bytes / 64 KB))``
    (guide §2: derive partitioning from input size, not from a constant
    tuned to one rig). At cluster scale the bytes term dwarfs the core
    count, so the cap binds and behaviour is identical to the old
    ``repartition(defaultParallelism)``; at bench scale (594 KB of
    documents at sf0.1) it stops fanning KB-sized inputs into 32 tasks
    whose fixed cost exceeds the CPU they unlock — measured r12,
    interleaved same-session mins: curation_pipeline 1.92 → 1.25 s,
    dedup_substring_spans 1.28 → 0.78 s at local[32], while the
    identical formula leaves sf1+ targets at the parallelism cap.
    ``min_partitions`` still overrides the derived target entirely.
    Plans without usable size statistics fall back to the parallelism
    cap (the old behaviour).
    """
    dp = df.sparkSession.sparkContext.defaultParallelism
    if min_partitions is not None:
        target = min_partitions
    else:
        target = dp
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if 0 < size < dp * _WIDEN_CHUNK_BYTES:
                target = max(1, -(-size // _WIDEN_CHUNK_BYTES))
        except Exception:
            pass
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
