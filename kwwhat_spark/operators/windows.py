"""Window-based distributed operators.

All of these are single-shuffle operators: one hash-partition on the
partition keys, then in-partition sorting — Spark executes the whole
chain (lag/lead/flag/running-sum) in ONE Window exchange as long as every
window uses the same partitioning, which these do by construction. At
100 TB the partition key (charger/user) is high-cardinality, so the
shuffle is well spread; skew is handled by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str], order_by: Sequence[str | Column]):
    return W.partitionBy(*partition_by).orderBy(*order_by)


def lag_lead_neighbors(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    cols: Sequence[str],
) -> DataFrame:
    """Attach previous_<col> / next_<col> for each requested column.

    Mirrors the reference's lag/lead enrichment
    (int_status_changes.sql:164-205) — one Window exchange total.
    """
    w = _window(partition_by, order_by)
    for c in cols:
        df = df.withColumn(f"previous_{c}", F.lag(c).over(w))
        df = df.withColumn(f"next_{c}", F.lead(c).over(w))
    return df


def change_points(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    tracked: str,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Keep only rows where `tracked` changed vs the previous row
    (first row of each partition always kept), with previous/next context.

    Reference: int_status_changes.sql:164-189 (status change-point filter).
    """
    out = lag_lead_neighbors(df, partition_by, order_by, [tracked, *carry])
    prev = F.col(f"previous_{tracked}")
    return out.filter(prev.isNull() | (prev != F.col(tracked)))


def gaps_and_islands(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    new_island_flag: Column,
    island_col: str = "session_seq",
) -> DataFrame:
    """Assign island ids via running sum of a caller-provided
    new-island flag (classic gaps-and-islands;
    int_faulted_outages.sql:160-175)."""
    w = _window(partition_by, order_by).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(island_col, F.sum(new_island_flag).over(w))


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    order_by: Sequence[str | Column],
    gap_seconds: int,
    island_col: str = "session_seq",
) -> DataFrame:
    """Split each partition's timeline into sessions at inactivity gaps
    > gap_seconds. Integer-microsecond arithmetic (exact, engine-portable).

    Reference semantics: fact_visits.sql:57-116 step-1 chaining /
    int_offline_outages.sql:72-81 gap detection.
    """
    w = _window(partition_by, order_by)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.withColumn("_is_new_session", is_new)
    out = gaps_and_islands(
        flagged, partition_by, order_by, F.col("_is_new_session"), island_col
    )
    return out.drop("_is_new_session")
