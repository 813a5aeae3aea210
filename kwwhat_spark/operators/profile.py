"""Single-pass data profiling: per-column null/distinct/min/max stats.

The reference encodes data expectations declaratively (schema tests,
SURVEY.md §5.1) — profiling is the discovery half of that loop: run it
on a new source, then write the checks. One wide aggregate computes
every column's stats in a single scan (shuffle carries one row), then
the wide row unpivots to one row per column.

Scale: the only caveat is exact count-distinct per column — each adds
an Expand branch to the aggregate. `approx=True` (default) switches to
HLL++ (approx_count_distinct, 1% rsd), which keeps the pass single-agg
and is the right mode at 100 TB; exact mode exists for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = True,
) -> DataFrame:
    """One row per column: column, row_count, null_count,
    distinct_count, min_value, max_value (min/max cast to string so a
    heterogeneous column set fits one output schema)."""
    cols = columns or df.columns
    dcount = (
        (lambda c: F.approx_count_distinct(c, 0.01)) if approx else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            dcount(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        "row_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__nulls").alias("null_count"),
                    F.col(f"{c}__distinct").alias("distinct_count"),
                    F.col(f"{c}__min").alias("min_value"),
                    F.col(f"{c}__max").alias("max_value"),
                )
                for c in cols
            ])
        ).alias("s"),
    )
    return stacked.select(
        F.col("s.column").alias("column"),
        "row_count",
        F.col("s.null_count").alias("null_count"),
        F.col("s.distinct_count").alias("distinct_count"),
        F.col("s.min_value").alias("min_value"),
        F.col("s.max_value").alias("max_value"),
    )
