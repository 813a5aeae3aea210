"""Skew-mitigation operators: salting for hot keys.

WHEN TO REACH FOR THESE — measured guidance (BASELINE.md skew table):
Spark's built-ins cover more skew than folklore suggests. Map-side
partial aggregation already neutralizes groupBy skew for combinable
aggregates (a 50%-hot-key sum/count ran 0.88 s plain vs 1.61 s
salted), and AQE's skew-join split handles SMJ skew once
`spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes` is
scaled to the data (the 256 MB default is sized for cluster-scale
partitions). Salting earns its extra shuffle only for:

- groupBy on a power-law key with NON-combinable aggregates
  (collect_list/collect_set, exact count-distinct): there is no
  map-side collapse, so `salted_groupby_agg` two-stages it — partial
  agg on (key, salt), final merge. Works for any algebraic aggregate.
- broadcast-impossible join against a skewed key where the other side
  is small relative to the skew (replicating it `salt` ways must cost
  less than the hot-partition stall; measured 29 s vs 11 s plain when
  that inequality fails): `salted_join` deterministically salts the
  skewed (probe) side and explodes the build side `salt` ways.

Both are deterministic (no rand()) so results and tests are stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# out_col -> (fn, in_col); fn in sum | count | min | max | avg
AggSpec = dict[str, tuple[str, str]]

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: AggSpec,
    salt: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation equivalent to
    ``df.groupBy(keys).agg(...)`` for algebraic aggregates.

    salt_source: column whose hash spreads rows of a hot key (defaults to
    a per-partition row counter — deterministic per input layout, and
    semantics never depend on WHICH salt a row gets, only correctness of
    the two-stage merge).
    """
    if salt_source is None:
        salt_col = F.spark_partition_id() * F.lit(2654435761) + F.monotonically_increasing_id()
    else:
        salt_col = F.xxhash64(
            F.col(salt_source) if isinstance(salt_source, str) else salt_source
        )
    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(salt)))

    partial_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__{out}_sum"))
            partial_exprs.append(F.count(col).alias(f"__{out}_cnt"))
        else:
            partial_exprs.append(_PARTIAL[fn](col).alias(f"__{out}"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)

    merge_exprs = []
    for out, (fn, _) in aggs.items():
        if fn == "avg":
            merge_exprs.append(
                (F.sum(f"__{out}_sum") / F.sum(f"__{out}_cnt")).alias(out)
            )
        else:
            merge_exprs.append(_MERGE[fn](f"__{out}").alias(out))
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    salt: int = 16,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot keys and `other` is too large to
    broadcast: salt the skewed side deterministically, explode `other`
    across all salt values, join on keys+salt. Row multiplicity is
    identical to the plain join.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # Replicating `other` would fabricate unmatched copies under
        # right/full outer semantics.
        raise ValueError(f"salted_join supports left-oriented joins, got {how}")
    if salt_source is None:
        salt_col = F.spark_partition_id() * F.lit(2654435761) + F.monotonically_increasing_id()
    else:
        salt_col = F.xxhash64(
            F.col(salt_source) if isinstance(salt_source, str) else salt_source
        )
    left = skewed.withColumn("_salt", F.pmod(salt_col, F.lit(salt)).cast("int"))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = left.join(right, [*keys, "_salt"], how)
    return joined.drop("_salt")
