"""Multi-dimensional data layout: Z-order (Morton) clustering for
file/row-group skipping.

The 100 TB problem this solves: parquet min/max stats prune files only
along the physical sort order. Sorting by one column makes its ranges
tight and every other column's ranges full-width; a 2-D filter then
skips nothing on the second dimension. Interleaving the bits of the
filter columns (Morton order) makes every file's bounding box small in
ALL participating dimensions, so 2-D predicates prune on each — the same
layout Delta OPTIMIZE ZORDER BY / Iceberg's z-ordering uses.

Everything here is whole-stage-codegen expressions (shift/or chains) +
one repartitionByRange shuffle; no UDFs, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_coord(col: Column, lo: Column | float, hi: Column | float, bits: int) -> Column:
    """Normalize a numeric column to an integer grid [0, 2^bits).

    (col - lo) / (hi - lo) scaled; clamped so out-of-range values land on
    the grid edge (stats stay correct — clamping only loosens pruning for
    the clamped rows, never misses rows)."""
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    span = hi_c.cast("double") - lo_c.cast("double")
    frac = (col.cast("double") - lo_c.cast("double")) / F.when(span > 0, span).otherwise(F.lit(1.0))
    scaled = F.floor(frac * F.lit(float(1 << bits))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled))


def zorder_key(coords: list[Column], bits: int = 16) -> Column:
    """Morton-interleave k grid coordinates (each in [0, 2^bits)) into one
    long. Built as a static shift/or expression chain — stays inside
    whole-stage codegen. k * bits must be <= 63."""
    k = len(coords)
    if k * bits > 63:
        raise ValueError(f"{k} dims x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(coords):
            # bit i of dim d -> position i*k + (k-1-d)
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + (k - 1 - d)
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    coords: list[Column],
    *,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write df as parquet clustered by the Z-order of ``coords``:
    repartitionByRange on the Morton key (contiguous key ranges per
    file = small bounding boxes in every dimension) + in-file sort so
    row-group stats are tight too."""
    (
        df.withColumn("__z", zorder_key(coords, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
