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


def write_with_manifest(
    df: DataFrame,
    path: str,
    stat_cols: list[str],
    *,
    coords: list[Column] | None = None,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write parquet plus a file-stats manifest (`_manifest.json`):
    per file, min/max of ``stat_cols`` harvested from the parquet
    footers after the write. With ``coords`` the data is Z-order
    clustered first (tight boxes = effective pruning).

    This is the table-format half of data skipping (Delta/Iceberg file
    stats): at 100 TB a scan over millions of files must prune from a
    manifest, not by opening every footer. The manifest is metadata-only
    (no data re-read — footers carry the stats)."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    if coords is not None:
        write_zordered(df, path, coords, bits=bits, n_files=n_files)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(path)
    manifest = {}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats = {}
        for c in stat_cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None:
                continue  # no stats for this column: cannot prune on it
            stats[c] = [
                lo.isoformat() if hasattr(lo, "isoformat") else lo,
                hi.isoformat() if hasattr(hi, "isoformat") else hi,
            ]
        manifest[os.path.basename(f)] = stats
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f)


def read_pruned(spark, path: str, ranges: dict[str, tuple]) -> "DataFrame":
    """Read only the files whose manifest stats intersect every
    ``ranges[col] = (lo, hi)`` interval (inclusive; None = unbounded).
    Files without stats for a column are conservatively kept. The
    predicate itself must STILL be applied by the caller — pruning is
    a superset guarantee, exactly like table-format file skipping."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)

    def keep(stats: dict) -> bool:
        for c, (lo, hi) in ranges.items():
            if c not in stats:
                continue  # no stats: cannot exclude
            fmin, fmax = stats[c]
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
        return True

    files = [os.path.join(path, f) for f, st in manifest.items() if keep(st)]
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
