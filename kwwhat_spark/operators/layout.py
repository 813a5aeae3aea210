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


# ---------------------------------------------------------------------------
# File-stats manifest (the Delta/Iceberg file-skipping analogue). All
# filesystem access goes through the Hadoop FileSystem API resolved from
# the path's scheme, so the same code serves file://, hdfs:// and
# s3a:// — at 100 TB the table lives on an object store and a local
# glob()/open() would silently see nothing. Footer stats are harvested
# with ranged reads (tail-8 then footer bytes), never a whole-file read:
# manifest construction stays metadata-only even against remote storage.
# ---------------------------------------------------------------------------


def _hadoop_fs(spark, path: str):
    """(FileSystem, qualified Path) for ``path`` under the session's
    Hadoop configuration — scheme-dispatched (file/hdfs/s3a/...)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, fs.makeQualified(jpath)


def _read_range(spark, fs, jpath, pos: int) -> bytes:
    """Bytes from ``pos`` to EOF via FSDataInputStream (py4j returns
    Java byte[] as Python bytes)."""
    stream = fs.open(jpath)
    try:
        stream.seek(pos)
        return bytes(
            spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


def _footer_metadata(spark, fs, jpath):
    """Parquet FileMetaData read through the Hadoop FileSystem with two
    ranged reads (8-byte tail for the footer length, then the footer),
    reassembled into a minimal in-memory file for pyarrow. Metadata-only
    on any storage scheme."""
    import io
    import struct

    import pyarrow.parquet as pq

    size = fs.getFileStatus(jpath).getLen()
    tail = _read_range(spark, fs, jpath, size - 8)
    if tail[4:8] != b"PAR1":
        raise ValueError(f"not a parquet file: {jpath}")
    (flen,) = struct.unpack("<I", tail[:4])
    footer_and_tail = _read_range(spark, fs, jpath, size - 8 - flen)
    return pq.read_metadata(io.BytesIO(b"PAR1" + footer_and_tail))


def _ser_stat(v):
    """(json_value, type_tag) for a footer statistic; (None, None) when
    the type has no defined ordering rule (conservative: no stats)."""
    import base64
    import datetime

    if isinstance(v, bool):
        return v, "bool"
    if isinstance(v, datetime.datetime):
        return v.isoformat(), "timestamp"
    if isinstance(v, datetime.date):
        return v.isoformat(), "date"
    if isinstance(v, int):
        return v, "int"
    if isinstance(v, float):
        return v, "float"
    if isinstance(v, str):
        return v, "str"
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii"), "bytes"
    return None, None


def _deser_stat(v, tag):
    import base64
    import datetime

    if tag == "timestamp":
        return datetime.datetime.fromisoformat(v)
    if tag == "date":
        return datetime.date.fromisoformat(v)
    if tag == "bytes":
        return base64.b64decode(v)
    return v


class _Incomparable(Exception):
    pass


def _coerce_bound(b, tag):
    """Caller-supplied bound -> the manifest column's comparison domain.
    Raises _Incomparable when the types don't share an ordering (the
    caller then keeps the file — pruning must never exclude on a type
    pun, e.g. an int bound lexicographically compared to an isoformat
    string)."""
    import datetime

    if b is None:
        return None
    try:
        if tag == "timestamp":
            if isinstance(b, datetime.datetime):
                return b
            if isinstance(b, datetime.date):
                return datetime.datetime.combine(b, datetime.time.min)
            if isinstance(b, str):
                return datetime.datetime.fromisoformat(b)
        elif tag == "date":
            if isinstance(b, datetime.datetime):
                return b.date()
            if isinstance(b, datetime.date):
                return b
            if isinstance(b, str):
                return datetime.date.fromisoformat(b)
        elif tag in ("int", "float", "bool"):
            if isinstance(b, (int, float)):
                return b
        elif tag == "str":
            if isinstance(b, str):
                return b
        elif tag == "bytes":
            if isinstance(b, (bytes, bytearray)):
                return bytes(b)
    except ValueError as e:  # e.g. non-ISO string for a timestamp column
        raise _Incomparable(str(e)) from e
    raise _Incomparable(f"bound {type(b).__name__} vs column type {tag}")


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
    per file, typed min/max of ``stat_cols`` harvested from the parquet
    footers after the write. With ``coords`` the data is Z-order
    clustered first (tight boxes = effective pruning).

    This is the table-format half of data skipping (Delta/Iceberg file
    stats): at 100 TB a scan over millions of files must prune from a
    manifest, not by opening every footer. The manifest is metadata-only
    (footers are fetched with ranged reads through the Hadoop
    FileSystem — no data re-read, no local-filesystem assumption)."""
    import json

    if coords is not None:
        write_zordered(df, path, coords, bits=bits, n_files=n_files)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    fs, root = _hadoop_fs(spark, path)
    files = sorted(
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    )
    manifest: dict = {"format": 2, "files": {}}
    for name in files:
        md = _footer_metadata(
            spark, fs, spark.sparkContext._jvm.org.apache.hadoop.fs.Path(root, name)
        )
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
            lo_j, tag = _ser_stat(lo)
            hi_j, tag_hi = _ser_stat(hi)
            if tag is None or tag != tag_hi:
                continue  # unorderable or inconsistent type: no stats
            stats[c] = {"min": lo_j, "max": hi_j, "type": tag}
        manifest["files"][name] = stats
    out = fs.create(
        spark.sparkContext._jvm.org.apache.hadoop.fs.Path(root, "_manifest.json"), True
    )
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()


def read_pruned(spark, path: str, ranges: dict[str, tuple]) -> "DataFrame":
    """Read only the files whose manifest stats intersect every
    ``ranges[col] = (lo, hi)`` interval (inclusive; None = unbounded).
    Files without stats for a column — or whose bound/stat types share
    no ordering — are conservatively kept. The predicate itself must
    STILL be applied by the caller — pruning is a superset guarantee,
    exactly like table-format file skipping."""
    import json

    import datetime
    from zoneinfo import ZoneInfo

    fs, root = _hadoop_fs(spark, path)
    data = _read_range(
        spark, fs, spark.sparkContext._jvm.org.apache.hadoop.fs.Path(root, "_manifest.json"), 0
    )
    manifest = json.loads(data.decode("utf-8"))
    entries = manifest["files"] if manifest.get("format") == 2 else manifest
    # Spark semantic for a naive timestamp literal: it denotes an instant
    # in the SESSION timezone. Stats harvested from parquet footers are
    # tz-aware (isAdjustedToUTC); normalizing naive values the same way
    # Spark would keeps awareness-mixed comparisons meaningful instead of
    # degrading every timestamp range to the conservative keep.
    sess_tz = ZoneInfo(spark.conf.get("spark.sql.session.timeZone") or "UTC")

    def _aware(x):
        if isinstance(x, datetime.datetime) and x.tzinfo is None:
            return x.replace(tzinfo=sess_tz)
        return x

    def keep(stats: dict) -> bool:
        for c, (lo, hi) in ranges.items():
            if c not in stats:
                continue  # no stats: cannot exclude
            st = stats[c]
            try:
                if isinstance(st, dict):  # format 2: typed stats
                    tag = st["type"]
                    fmin = _deser_stat(st["min"], tag)
                    fmax = _deser_stat(st["max"], tag)
                    lo_c, hi_c = _coerce_bound(lo, tag), _coerce_bound(hi, tag)
                    if tag == "timestamp":
                        fmin, fmax = _aware(fmin), _aware(fmax)
                        lo_c, hi_c = _aware(lo_c), _aware(hi_c)
                else:  # legacy format 1: untyped [lo, hi]
                    fmin, fmax, lo_c, hi_c = st[0], st[1], lo, hi
                if lo_c is not None and fmax < lo_c:
                    return False
                if hi_c is not None and fmin > hi_c:
                    return False
            except (_Incomparable, TypeError):
                continue  # incomparable (type pun / tz mismatch): keep
        return True

    files = [f"{root}/{f}" for f, st in entries.items() if keep(st)]
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
