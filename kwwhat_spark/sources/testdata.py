"""Readers for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

At 100 TB these would be multi-file partitioned datasets; the reader is
already directory-shaped (``spark.read.parquet`` takes globs/dirs), and all
downstream code depends only on schema, never file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long (see session.py nanosAsLong);
    # convert back to microsecond timestamps. Detected by name convention:
    # the only long columns that are semantically timestamps are `ts` /
    # `*_ts` / `*date` in the driver tables.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, LongType) and (
            field.name == "ts" or field.name.endswith("_ts") or "date" in field.name
        ):
            # Integer `div` (double division rounds the 16-digit nanos).
            df = df.withColumn(
                field.name,
                F.expr(f"timestamp_micros({field.name} div 1000)"),
            )
        elif isinstance(field.dataType, TimestampNTZType):
            # Re-exported parquet (e.g. tools/scale_testdata.py output)
            # carries µs TIMESTAMP without UTC adjustment → Spark reads
            # TIMESTAMP_NTZ. The session timezone is UTC, so casting to
            # the instant type is value-preserving and restores the
            # schema the driver tables produce.
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql entry points)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
