"""Raw OCPP source readers (FIXTURES.md §1 schemas).

The demo seed (reference demo/seeds/) is the canonical small input; the
same readers take any directory of identically-shaped CSVs, or parquet
directories at scale. Schemas are explicit — no inference pass over
100 TB of logs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

DEMO_SEED_DIR = "/root/reference/demo/seeds"

OCPP_LOGS_SCHEMA = StructType(
    [
        StructField("timestamp", StringType()),
        StructField("id", StringType()),
        StructField("action", StringType()),
        StructField("msg", StringType()),
    ]
)
CHARGERS_SCHEMA = StructType(
    [
        StructField("charge_point_id", StringType()),
        StructField("location_id", StringType()),
        StructField("commissioned_ts", StringType()),
        StructField("decommissioned_ts", StringType()),
    ]
)
PORTS_SCHEMA = StructType(
    [StructField("charge_point_id", StringType()), StructField("port_id", StringType())]
)
CONNECTORS_SCHEMA = StructType(
    [
        StructField("charge_point_id", StringType()),
        StructField("port_id", StringType()),
        StructField("connector_id", StringType()),
        StructField("connector_type", StringType()),
    ]
)


def _read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .schema(schema)
        .csv(path)
    )


def load_ocpp_sources(
    spark: SparkSession,
    seed_dir: str = DEMO_SEED_DIR,
    logs_name: str = "ocpp_1_6_synthetic_logs_14d.csv",
) -> dict[str, DataFrame]:
    """Load the four raw source tables from a seed directory."""
    return {
        "raw_ocpp_logs": _read_csv(
            spark, os.path.join(seed_dir, logs_name), OCPP_LOGS_SCHEMA
        ),
        "raw_chargers": _read_csv(
            spark, os.path.join(seed_dir, "chargers.csv"), CHARGERS_SCHEMA
        ),
        "raw_ports": _read_csv(spark, os.path.join(seed_dir, "ports.csv"), PORTS_SCHEMA),
        "raw_connectors": _read_csv(
            spark, os.path.join(seed_dir, "connectors.csv"), CONNECTORS_SCHEMA
        ),
    }


def read_ocpp_logs_json(spark: SparkSession, path: str) -> DataFrame:
    """OCPP log lines as JSONL: {"timestamp", "id", "action", "msg"} with
    msg either a JSON string or the raw envelope array (a live collector
    would emit the latter). Explicit schema — no inference scan. Output
    schema matches the CSV reader, so staging is source-agnostic."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("timestamp", StringType()),
            StructField("id", StringType()),
            StructField("action", StringType()),
            # Keep the envelope un-parsed: staging splits it positionally.
            StructField("msg", StringType()),
        ]
    )
    return spark.read.schema(schema).json(path).select(
        "timestamp", "id", "action", F.col("msg").cast("string").alias("msg")
    )


def read_ocpp_logs_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Same four raw columns from parquet (the at-scale landing format)."""
    return spark.read.parquet(path).select("timestamp", "id", "action", "msg")
