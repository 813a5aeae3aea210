"""Staging models: rename/cast + OCPP envelope split.

Reference: models/staging/raw/stg_ocpp_logs.sql:14-36 (envelope split),
stg_chargers.sql / stg_ports.sql (distinct), stg_connectors.sql.
All are views in the reference → plain (lazy) DataFrames here; Catalyst
collapses them into downstream plans, so the JSON split is computed once
per scan with column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kwwhat_spark.models.base import Pipeline, model


@model("stg_ocpp_logs")
def stg_ocpp_logs(p: Pipeline) -> DataFrame:
    src = p.source("raw_ocpp_logs")
    # One from_json over the whole envelope instead of one
    # get_json_object parse per slot ($[0], $[1], ...): elements land as
    # strings with objects re-serialized by the SAME Jackson writer
    # get_json_object uses (verified byte-identical, incl. nested
    # arrays/objects/numbers), so downstream payload parsing and the
    # DuckDB oracles see unchanged text. F.get is null-safe on short
    # envelopes (ANSI mode: element_at would throw).
    msg_type = F.get("__env", 0)
    cols = [
        F.col("timestamp").cast("timestamp").alias("ingested_timestamp"),
        F.col("id").cast("string").alias("charger_id"),
        F.col("action").cast("string").alias("action"),
        msg_type.cast("string").alias("message_type_id"),
        F.get("__env", 1).cast("string").alias("unique_id"),
        # CALL carries payload at [3], CALLRESULT at [2]; CALLERROR → null
        # (stg_ocpp_logs.sql:30-36).
        F.when(msg_type == p.vars.call_message_type_id, F.get("__env", 3))
        .when(msg_type == p.vars.callresult_message_type_id, F.get("__env", 2))
        .alias("payload"),
    ]
    if p.vars.extract_callerror:
        # CALLERROR envelope [4, uid, errorCode, errorDescription,
        # {errorDetails}] (seeds/prompt.txt:13) — opt-in beyond-reference
        # surface; a real fleet emits these and losing errorCode makes
        # fault triage blind.
        is_err = msg_type == p.vars.callerror_message_type_id
        cols += [
            F.when(is_err, F.get("__env", 2)).cast("string").alias("error_code"),
            F.when(is_err, F.get("__env", 3)).cast("string").alias("error_description"),
            F.when(is_err, F.get("__env", 4)).cast("string").alias("error_details"),
        ]
    return src.withColumn("__env", F.from_json("msg", "array<string>")).select(*cols)


@model("stg_chargers")
def stg_chargers(p: Pipeline) -> DataFrame:
    return (
        p.source("raw_chargers")
        .select(
            F.col("charge_point_id").cast("string").alias("charger_id"),
            F.col("location_id").cast("string").alias("location_id"),
            F.col("commissioned_ts").cast("timestamp").alias("commissioned_ts"),
            F.col("decommissioned_ts").cast("timestamp").alias("decommissioned_ts"),
        )
        .distinct()
    )


@model("stg_ports")
def stg_ports(p: Pipeline) -> DataFrame:
    return (
        p.source("raw_ports")
        .select(
            F.col("charge_point_id").cast("string").alias("charger_id"),
            F.col("port_id").cast("string").alias("port_id"),
        )
        .distinct()
    )


@model("stg_connectors")
def stg_connectors(p: Pipeline) -> DataFrame:
    return p.source("raw_connectors").select(
        F.col("charge_point_id").cast("string").alias("charger_id"),
        F.col("port_id").cast("string").alias("port_id"),
        F.col("connector_id").cast("string").alias("connector_id"),
        F.col("connector_type").cast("string").alias("connector_type"),
    )
