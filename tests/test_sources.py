"""Source-format coverage: JSONL and parquet raw-log readers produce the
same staged output as the CSV reader."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kwwhat_spark.models import Pipeline
from kwwhat_spark.sources.ocpp import (
    load_ocpp_sources,
    read_ocpp_logs_json,
    read_ocpp_logs_parquet,
)


@pytest.fixture(scope="module")
def csv_sources(spark):
    return load_ocpp_sources(spark)


@pytest.fixture(scope="module")
def raw_rows(csv_sources):
    return csv_sources["raw_ocpp_logs"].collect()


def _staged_rows(spark, csv_sources, logs_df):
    pipe = Pipeline(spark=spark, sources={**csv_sources, "raw_ocpp_logs": logs_df})
    return sorted(
        (r["charger_id"], r["ingested_timestamp"], r["message_type_id"],
         r["unique_id"], r["payload"])
        for r in pipe.ref("stg_ocpp_logs").collect()
    )


def test_jsonl_reader_matches_csv(spark, csv_sources, raw_rows, tmp_path):
    path = tmp_path / "logs.jsonl"
    with open(path, "w") as f:
        for r in raw_rows:
            f.write(json.dumps(
                {"timestamp": r["timestamp"], "id": r["id"],
                 "action": r["action"], "msg": r["msg"]}) + "\n")
    jdf = read_ocpp_logs_json(spark, str(path))
    assert jdf.count() == len(raw_rows)
    assert _staged_rows(spark, csv_sources, jdf) == _staged_rows(
        spark, csv_sources, csv_sources["raw_ocpp_logs"]
    )


def test_parquet_reader_matches_csv(spark, csv_sources, tmp_path):
    path = str(tmp_path / "logs_parquet")
    csv_sources["raw_ocpp_logs"].write.parquet(path)
    pdf = read_ocpp_logs_parquet(spark, path)
    assert _staged_rows(spark, csv_sources, pdf) == _staged_rows(
        spark, csv_sources, csv_sources["raw_ocpp_logs"]
    )
