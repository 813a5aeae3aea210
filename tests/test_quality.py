"""Replay the reference's declared dbt schema tests (staging.yml /
intermediate.yml / marts.yml — 230+ checks) against our models on the
demo seed via the generic quality runner, plus runner unit tests."""

from __future__ import annotations

import datetime as dt
import re
from pathlib import Path

import pytest
import yaml

from kwwhat_spark.models import MODELS, Pipeline
from kwwhat_spark.quality import Check, Violation, freshness_status, run_checks
from kwwhat_spark.sources.ocpp import load_ocpp_sources

REFERENCE_MODELS = Path("/root/reference/models")

_KIND_MAP = {
    "not_null": "not_null",
    "unique": "unique",
    "accepted_values": "accepted_values",
    "dbt_utils.unique_combination_of_columns": "unique_combination",
    "dbt_utils.expression_is_true": "expression",
    "dbt_utils.accepted_range": "accepted_range",
    "relationships": "relationships",
}


def _mk_check(model: str, column: str | None, decl) -> Check | None:
    if isinstance(decl, str):
        kind = _KIND_MAP.get(decl)
        return Check(model=model, kind=kind, column=column) if kind else None
    (name, body), = decl.items()
    kind = _KIND_MAP.get(name)
    if kind is None:
        return None
    body = body or {}
    params = dict(body.get("arguments", {k: v for k, v in body.items() if k != "config"}))
    severity = (body.get("config") or {}).get("severity", "error")
    if kind == "relationships":
        m = re.match(r"ref\('([^']+)'\)", params["to"])
        params["to"] = m.group(1)
    return Check(model=model, kind=kind, column=column, params=params, severity=severity)


def load_reference_checks() -> list[Check]:
    checks: list[Check] = []
    for p in REFERENCE_MODELS.rglob("*.yml"):
        doc = yaml.safe_load(p.read_text())
        for m in (doc or {}).get("models", []):
            if m["name"] not in MODELS:
                continue
            for t in m.get("data_tests", []) or []:
                c = _mk_check(m["name"], None, t)
                if c:
                    checks.append(c)
            for col in m.get("columns", []):
                for t in col.get("data_tests", []) or []:
                    c = _mk_check(m["name"], col["name"], t)
                    if c:
                        checks.append(c)
    return checks


@pytest.mark.full
def test_reference_schema_tests_pass(spark):
    checks = load_reference_checks()
    assert len(checks) > 200, f"expected 200+ reference checks, parsed {len(checks)}"
    pipe = Pipeline(spark=spark, sources=load_ocpp_sources(spark))
    violations = run_checks(pipe.ref, checks)
    errors = [v for v in violations if v.check.severity == "error"]
    assert not errors, [
        (v.check.name, v.check.params, v.failing_rows) for v in errors
    ]


# ---------------------------------------------------------------------------
# Runner unit tests: each check kind detects a planted violation.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bad_df(spark):
    return spark.createDataFrame(
        [
            ("a", 1, "Available", 5.0, "P1"),
            ("a", 1, "Available", -1.0, "P1"),
            (None, 2, "Bogus", 0.5, "MISSING"),
        ],
        "id string, n int, status string, ratio double, parent_id string",
    )


@pytest.fixture(scope="module")
def parent_df(spark):
    return spark.createDataFrame([("P1",)], "parent_id string")


def _run_one(bad_df, parent_df, check):
    resolve = {"t": bad_df, "parent": parent_df}.__getitem__
    return run_checks(resolve, [check])


def test_not_null_detects(bad_df, parent_df):
    (v,) = _run_one(bad_df, parent_df, Check("t", "not_null", "id"))
    assert v.failing_rows == 1


def test_unique_detects(bad_df, parent_df):
    (v,) = _run_one(bad_df, parent_df, Check("t", "unique", "id"))
    assert v.failing_rows == 1  # one duplicated non-null key ("a")


def test_accepted_values_detects(bad_df, parent_df):
    (v,) = _run_one(
        bad_df, parent_df,
        Check("t", "accepted_values", "status", {"values": ["Available", "Preparing"]}),
    )
    assert v.failing_rows == 1


def test_unique_combination_detects(bad_df, parent_df):
    (v,) = _run_one(
        bad_df, parent_df,
        Check("t", "unique_combination", params={"combination_of_columns": ["id", "n"]}),
    )
    assert v.failing_rows == 1


def test_expression_detects(bad_df, parent_df):
    (v,) = _run_one(bad_df, parent_df, Check("t", "expression", params={"expression": "ratio >= 0"}))
    assert v.failing_rows == 1


def test_accepted_range_detects(bad_df, parent_df):
    (v,) = _run_one(
        bad_df, parent_df,
        Check("t", "accepted_range", "ratio", {"min_value": 0, "max_value": 1}),
    )
    assert v.failing_rows == 2  # 5.0 and -1.0


def test_relationships_detects(bad_df, parent_df):
    (v,) = _run_one(
        bad_df, parent_df,
        Check("t", "relationships", "parent_id", {"to": "parent", "field": "parent_id"}),
    )
    assert v.failing_rows == 1  # "MISSING"


def test_clean_data_no_violations(spark, parent_df):
    clean = spark.createDataFrame([("a", 1), ("b", 2)], "id string, n int")
    assert run_checks({"t": clean}.__getitem__, [
        Check("t", "not_null", "id"),
        Check("t", "unique", "id"),
        Check("t", "accepted_range", "n", {"min_value": 0}),
    ]) == []


def test_freshness(spark):
    now = dt.datetime(2025, 10, 15, 10, 0, 0)
    df = spark.createDataFrame(
        [(dt.datetime(2025, 10, 15, 9, 0, 0),)], "ts timestamp"
    )
    one_h = dt.timedelta(hours=1)
    assert freshness_status(df, "ts", 2 * one_h, 3 * one_h, now) == "pass"
    assert freshness_status(df, "ts", one_h / 2, 3 * one_h, now) == "warn"
    assert freshness_status(df, "ts", one_h / 4, one_h / 2, now) == "error"
