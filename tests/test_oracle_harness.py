"""Regression tests for the local oracle harness itself.

Round 2 shipped two driver failures the harness had masked: a
TIMESTAMPTZ oracle compared equal to a naive Spark timestamp (tzinfo was
stripped before comparison) and NaN folded into NULL. These tests pin
the harness to the driver's stricter behavior so that class of local
false-green cannot recur.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.oracle_harness import _cell, compare


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    return c


def test_rejects_timestamptz_vs_naive(spark, con):
    df = spark.sql("SELECT timestamp'1970-01-01 00:00:00' AS ts")
    problems = compare(df, con, "SELECT to_timestamp(0) AS ts")
    assert problems and "dtype" in problems[0], problems
    # the naive-rendering oracle passes
    assert compare(df, con, "SELECT make_timestamp(0) AS ts") == []


def test_rejects_hugeint_sum_vs_bigint(spark, con):
    df = spark.sql("SELECT CAST(3 AS BIGINT) AS s")
    # DuckDB SUM over integers promotes to HUGEINT -> pandas float64 at
    # the driver; the harness must flag it even though values are equal.
    problems = compare(df, con, "SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert problems and "dtype" in problems[0], problems
    assert compare(df, con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)") == []


def test_list_types_canonicalize_to_array(spark, con):
    # BIGINT[] / TIMESTAMP[] must canonicalize as containers, not fall
    # into the INT / TIMESTAMP substring branches (round-3 advisor item):
    # an int-array oracle column must match a Spark array, and must NOT
    # match a Spark scalar int.
    from tests.oracle_harness import _canon_duck

    assert _canon_duck("BIGINT[]") == "array"
    assert _canon_duck("TIMESTAMP[]") == "array"
    assert _canon_duck("LIST(INTEGER)") == "array"
    df = spark.sql("SELECT array(1L, 2L) AS xs")
    assert compare(df, con, "SELECT [1, 2] AS xs") == []
    scalar = spark.sql("SELECT 1L AS xs")
    problems = compare(scalar, con, "SELECT [1, 2] AS xs")
    assert problems, "int scalar vs int-array must mismatch"


def test_nan_is_not_null(spark, con):
    assert _cell(float("nan")) == "NaN"
    assert _cell(None) == "NULL"
    df = spark.sql("SELECT CAST('nan' AS DOUBLE) AS v")
    assert math.isnan(df.collect()[0][0])
    problems = compare(df, con, "SELECT CAST(NULL AS DOUBLE) AS v")
    assert problems, "NaN must not compare equal to NULL"
    assert compare(df, con, "SELECT CAST('nan' AS DOUBLE) AS v") == []
