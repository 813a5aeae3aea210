"""Every catalog query with an oracle must match DuckDB exactly
(the driver's t2 gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

# Slow tier (r13 suite split): per-entry DuckDB oracle compares; tools/gate_check.py (156/156) is the correctness authority.
# Default runs exclude it (pytest.ini addopts); run with -m full.
pytestmark = pytest.mark.full

from kwwhat_spark.queries import REGISTRY
from tests.oracle_harness import compare, duckdb_connection

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    problems = compare(q.spark(spark, sf_dir), duck, q.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
