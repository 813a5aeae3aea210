"""Property test: fact_visits sessionization vs the DuckDB compile of the
reference's visit logic on randomized attempt sequences (VERDICT r2 §9).

Targets the semantics most likely to drift at scale: gaps at exactly the
2- and 30-minute boundaries (strict `>` chaining), conflicting id_tags
inside a chain, retroactive id-tag inference (max over the step-1 chain),
null-energy attempts, and single-attempt visits.

All 200 generated cases share one Spark run + one DuckDB query: each case
gets its own location (grouping keys are location-prefixed, so cases are
provably independent partitions). Attempt start timestamps are unique per
case — ORDER BY charge_attempt_start_ts with exact ties is undefined in
BOTH engines (the reference SQL included), so tie order is out of scope.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest

from kwwhat_spark.models import Pipeline
from kwwhat_spark.queries.ocpp_pipeline import _FV_ORACLE_TAIL, _VISITS_CTES
from tests.oracle_harness import compare

N_CASES = 200
BASE = dt.datetime(2025, 10, 2, 8, 0, 0)


def _gen_case(rng: random.Random, case: int):
    """One location with 1-2 chargers x 1-2 ports and 1-12 attempts whose
    gaps cluster on the 2/30-minute boundaries."""
    loc = f"LOC{case:04d}"
    chargers = [f"CH{case:04d}-{i}" for i in range(rng.randint(1, 2))]
    ports = {}
    connectors = []
    for ch in chargers:
        n_ports = rng.randint(1, 2)
        ports[ch] = [f"P{j}" for j in range(n_ports)]
        for j, p in enumerate(ports[ch]):
            connectors.append((ch, str(j + 1), p))
    attempts = []
    t = BASE + dt.timedelta(minutes=case * 1440 % 100000)
    for i in range(rng.randint(1, 12)):
        ch = rng.choice(chargers)
        port = rng.choice(ports[ch])
        conn = str(ports[ch].index(port) + 1)
        # Gap from the PREVIOUS attempt's stop: hammer the boundaries.
        gap = rng.choice([0, 1, 2, 3, 2, 29, 30, 31, 30, 5, 45, 1])
        dur = rng.choice([1, 5, 17, 40])
        start = t + dt.timedelta(minutes=gap, seconds=rng.choice([0, 1, 59]))
        stop = start + dt.timedelta(minutes=dur)
        t = stop
        id_tag = rng.choice([None, None, f"TAG-A{case}", f"TAG-B{case}"])
        energy = rng.choice([None, 0.0, 0.5, 1.5, 4.0, 8.0])
        attempts.append(
            {
                "charge_attempt_id": f"att-{case:04d}-{i:03d}",
                "charger_id": ch,
                "connector_id": conn,
                "port_id_expected": port,
                "charge_attempt_start_ts": start,
                "charge_attempt_stop_ts": stop,
                "id_tag": id_tag,
                "energy_transferred_kwh": energy,
                "is_successful": rng.random() < 0.6,
                "preparing_ingested_ts": start,
                "incremental_ts": dt.datetime(2025, 10, 15),
            }
        )
    dims_conn = [
        {"charger_id": ch, "connector_id": conn, "port_id": p}
        for ch, conn, p in connectors
    ]
    dims_chg = [{"charger_id": ch, "location_id": loc} for ch in chargers]
    return attempts, dims_conn, dims_chg


@pytest.fixture(scope="module")
def generated():
    rng = random.Random(20260814)
    attempts, conns, chgs = [], [], []
    for case in range(N_CASES):
        a, c, g = _gen_case(rng, case)
        attempts += a
        conns += c
        chgs += g
    att = pd.DataFrame(attempts).drop(columns=["port_id_expected"])
    return att, pd.DataFrame(conns), pd.DataFrame(chgs)


def test_fact_visits_matches_reference_compile_on_random_attempts(spark, generated):
    att_pdf, conn_pdf, chg_pdf = generated

    att = spark.createDataFrame(
        att_pdf,
        schema="charge_attempt_id string, charger_id string, connector_id string, "
        "charge_attempt_start_ts timestamp, charge_attempt_stop_ts timestamp, "
        "id_tag string, energy_transferred_kwh double, is_successful boolean, "
        "preparing_ingested_ts timestamp, incremental_ts timestamp",
    ).selectExpr(
        "*",
        "cast(array() as array<string>) as id_tags",
        "cast(array() as array<string>) as id_tag_statuses",
    )
    pipe = Pipeline(
        spark=spark,
        sources={},
        overrides={
            "fact_charge_attempts": att,
            "dim_connectors": spark.createDataFrame(conn_pdf),
            "dim_chargers": spark.createDataFrame(chg_pdf),
        },
    )
    from pyspark.sql import functions as F

    out = pipe.ref("fact_visits").select(
        "visit_id", "location_key", "driver_key", "first_port_key",
        "last_port_key", "location_id",
        F.array_join("charger_ids", "|").alias("charger_ids"),
        "id_tag", "visit_start_ts", "visit_end_ts", "charge_attempt_count",
        F.array_join("charge_attempt_ids", "|").alias("charge_attempt_ids"),
        F.col("total_energy_transferred_kwh").cast("double").alias(
            "total_energy_transferred_kwh"
        ),
        "first_charge_attempt_id", "last_charge_attempt_id", "first_charger_id",
        "last_charger_id", "first_port_id", "last_port_id", "is_successful",
        "grouping_key", "visit_duration_minutes", "incremental_ts",
    )

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.register("gen_attempts", att_pdf)
    con.register("gen_connectors", conn_pdf)
    con.register("gen_chargers", chg_pdf)
    oracle = f"""
    WITH fact_charge_attempts AS (
        SELECT * FROM gen_attempts
    ),
    int_connectors AS (SELECT * FROM gen_connectors),
    int_chargers AS (SELECT * FROM gen_chargers),
    {_VISITS_CTES}
    {_FV_ORACLE_TAIL}
    """
    problems = compare(out, con, oracle)
    assert not problems, problems[:5]
    # sanity: the generator actually produced multi-attempt visits and
    # inferred tags (otherwise the boundaries were never exercised)
    rows = out.collect()
    assert sum(r.charge_attempt_count > 1 for r in rows) > 50
    assert sum(r.id_tag is not None for r in rows) > 50
    assert len(rows) > N_CASES
