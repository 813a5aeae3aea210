"""Generated-stream property harness for the gated streaming entries:
adversarial event frames (exact-30-minute gaps, one-second boundary
neighbors, duplicate timestamps, lone tail events, shuffled file order)
run through the REAL streaming pipelines (availableNow → memory sink via
the catalog entries themselves) and compared against each entry's own
DuckDB oracle over the same parquet — the same end-to-end contract the
driver gate enforces, on inputs the fixture never produces.

The fleet-DAG fuzzer (tests/test_ocpp_dag_property.py) caught two real
bugs the demo-seed gate missed; this applies the same method to the
streaming corpus entries, pinning the probe-verified boundary semantics
(session merge at ts == session_end; append-mode emission at
end <= watermark) against regression.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest

from kwwhat_spark.queries import REGISTRY
from tests.oracle_harness import compare

ENTRIES = ("stream_session_windows", "stream_dedup_keys", "stream_window_counts")


def _events_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    return con


def _gen_frame(seed: int) -> pd.DataFrame:
    """Adversarial event stream: per-user chains engineered around the
    30-minute session gap and the day/15-min bucket edges."""
    rng = random.Random(seed)
    base = pd.Timestamp("2025-03-01 00:00:00")
    rows = []
    eid = 0
    for user in range(1, 7):
        t = base + pd.Timedelta(minutes=rng.randrange(0, 600))
        for _ in range(rng.randrange(1, 14)):
            kind = rng.randrange(6)
            if kind == 0:
                gap = pd.Timedelta(minutes=30)  # exactly the session gap
            elif kind == 1:
                gap = pd.Timedelta(minutes=30, seconds=1)  # just over
            elif kind == 2:
                gap = pd.Timedelta(minutes=29, seconds=59)  # just under
            elif kind == 3:
                gap = pd.Timedelta(0)  # duplicate timestamp
            elif kind == 4:
                gap = pd.Timedelta(minutes=rng.randrange(1, 29))
            else:
                gap = pd.Timedelta(hours=rng.randrange(2, 30))  # day spill
            t = t + gap
            rows.append(
                (
                    eid,
                    t,
                    user,
                    rng.choice(["view", "click", "error", "purchase"]),
                    round(rng.uniform(-5, 100), 2),
                    "{}",
                )
            )
            eid += 1
    # one lone tail event: the maximum timestamp anchors the watermark,
    # and its own session must be withheld by append mode.
    rows.append((eid, base + pd.Timedelta(days=3), 99, "view", 1.0, "{}"))
    rng.shuffle(rows)  # file order ≠ event-time order
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    return pdf


@pytest.mark.full
@pytest.mark.parametrize("seed", [11, 23, 47])
def test_streaming_entries_match_oracle_on_generated_streams(spark, seed):
    pdf = _gen_frame(seed)
    tmp = tempfile.mkdtemp(prefix="kwh-stream-prop-")
    try:
        # Write the fixture the way the DRIVER writes testdata (pandas,
        # naive ns timestamps) — a Spark write now emits INT64 micros
        # with isAdjustedToUTC (session outputTimestampType), which
        # DuckDB types as TIMESTAMPTZ and the dtype-strict compare
        # rightly rejects against the naive testdata convention.
        pdf.to_parquet(f"{tmp}/events.parquet", index=False, coerce_timestamps="us")
        con = _events_con(tmp)
        for name in ENTRIES:
            q = REGISTRY[name]
            problems = compare(q.spark(spark, tmp), con, q.oracle)
            assert not problems, f"{name} seed={seed}: " + " | ".join(problems)
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
