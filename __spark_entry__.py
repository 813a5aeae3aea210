"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (plus the
                LLM-pipeline operators), keyed by catalog name.
oracle_sql()  — matching DuckDB SQL for the correctness gate.

The driver verifies ~50 entries per round, in iteration order — so
iteration order decides what gets driver-proven.  Rounds 1-3 used a
hand-maintained priority tuple; it went stale the moment it was written
(the round-3 verdict found ~71 entries whose last driver check predated
the code they now run).  This version derives the order from the
driver's own artifacts: every CORRECTNESS_r{N}.json at the repo root IS
the ledger of (entry, round, green?).  Order:

  1. entries RED at their most recent driver check (fixes need confirming),
  2. entries never driver-checked in any round (usually new this round),
  3. green entries, stalest last-check first (regression rotation).

No hand maintenance: next round's CORRECTNESS file reorders automatically.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kwwhat_spark.queries import REGISTRY


def _ledger() -> dict[str, tuple[int, bool]]:
    """entry name -> (round, green) at its most recent driver check.

    Green means the strongest check the entry supports passed: a
    value-hash match, or a non-null row count for the documented
    rows-only ("no_oracle") entries.
    """
    led: dict[str, tuple[int, bool]] = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            green = bool(res.get("hash_match")) or (
                res.get("err") == "no_oracle" and res.get("spark_rows") is not None
            )
            prev = led.get(name)
            if prev is None or rnd >= prev[0]:
                led[name] = (rnd, green)
    return led


def _ordered_names() -> list[str]:
    names = list(REGISTRY)
    led = _ledger()

    def key(n: str):
        got = led.get(n)
        if got is None:
            return (1, 0, n)  # never checked → right after the reds
        rnd, green = got
        if not green:
            return (0, rnd, n)  # red at latest check → first
        return (2, rnd, n)  # green → stalest first

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
