#!/usr/bin/env python
"""Decisive floor experiment for the two remaining >2x scan-agg entries
(VERDICT r8 #4): is the residual gap Spark's stage model (engine
constant) or plan headroom in the shipped two-level aggregation?

Method — three probes per entry, same data, hot runs:

  scan      the cheapest plan that still reads the aggregated columns
            (sum of one column, filter included) — the parquet-decode +
            scheduling floor; nothing can beat this
  shipped   the production two-level LONG-partial plan (the gate entry)
  arrow     the SAME aggregation as a single mapInPandas/Arrow pass:
            numpy groupby partials per Arrow batch, tiny final groupBy.
            NOT a shipping candidate (floats, no codegen, no AQE) — a
            floor probe for "what would a fused pipeline cost on this
            executor model"

Reading: shipped ≈ arrow ≈ scan → the gap to DuckDB is the engine's
stage/decode constant, not the aggregation plan. arrow « shipped →
plan headroom. DuckDB hot time printed for the ratio context.

Usage: python tools/floor_probe_agg.py [SF_DIR] — default /dev/shm/sf100.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F


def _t(fn, trials=2):
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def probe_intervals(spark, con, sf_dir):
    from kwwhat_spark.queries import REGISTRY
    from kwwhat_spark.sources.testdata import load_table

    out = {"entry": "intervals_15min"}
    ev = lambda: load_table(spark, sf_dir, "events")

    out["scan_s"] = _t(lambda: _noop(ev().agg(F.sum("value"), F.count(F.lit(1)))))
    out["shipped_s"] = _t(
        lambda: _noop(REGISTRY["intervals_15min"].spark(spark, sf_dir))
    )

    def arrow_pass():
        import pandas as pd

        e = ev().select(
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 900).alias("b"),
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("v100"),
        )

        def agg(batches):
            for pdf in batches:
                g = pdf.groupby(["b", "event_type"], sort=False).agg(
                    s=("v100", "sum"), nv=("v100", "count"), n=("v100", "size")
                )
                yield g.reset_index()

        part = e.mapInPandas(
            agg, schema="b long, event_type string, s long, nv long, n long"
        )
        final = part.groupBy("b", "event_type").agg(
            (F.sum("s").cast("double") / 100.0 / F.sum("nv")).alias("avg_value"),
            F.sum("n").alias("sample_count"),
        )
        _noop(final)

    out["arrow_s"] = _t(arrow_pass)
    out["duck_s"] = _t(lambda: con.execute(REGISTRY["intervals_15min"].oracle).fetchall())
    return out


def probe_pricing(spark, con, sf_dir):
    from kwwhat_spark.queries import REGISTRY
    from kwwhat_spark.sources.testdata import load_table

    out = {"entry": "pricing_summary"}
    li = lambda: load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("timestamp")

    out["scan_s"] = _t(
        lambda: _noop(
            li().filter(F.col("l_shipdate") <= cutoff).agg(
                F.sum("l_quantity"), F.count(F.lit(1))
            )
        )
    )
    out["shipped_s"] = _t(
        lambda: _noop(REGISTRY["pricing_summary"].spark(spark, sf_dir))
    )

    def arrow_pass():
        import numpy as np
        import pandas as pd

        e = (
            li()
            .filter(F.col("l_shipdate") <= cutoff)
            .select(
                "l_returnflag", "l_linestatus",
                F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q"),
                F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("p"),
                F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
                F.round(F.col("l_tax") * 100, 0).cast("long").alias("t"),
            )
        )

        def agg(batches):
            for pdf in batches:
                pdf["dp"] = pdf["p"] * (100 - pdf["d"])
                pdf["ch"] = pdf["dp"] * (100 + pdf["t"])
                g = pdf.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
                    q=("q", "sum"), b=("p", "sum"), dp=("dp", "sum"),
                    ch=("ch", "sum"), di=("d", "sum"), n=("q", "size")
                )
                yield g.reset_index()

        part = e.mapInPandas(
            agg,
            schema="l_returnflag string, l_linestatus string, q long, b long, "
                   "dp long, ch long, di long, n long",
        )
        final = part.groupBy("l_returnflag", "l_linestatus").agg(
            (F.sum(F.col("q").cast("decimal(28,0)")) / 100).alias("sum_qty"),
            (F.sum(F.col("ch").cast("decimal(38,0)")) / 1_000_000).alias("sum_charge"),
            F.sum("n").alias("count_order"),
        )
        _noop(final)

    out["arrow_s"] = _t(arrow_pass)
    out["duck_s"] = _t(lambda: con.execute(REGISTRY["pricing_summary"].oracle).fetchall())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf100"
    from kwwhat_spark.queries import REGISTRY  # noqa: F401 (registry import)
    from kwwhat_spark.session import get_spark
    from kwwhat_spark.sources.testdata import TESTDATA_TABLES

    spark = get_spark(app_name="floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("SET enable_progress_bar=false")
    con.execute(f"SET threads={os.cpu_count() or 8}")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for probe in (probe_intervals, probe_pricing):
        rec = {"sf_dir": sf_dir, "load_start": os.getloadavg()}
        rec.update(probe(spark, con, sf_dir))
        rec["load_end"] = os.getloadavg()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
