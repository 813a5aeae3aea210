#!/usr/bin/env python
"""Quantify each engine's per-query constant floor so the scan-agg
bench ratios can be floor-adjusted with data (VERDICT r2 item 4).

Floor definition: the SAME physical shape as a scan-agg query —
scan → grouped aggregate → one exchange → tiny result — run over a
trivially small table (region, 5 rows), so the measured time is pure
per-query machinery (driver scheduling, codegen/compile, stage launch,
result fetch) with ~zero data work. Also reports an empty-plan round
trip and a bare 6M-row scan-sum for context.

For the scan-agg headline entries it then reports both the raw hot
ratio and the floor-subtracted ratio:
    adj = (spark_t - spark_floor) / (duck_t - duck_floor)

Usage: python tools/measure_floor.py [SF_DIR] — defaults to the sf1
replica on tmpfs (built on demand, same as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from kwwhat_spark.queries import REGISTRY
from kwwhat_spark.session import get_spark
from kwwhat_spark.sources.testdata import TESTDATA_TABLES, load_table

SCAN_AGG_ENTRIES = [
    "pricing_summary", "join_fact_fact", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier", "tpch_q10_returned_items",
    "tpch_q18_large_orders", "intervals_15min", "similarity_topk",
]

N_REPS = 5  # best-of-N hot; the rig is CPU-noisy (BASELINE.md)


def best_of(fn, n=N_REPS) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/dev/shm/sf1" if os.path.isdir("/dev/shm") else "/tmp/sf1"
    )
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        from tools.scale_testdata import build

        build(10, "/root/testdata/sf0.1", sf_dir)

    spark = get_spark(app_name="measure-floor")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={os.cpu_count() or 8}")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    from pyspark.sql import functions as F

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    region = load_table(spark, sf_dir, "region")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # warm-up: footers, codegen caches, JIT
    noop(region.groupBy("r_name").count())
    lineitem.count()
    con.execute("SELECT count(*) FROM lineitem").fetchall()

    floors = {
        "spark_empty": best_of(lambda: noop(spark.range(1))),
        "spark_floor_scan_agg_shape": best_of(
            lambda: noop(region.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")))
        ),
        "spark_bare_scan_sum_6m": best_of(
            lambda: noop(lineitem.agg(F.sum("l_quantity").alias("s")))
        ),
        "duck_empty": best_of(lambda: con.execute("SELECT 1").fetchall()),
        "duck_floor_scan_agg_shape": best_of(
            lambda: con.execute(
                "SELECT r_name, count(*) AS n FROM region GROUP BY r_name"
            ).fetchall()
        ),
        "duck_bare_scan_sum_6m": best_of(
            lambda: con.execute("SELECT sum(l_quantity) FROM lineitem").fetchall()
        ),
    }

    s_floor = floors["spark_floor_scan_agg_shape"]
    d_floor = floors["duck_floor_scan_agg_shape"]
    entries = {}
    for name in SCAN_AGG_ENTRIES:
        q = REGISTRY[name]
        t_s = best_of(lambda: noop(q.spark(spark, sf_dir)), 3)
        spark.catalog.clearCache()
        t_d = best_of(lambda: con.execute(q.oracle).fetchall(), 3)
        raw = round(t_s / t_d, 2)
        adj = round(
            max(t_s - s_floor, 1e-4) / max(t_d - d_floor, 1e-4), 2
        )
        entries[name] = {
            "spark_sec": t_s, "duck_sec": t_d,
            "ratio_raw": raw, "ratio_floor_adjusted": adj,
        }
        print(f"{name:32s} spark={t_s:7.3f} duck={t_d:7.3f} "
              f"raw={raw:6.2f}x adj={adj:6.2f}x", flush=True)

    print(json.dumps({"sf_dir": sf_dir, "floors": floors, "entries": entries}))
    spark.stop()


if __name__ == "__main__":
    main()
