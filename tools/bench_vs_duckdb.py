#!/usr/bin/env python
"""Hot Spark-vs-DuckDB comparison on the headline catalog queries.

For each headline query with an oracle, runs the Spark plan and the
oracle SQL twice each on the same parquet dir and reports the second
(hot) time. Usage: python tools/bench_vs_duckdb.py [SF_DIR] [QUERY ...]
— with explicit QUERY names, measures those instead of the headline set.
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
from kwwhat_spark.sources.testdata import TESTDATA_TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/dev/shm/sf1" if os.path.isdir("/dev/shm") else "/tmp/sf1"
    )
    spark = get_spark(app_name="bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET threads={os.cpu_count() or 8}")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    wanted = sys.argv[2:]
    unknown = [n for n in wanted if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; available: {sorted(REGISTRY)}")
    out = {}
    for name, q in REGISTRY.items():
        if wanted and name not in wanted:
            continue
        if not wanted and not q.headline:
            continue
        spark_hot = None
        for _ in range(2):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark_hot = time.perf_counter() - t0
        duck_hot = None
        if q.oracle:
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(q.oracle).fetchall()
                duck_hot = time.perf_counter() - t0
        out[name] = {
            "spark_hot_s": round(spark_hot, 3),
            "duckdb_hot_s": round(duck_hot, 3) if duck_hot is not None else None,
        }
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
