"""Local replica of the driver gate with per-entry timing.

Usage: python tools/gate_check.py [--sf-dir DIR] [name ...]
Runs every (or the named) catalog entries' Spark query and DuckDB oracle
at sf0.01, compares exactly, prints per-entry wall seconds for both
engines.  The timing column is the tool for keeping the whole catalog
inside the driver's gate budget.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from kwwhat_spark.queries import REGISTRY  # noqa: E402
from kwwhat_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark()
    con = duckdb_connection(args.sf_dir)
    names = args.names or list(REGISTRY)
    failures = []
    t_total = time.time()
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            df = q.spark(spark, args.sf_dir)
            if q.oracle is None:
                n = df.count()
                t_spark = time.time() - t0
                print(f"{name:40s} rows-only n={n:<8d} spark={t_spark:6.2f}s", flush=True)
                spark.catalog.clearCache()
                continue
            problems = compare(df, con, q.oracle)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {e!r}"[:300]]
        t_spark = time.time() - t0
        status = "ok" if not problems else "FAIL"
        print(f"{name:40s} {status:4s} total={t_spark:6.2f}s", flush=True)
        for p in problems:
            failures.append(name)
            print(f"    {p[:400]}", flush=True)
        spark.catalog.clearCache()
    print(f"TOTAL {time.time() - t_total:.1f}s  failures={sorted(set(failures))}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
