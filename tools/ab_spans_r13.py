#!/usr/bin/env python
"""r13 probe: isolate dedup_substring_spans' sf0.1 regression terms.

VERDICT r12 next-round #1: the query regressed 0.78 -> 1.10 (driver,
contended) / 0.84-0.96 (quiet) at sf0.1 and anti-scales (8-core beats
32-core). Two r12 changes touched it: xxhash64 array gram keys
(change 6) and the size-derived widen target (change 8). This probe
runs the 2x2 grid interleaved in ONE session, each cycle gated on the
scan-floor canary being in the steady band, so the comparison is
same-window by construction:

  A  xx  + widen()            (shipped r12)
  B  xx  + repartition(32)    (change 6 only)
  C  md5 + widen()            (change 8 only)
  D  md5 + repartition(32)    (r11 shape)

Usage: python tools/ab_spans_r13.py [--cycles N] [--sf-dir DIR]
Env: SPARK_GRAFT_CPUS as usual.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kwwhat_spark.session import get_spark  # noqa: E402
from kwwhat_spark.sources.testdata import load_table  # noqa: E402
from kwwhat_spark.operators.scaling import widen  # noqa: E402
from tools.probe_span_key import strip_variant, md5_key, xx_key  # noqa: E402

STEADY_CANARY_MAX = 0.32


def canary(spark, sf_dir):
    def once():
        t0 = time.perf_counter()
        load_table(spark, sf_dir, "lineitem").agg(
            F.count("*"), F.sum("l_quantity")
        ).collect()
        return time.perf_counter() - t0

    return round(min(once(), once()), 4)


def wait_settled(spark, sf_dir, budget=300.0):
    t0 = time.perf_counter()
    c = canary(spark, sf_dir)
    while c > STEADY_CANARY_MAX and time.perf_counter() - t0 < budget:
        time.sleep(15)
        c = canary(spark, sf_dir)
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--settle-budget", type=float, default=300.0)
    args = ap.parse_args()

    spark = get_spark(app_name="ab-spans-r13")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf_dir
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")

    def docs_widened():
        return widen(load_table(spark, sf_dir, "documents"))

    def docs_forced32():
        return load_table(spark, sf_dir, "documents").repartition(32)

    variants = {
        "A_xx_widen": lambda: strip_variant(docs_widened(), xx_key),
        "B_xx_rep32": lambda: strip_variant(docs_forced32(), xx_key),
        "C_md5_widen": lambda: strip_variant(docs_widened(), md5_key),
        "D_md5_rep32": lambda: strip_variant(docs_forced32(), md5_key),
    }

    # Warm: JVM, parquet footers, python workers (none here, pure JVM).
    load_table(spark, sf_dir, "documents").count()
    results: dict[str, list[float]] = {k: [] for k in variants}
    canaries = []
    order = list(variants)
    for cyc in range(args.cycles):
        c = wait_settled(spark, sf_dir, args.settle_budget)
        canaries.append(c)
        # rotate order each cycle so no variant always runs first
        rot = order[cyc % len(order):] + order[: cyc % len(order)]
        for name in rot:
            spark.sparkContext.setJobDescription(f"spans-ab {name} cyc{cyc}")
            t0 = time.perf_counter()
            variants[name]().write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 4)
            results[name].append(dt)
            spark.catalog.clearCache()
        print(
            json.dumps({"cycle": cyc, "canary": c,
                        "times": {k: results[k][-1] for k in rot}}),
            flush=True,
        )
    summary = {
        "cpus": cpus,
        "canaries": canaries,
        "mins": {k: min(v) for k, v in results.items()},
        "medians": {k: sorted(v)[len(v) // 2] for k, v in results.items()},
        "all": results,
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
