#!/usr/bin/env python
"""A/B probe: time a subset of catalog queries in one fresh session,
optionally with extra Spark conf, noop-sink methodology identical to
bench.py (N trials, min, clearCache between queries).

Usage:
  python tools/ab_probe.py --queries q1,q2 [--sf-dir DIR] [--trials 3]
                           [--conf k=v --conf k=v ...] [--label NAME]

Prints one JSON line per run so same-window A/Bs can be diffed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kwwhat_spark.queries import REGISTRY  # noqa: E402
from kwwhat_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    spark = get_spark(app_name=f"ab-probe-{args.label}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    # Warm JVM + parquet footers (bench.py parity).
    REGISTRY[names[0]].spark(spark, args.sf_dir).count()

    timings, trials = {}, {}
    for name in names:
        runs = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        trials[name] = runs
        timings[name] = min(runs)
        spark.catalog.clearCache()
    with open("/proc/loadavg") as f:
        load = [float(x) for x in f.read().split()[:3]]
    print(json.dumps({
        "label": args.label,
        "conf": extra,
        "queries": timings,
        "trials": trials,
        "total": round(sum(timings.values()), 4),
        "loadavg": load,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
