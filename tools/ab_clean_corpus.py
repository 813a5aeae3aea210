#!/usr/bin/env python
"""Quiet-machine A/B for the pipeline_clean_corpus r7->r8 bench tick-up
(VERDICT r8 #2): run ONE query's hot trials against the current tree —
invoke this once from a worktree checked out at each round tip and
compare. Prints loadavg so a contaminated run is self-evident.

Usage: python tools/ab_clean_corpus.py [SF_DIR] [N_TRIALS] [QUERY]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    name = sys.argv[3] if len(sys.argv) > 3 else "pipeline_clean_corpus"

    from kwwhat_spark.queries import REGISTRY
    from kwwhat_spark.session import get_spark

    spark = get_spark(app_name="ab-clean-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    q = REGISTRY[name]
    trials = []
    for _ in range(n):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        trials.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "trials": trials,
        "hot_min": min(trials[1:]) if len(trials) > 1 else trials[0],
        "loadavg": os.getloadavg(),
    }))


if __name__ == "__main__":
    main()
