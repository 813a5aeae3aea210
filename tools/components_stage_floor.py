#!/usr/bin/env python
"""Per-stage floor decomposition of minhash_lsh_components at scale
(VERDICT r8 #1: any heavy entry gets component floors, the q5
treatment). Times each stage of the star-edge components plan in
isolation by materializing to a noop sink:

  sig      shingle -> minhash signature -> banded keys (the expression
           hash pipeline; suspected interpreted-lambda heavy)
  edges    + the (band_idx, band_hash) window min -> star edges
  closure  + pointer-jumping connected components
  full     the complete entry (edges + closure + final left join)

Usage: python tools/components_stage_floor.py [SF_DIR] [prod|replayable]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf100"
    variant = sys.argv[2] if len(sys.argv) > 2 else "replayable"
    replay = variant == "replayable"
    num_hashes, bands = (16, 4) if replay else (32, 8)

    from kwwhat_spark.operators.dedup import minhash_banded
    from kwwhat_spark.operators.graph import connected_components, star_components
    from kwwhat_spark.operators.scaling import widen
    from kwwhat_spark.queries import REGISTRY
    from kwwhat_spark.session import get_spark
    from kwwhat_spark.sources.testdata import load_table
    from pyspark.sql import Window

    spark = get_spark(app_name="components-floor")
    spark.sparkContext.setLogLevel("ERROR")

    def t(fn, trials=int(os.environ.get('FLOOR_TRIALS', '2'))):
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def banded_df():
        # The SHIPPED shape: shared helper with minhash_lsh_components
        # (explode + codegen groupBy-min), so stage floors track the
        # production plan (ADVICE r9: the old array-lambda build here
        # no longer measured what ships).
        docs = widen(load_table(spark, sf_dir, "documents"))
        return minhash_banded(
            docs, "doc_id", "text", 3, num_hashes, bands, replayable_hash=replay
        )

    def edges_df():
        w = Window.partitionBy("band_idx", "band_hash")
        return (
            banded_df()
            .withColumn("root", F.min("doc_id").over(w))
            .filter(F.col("doc_id") != F.col("root"))
            .select("doc_id", "root")
        )

    rec = {"sf_dir": sf_dir, "variant": variant,
           "load_start": os.getloadavg()}
    rec["scan_s"] = t(lambda: noop(
        load_table(spark, sf_dir, "documents").agg(F.sum(F.length("text")))))
    rec["sig_s"] = t(lambda: noop(banded_df()))
    rec["edges_s"] = t(lambda: noop(edges_df()))
    # Shipped closure = star_components (root-graph contraction);
    # raw pointer-jumping kept as a comparison floor.
    rec["closure_s"] = t(
        lambda: noop(star_components(edges_df(), "doc_id", "root"))
    )
    if os.environ.get("FLOOR_RAW_CC"):
        rec["closure_raw_cc_s"] = t(
            lambda: noop(connected_components(edges_df(), "doc_id", "root"))
        )
    name = ("dedup_minhash_components_replayable" if replay
            else "dedup_minhash_components")
    rec["full_s"] = t(lambda: noop(REGISTRY[name].spark(spark, sf_dir)))
    rec["load_end"] = os.getloadavg()
    print(json.dumps(rec), flush=True)
    with open("/tmp/components_floor.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
