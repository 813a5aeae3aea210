#!/usr/bin/env python
"""BPE APPLY-path throughput at scale (VERDICT r9 #5): the learn half is
gated; this measures re-segmentation of the word-TYPE table + the
broadcast join back to the token stream on a large corpus.

Reports wall seconds and tokens/s for apply_bpe (one Arrow pass over
distinct types; per-type cost, not per-token), plus the stage floors
(pre-token explode+count alone; types distinct alone) so a non-linear
stage is attributable.

Usage: python tools/bpe_apply_floor.py [SF_DIR] [N_MERGES] [word|byte]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf10"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    level = sys.argv[3] if len(sys.argv) > 3 else "word"

    from kwwhat_spark.operators.bpe import apply_bpe, learn_bpe_merges
    from kwwhat_spark.operators.scaling import widen
    from kwwhat_spark.session import get_spark
    from kwwhat_spark.sources.testdata import load_table

    spark = get_spark(app_name="bpe-apply-floor")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Merge table learned on the SMALL canonical corpus (the gated shape)
    # — apply throughput is what scales with data, not the learn loop.
    small = load_table(spark, "/root/testdata/sf0.01", "documents")
    t0 = time.perf_counter()
    merges = learn_bpe_merges(small, "text", n_merges=n_merges, level=level)
    learn_s = round(time.perf_counter() - t0, 1)

    docs = widen(load_table(spark, sf_dir, "documents"))
    rec = {"sf_dir": sf_dir, "level": level, "n_merges": len(merges),
           "learn_small_s": learn_s, "load_start": os.getloadavg()}

    tok = docs.select(
        F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("__w")
    )
    t0 = time.perf_counter()
    n_tokens = tok.count()
    rec["scan_tokens_s"] = round(time.perf_counter() - t0, 1)
    rec["n_tokens"] = n_tokens

    t0 = time.perf_counter()
    n_types = tok.distinct().count()
    rec["types_distinct_s"] = round(time.perf_counter() - t0, 1)
    rec["n_types"] = n_types

    t0 = time.perf_counter()
    noop(apply_bpe(docs, merges, "doc_id", "text", level=level))
    rec["apply_s"] = round(time.perf_counter() - t0, 1)
    rec["tokens_per_s"] = int(n_tokens / rec["apply_s"])
    rec["load_end"] = os.getloadavg()
    print(json.dumps(rec), flush=True)
    with open("/tmp/bpe_apply_floor.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
