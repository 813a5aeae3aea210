#!/usr/bin/env python
"""Probe: strip_duplicate_spans gram key — md5(concat_ws) string vs
xxhash64(token-slice array) long.

Checks VALUE PARITY first (sorted full-output compare of the shipped
operator vs an inline old-key variant at the given sf), then times the
two headline consumers with the bench methodology.

Usage: python tools/probe_span_key.py [--sf-dir DIR] [--skip-parity]
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


def strip_variant(df, key_expr_builder, k=8, min_count=2):
    """Re-implements strip_duplicate_spans' shape with a pluggable gram
    key so both variants run in ONE session for an exact compare."""
    toks = df.select(
        "doc_id",
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "").alias("__t"),
    )
    base = toks.withColumn("__n", F.size("__t")).persist()
    posts = base.filter(F.col("__n") >= k).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("__n") - (k - 1))).alias("__pos"),
        "__t",
    ).select("doc_id", "__pos", key_expr_builder(k).alias("__gh"))
    dup_grams = (
        posts.groupBy("__gh").agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count).select("__gh")
    )
    covered = (
        posts.join(dup_grams, "__gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_starts"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(
                F.sequence(F.col("__pos"), F.col("__pos") + (k - 1))
            )))).alias("__idxs"),
        )
    )
    joined = base.join(covered, ["doc_id"], "left")
    idxs = F.coalesce(F.col("__idxs"), F.array().cast("array<int>"))
    return joined.select(
        "doc_id",
        F.col("__n").alias("n_tokens"),
        F.coalesce(F.col("n_dup_starts"), F.lit(0)).alias("n_dup_starts"),
        F.when(F.col("__n") > 0, F.size(idxs) / F.col("__n"))
        .otherwise(F.lit(0.0)).cast("double").alias("dup_span_frac"),
        F.concat_ws(
            " ", F.filter(F.col("__t"), lambda t, i: ~F.array_contains(idxs, i + 1))
        ).alias("cleaned_text"),
    )


def md5_key(k):
    return F.md5(F.concat_ws(" ", F.slice(F.col("__t"), F.col("__pos"), k)))


def xx_key(k):
    return F.xxhash64(F.slice(F.col("__t"), F.col("__pos"), k))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="probe-span-key")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")
    docs.count()  # warm

    if not args.skip_parity:
        a = sorted(map(tuple, strip_variant(docs, md5_key).collect()))
        spark.catalog.clearCache()
        b = sorted(map(tuple, strip_variant(docs, xx_key).collect()))
        spark.catalog.clearCache()
        assert a == b, f"PARITY FAIL: {len(a)} vs {len(b)} rows or value diff"
        print(f"# parity OK: {len(a)} rows identical at {args.sf_dir}")

    out = {}
    for label, keyfn in [("md5", md5_key), ("xx", xx_key)] * 2:  # interleaved
        runs = out.setdefault(label, [])
        t0 = time.perf_counter()
        strip_variant(docs, keyfn).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
    for _ in range(args.trials - 2):
        for label, keyfn in [("md5", md5_key), ("xx", xx_key)]:
            t0 = time.perf_counter()
            strip_variant(docs, keyfn).write.format("noop").mode("overwrite").save()
            out[label].append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
    with open("/proc/loadavg") as f:
        load = [float(x) for x in f.read().split()[:3]]
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "trials": out,
        "min": {k: min(v) for k, v in out.items()},
        "loadavg": load,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
