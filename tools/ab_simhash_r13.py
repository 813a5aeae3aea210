#!/usr/bin/env python
"""r13 probe: vectorize the prod SimHash bit votes in numpy (guide §4.2).

simhash64's non-replayable path runs SIXTY-FOUR F.aggregate HOF passes
per doc in Catalyst's INTERPRETED evaluator — the same pathology the
r12 MinHash signature fix (change 4) removed. This probe A/Bs the
expression form against a mapInPandas that receives the JVM-computed
xxhash64 token hashes and does the 64 bit votes vectorized over the
batch (np.add.reduceat of per-bit ones-counts), with a bit-exact parity
check first: votes are exact integer sums, so the simhash longs must be
IDENTICAL, not just equivalent.

Usage: python tools/ab_simhash_r13.py [--cycles N] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from kwwhat_spark.functions.text import let_, simhash64  # noqa: E402
from kwwhat_spark.operators.scaling import widen  # noqa: E402
from kwwhat_spark.session import get_spark  # noqa: E402
from kwwhat_spark.sources.testdata import load_table  # noqa: E402
from tools.ab_spans_r13 import wait_settled  # noqa: E402


from kwwhat_spark.operators.dedup import _simhash64_votes_fn  # noqa: E402


def simhash_stage_expr(df, id_col="doc_id", text_col="text"):
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return widen(df).select(
        F.col(id_col).alias("doc_id"), simhash64(toks).alias("simhash")
    )


def simhash_stage_numpy(df, id_col="doc_id", text_col="text"):
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    hashed = widen(df).select(
        F.col(id_col).alias("doc_id"),
        let_(toks, lambda ts: F.transform(ts, lambda t: F.xxhash64(t))).alias(
            "toks"
        ),
    )
    id_type = hashed.schema["doc_id"].dataType
    return hashed.mapInPandas(
        _simhash64_votes_fn(),
        schema=T.StructType(
            [
                T.StructField("doc_id", id_type),
                T.StructField("simhash", T.LongType()),
            ]
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--settle-budget", type=float, default=300.0)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="ab-simhash-r13")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf_dir

    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm

    if not args.skip_parity:
        # Bit-exact parity incl. an empty/whitespace-only doc edge case.
        edge = spark.createDataFrame(
            [(10**9 + 1, ""), (10**9 + 2, "   "), (10**9 + 3, "a a b")],
            "doc_id long, text string",
        )
        for src_name, src in (("corpus", docs), ("edge", edge)):
            a = {
                r["doc_id"]: r["simhash"]
                for r in simhash_stage_expr(src).collect()
            }
            b = {
                r["doc_id"]: r["simhash"]
                for r in simhash_stage_numpy(src).collect()
            }
            mism = {k for k in a if a[k] != b.get(k)} | (set(a) ^ set(b))
            print(
                json.dumps(
                    {"parity": src_name, "rows": len(a), "mismatches": len(mism)}
                ),
                flush=True,
            )
            if mism:
                raise SystemExit(f"PARITY FAIL on {sorted(mism)[:5]}")

    variants = {
        "expr": lambda: simhash_stage_expr(docs),
        "numpy": lambda: simhash_stage_numpy(docs),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    canaries = []
    order = list(variants)
    for cyc in range(args.cycles):
        c = wait_settled(spark, sf_dir, args.settle_budget)
        canaries.append(c)
        rot = order[cyc % len(order):] + order[: cyc % len(order)]
        for name in rot:
            spark.sparkContext.setJobDescription(f"simhash-ab {name} cyc{cyc}")
            t0 = time.perf_counter()
            variants[name]().write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        print(
            json.dumps(
                {"cycle": cyc, "canary": c,
                 "times": {k: results[k][-1] for k in rot}}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {"mins": {k: min(v) for k, v in results.items()}, "all": results,
             "canaries": canaries}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
