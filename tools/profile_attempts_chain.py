"""Phase-by-phase wall profile of ocpp_incremental_attempts_chain.

The entry is the most expensive row of the full gate (18.5 s at the
sf0.01 steady band; 66 s in the throttled sf0.1 snapshot).  It replays
two 5-model batch lifecycles through PartitionedStateStore, so the wall
is a sum of per-model plan builds, merge checkpoints, partition
collects, and dynamic-overwrite writes.  This tool times each phase so
an optimization targets the measured term, not a guess.

Usage: python tools/profile_attempts_chain.py [--repeat N]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def run_once(spark, timings: dict[str, float]) -> int:
    from kwwhat_spark.plans.incremental import (  # noqa: E402
        PartitionedStateStore,
    )
    from kwwhat_spark.queries.ocpp_pipeline import (  # noqa: E402
        _CHAIN_SKIP_COLS,
        _INC_CUTOFF,
        _staged_cutoff,
        _staged_logs,
    )
    from kwwhat_spark.sources.ocpp import load_ocpp_sources  # noqa: E402

    def mark(key: str, t0: float) -> float:
        t1 = time.perf_counter()
        timings[key] = timings.get(key, 0.0) + (t1 - t0)
        return t1

    chain = [
        "int_status_changes", "int_connector_latest_status",
        "int_transactions", "int_connector_preparing", "fact_charge_attempts",
    ]
    t0 = time.perf_counter()
    sources = load_ocpp_sources(spark)
    t0 = mark("load_sources", t0)
    staged_full = _staged_logs(spark)  # session checkpoint (cached after 1st)
    staged_cut = _staged_cutoff(spark)
    t0 = mark("staged_views", t0)

    state_dir = tempfile.mkdtemp(prefix="kwh-prof-chain-")
    try:
        store = PartitionedStateStore(spark, state_dir)
        batch1 = {
            **sources,
            "raw_ocpp_logs": sources["raw_ocpp_logs"].filter(
                F.col("timestamp") < _INC_CUTOFF
            ),
        }

        # Inline run_batch with per-model instrumentation.
        for bi, (batch, staged) in enumerate(
            [(batch1, staged_cut), (sources, staged_full)], start=1
        ):
            from kwwhat_spark.models.base import Pipeline
            from kwwhat_spark.plans.incremental import UNIQUE_KEYS

            this_dfs = {}
            t0 = time.perf_counter()
            for name in chain:
                prior = store.read(name)
                if prior is not None:
                    this_dfs[name] = prior
            t0 = mark(f"b{bi}.state_reads", t0)
            pipe = Pipeline(
                spark=spark,
                sources=batch,
                this_dfs=this_dfs,
                overrides={"stg_ocpp_logs": staged},
                cache_views=("stg_ocpp_logs",),
            )
            for name in chain:
                t0 = time.perf_counter()
                out = pipe.ref(name)
                t0 = mark(f"b{bi}.{name}.ref", t0)
                store.merge(name, out, UNIQUE_KEYS[name])
                t0 = mark(f"b{bi}.{name}.merge", t0)
                pipe.overrides[name] = store.read(name)
            t0 = time.perf_counter()
            pipe.unpersist_all()
            t0 = mark(f"b{bi}.unpersist", t0)

        t0 = time.perf_counter()
        from kwwhat_spark.queries.ocpp_pipeline import mart_projection

        out = mart_projection(
            "fact_charge_attempts", store.read("fact_charge_attempts")
        ).drop(*_CHAIN_SKIP_COLS)
        n = out.localCheckpoint(eager=True).count()
        mark("final_checkpoint", t0)
        return n
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from kwwhat_spark.session import get_spark

    spark = get_spark(app_name="profile-attempts-chain")
    spark.sparkContext.setLogLevel("ERROR")

    for i in range(args.repeat):
        timings: dict[str, float] = {}
        t_all = time.perf_counter()
        n = run_once(spark, timings)
        total = time.perf_counter() - t_all
        print(f"\n=== run {i + 1}: total {total:.2f}s rows={n} ===")
        for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
            print(f"  {v:7.3f}s  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
