#!/usr/bin/env python
"""OCPP fleet-scale sweep one decade up (VERDICT r8 #7): replicate the
demo seed N× (default 500× ≈ 8.8M log rows) and time the three
execution paths over it:

  batch        full-refresh build of every registered model (the r1
               1×/10×/50× table's shape, extended)
  stream       the stateful change-point stream, one availableNow pass
  incremental  the two-batch status→attempts chain through the
               partition-scoped state store

Replication rewrites charge_point_id / location_id with a per-replica
tag (join grain stays per-charger: fan-out is wider, never deeper) and
retags each message uuid's first segment so request↔confirmation
correlation ids stay replica-unique.

Usage: python tools/fleet_scale.py [N] [build|batch|stream|incremental|all]
Seed CSVs land in /tmp/fleet_{N}x; results print as JSON lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = "/root/reference/demo/seeds"


def build(n: int, dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")
    rep = f"lpad(CAST(r AS VARCHAR), 4, '0')"
    retag_id = f"regexp_replace(id, '^CH-', 'CH-' || {rep} || '-')"
    retag_cp = f"regexp_replace(charge_point_id, '^CH-', 'CH-' || {rep} || '-')"
    retag_loc = f"regexp_replace(location_id, '^LOC-', 'LOC-' || {rep} || '-')"
    # uuid first segment -> replica-unique hex tag (keeps uuid shape)
    retag_msg = (
        "regexp_replace(msg, '[0-9a-f]{8}-', "
        f"lpad(format('{{:x}}', r), 8, '0') || '-', 'g')"
    )
    con.execute(
        f"""COPY (
          SELECT timestamp, {retag_id} AS id, action, {retag_msg} AS msg
          FROM read_csv('{SEED}/ocpp_1_6_synthetic_logs_14d.csv', header=true,
                        auto_detect=true, all_varchar=true)
          CROSS JOIN (SELECT UNNEST(range({n})) AS r)
        ) TO '{dst}/ocpp_1_6_synthetic_logs_14d.csv' (HEADER, QUOTE '"')"""
    )
    con.execute(
        f"""COPY (
          SELECT {retag_cp} AS charge_point_id, {retag_loc} AS location_id,
                 commissioned_ts, decommissioned_ts
          FROM read_csv('{SEED}/chargers.csv', header=true, all_varchar=true)
          CROSS JOIN (SELECT UNNEST(range({n})) AS r)
        ) TO '{dst}/chargers.csv' (HEADER)"""
    )
    con.execute(
        f"""COPY (
          SELECT {retag_cp} AS charge_point_id, port_id
          FROM read_csv('{SEED}/ports.csv', header=true, all_varchar=true)
          CROSS JOIN (SELECT UNNEST(range({n})) AS r)
        ) TO '{dst}/ports.csv' (HEADER)"""
    )
    con.execute(
        f"""COPY (
          SELECT {retag_cp} AS charge_point_id, port_id, connector_id, connector_type
          FROM read_csv('{SEED}/connectors.csv', header=true, all_varchar=true)
          CROSS JOIN (SELECT UNNEST(range({n})) AS r)
        ) TO '{dst}/connectors.csv' (HEADER)"""
    )
    rows = con.execute(
        f"SELECT COUNT(*) FROM read_csv('{dst}/ocpp_1_6_synthetic_logs_14d.csv', header=true, all_varchar=true)"
    ).fetchone()[0]
    print(json.dumps({"step": "build", "n": n, "log_rows": rows, "dst": dst}))


def run_batch(spark, seed_dir: str) -> dict:
    from kwwhat_spark.models import MODELS, Pipeline
    from kwwhat_spark.sources.ocpp import load_ocpp_sources

    t0 = time.perf_counter()
    pipe = Pipeline(
        spark=spark,
        sources=load_ocpp_sources(spark, seed_dir=seed_dir),
        cache_views=("stg_ocpp_logs",),
    )
    per_model = {}
    for name in MODELS:
        t1 = time.perf_counter()
        pipe.ref(name).write.format("noop").mode("overwrite").save()
        per_model[name] = round(time.perf_counter() - t1, 2)
    wall = round(time.perf_counter() - t0, 2)
    pipe.unpersist_all()
    slowest = dict(sorted(per_model.items(), key=lambda kv: -kv[1])[:6])
    return {"step": "batch", "wall_s": wall, "n_models": len(per_model),
            "slowest": slowest}


def run_stream(spark, seed_dir: str) -> dict:
    import shutil
    import tempfile

    from kwwhat_spark.streaming.ocpp import (
        read_ocpp_stream,
        stage_stream,
        stream_status_changes,
    )

    d = tempfile.mkdtemp(prefix="fleet-stream-")
    shutil.copy(
        os.path.join(seed_dir, "ocpp_1_6_synthetic_logs_14d.csv"),
        os.path.join(d, "logs.csv"),
    )
    try:
        t0 = time.perf_counter()
        staged = stage_stream(read_ocpp_stream(spark, d))
        q = (
            stream_status_changes(staged)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(d, "_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        return {"step": "stream", "wall_s": wall}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def run_incremental(spark, seed_dir: str) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kwwhat_spark.plans.incremental import IncrementalRunner, PartitionedStateStore
    from kwwhat_spark.sources.ocpp import load_ocpp_sources

    chain = [
        "int_status_changes", "int_connector_latest_status",
        "int_transactions", "int_connector_preparing", "fact_charge_attempts",
    ]
    sources = load_ocpp_sources(spark, seed_dir=seed_dir)
    state_dir = tempfile.mkdtemp(prefix="fleet-inc-")
    try:
        store = PartitionedStateStore(spark, state_dir)
        runner = IncrementalRunner(spark, store)
        t0 = time.perf_counter()
        batch1 = {
            **sources,
            "raw_ocpp_logs": sources["raw_ocpp_logs"].filter(
                F.col("timestamp") < "2025-10-08T00"
            ),
        }
        runner.run_batch(batch1, models=chain)
        b1 = round(time.perf_counter() - t0, 2)
        t1 = time.perf_counter()
        runner.run_batch(sources, models=chain)
        b2 = round(time.perf_counter() - t1, 2)
        rows = store.read("fact_charge_attempts").count()
        return {"step": "incremental", "batch1_s": b1, "batch2_s": b2,
                "attempts_rows": rows}
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    what = sys.argv[2] if len(sys.argv) > 2 else "all"
    dst = f"/tmp/fleet_{n}x"
    if what in ("build", "all") and not os.path.exists(
        os.path.join(dst, "connectors.csv")
    ):
        build(n, dst)
    if what == "build":
        return
    from kwwhat_spark.session import get_spark

    spark = get_spark(app_name=f"fleet-{n}x")
    spark.sparkContext.setLogLevel("ERROR")
    steps = ("batch", "stream", "incremental") if what == "all" else (what,)
    for step in steps:
        rec = {"n": n, "load_start": os.getloadavg()}
        fn = {"batch": run_batch, "stream": run_stream,
              "incremental": run_incremental}[step]
        rec.update(fn(spark, dst))
        rec["load_end"] = os.getloadavg()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
