#!/usr/bin/env python
"""Benchmark: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
on local[$SPARK_GRAFT_CPUS].

When $SPARK_GRAFT_SF_DIR is unset, the headline scale is sf1: the
driver's sf0.1 parquet replicated 10x with key offsets into /tmp/sf1
(built on demand, ~15 s, deterministic — tools/scale_testdata.py).  At
sf0.1 both engines are constant-overhead-bound and the numbers measure
session startup, not plans; at sf1 they are data-bound (BASELINE.md
"honest comparison needs sf>=1").

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kwwhat_spark.queries import REGISTRY  # noqa: E402
from kwwhat_spark.session import get_spark  # noqa: E402


def _default_sf_dir() -> str:
    """sf1 replicated from the driver's sf0.1 on first use.  Lives on
    tmpfs when available: this rig's disk page cache is capped near
    1 GB, so disk-resident parquet re-reads every run at bimodal latency
    (measured 0.2 s vs 2.2 s for the same scan) — tmpfs makes bench
    numbers measure plans, not the neighbors' I/O."""
    dst = "/dev/shm/sf1" if os.path.isdir("/dev/shm") else "/tmp/sf1"
    from tools.scale_testdata import TABLES, build

    if not all(os.path.exists(os.path.join(dst, f"{t}.parquet")) for t in TABLES):
        build(10, "/root/testdata/sf0.1", dst)
    return dst


def _stage_to_tmpfs(sf_dir: str) -> str:
    """Copy a disk-resident sf dir to tmpfs before benching.  Same
    bytes, same queries — only the storage latency changes, and on this
    rig disk reads are the dominant noise source (see _default_sf_dir).
    No-op when the dir already sits on tmpfs or tmpfs is absent."""
    if sf_dir.startswith("/dev/shm") or not os.path.isdir("/dev/shm"):
        return sf_dir
    import shutil

    names = [n for n in os.listdir(sf_dir) if n.endswith(".parquet")]
    # tmpfs is RAM: staging an arbitrarily large sf dir can OOM the rig.
    # Require the copy to fit with 2 GiB of headroom, else bench from
    # the source dir (slower but safe) and say so.
    need = sum(os.path.getsize(os.path.join(sf_dir, n)) for n in names)
    free = shutil.disk_usage("/dev/shm").free
    if need + (2 << 30) > free:
        print(
            f"# bench: not staging {sf_dir} to tmpfs "
            f"({need >> 20} MiB needed, {free >> 20} MiB free); reading from disk",
            file=sys.stderr,
        )
        return sf_dir
    dst = os.path.join("/dev/shm/bench-cache", os.path.basename(sf_dir.rstrip("/")))
    for name in names:
        s, d = os.path.join(sf_dir, name), os.path.join(dst, name)
        if not os.path.exists(d) or os.path.getmtime(d) < os.path.getmtime(s):
            os.makedirs(dst, exist_ok=True)
            shutil.copy2(s, d)
    return dst if os.path.isdir(dst) else sf_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR") or _default_sf_dir()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_dir = _stage_to_tmpfs(sf_dir)
    spark = get_spark(app_name="kwh-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    names = [n for n, q in REGISTRY.items() if q.headline] or list(REGISTRY)
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    REGISTRY[names[0]].spark(spark, sf_dir).count()

    # Two runs per query, report the best: the first run includes plan
    # compilation and cold page cache, and back-to-back runs drift with
    # GC pressure — the steady-state minimum is the reproducible number
    # (the per-run spread is environment noise, not plan behavior).
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        # Operators persist() intermediates for within-query reuse
        # (shingle stages, tokenized stages, graph edge lists); Spark's
        # CacheManager keys them by logical plan, so they survive the
        # query and pile up across the headline set — storage memory
        # fills and every later query degrades under eviction + GC
        # pressure (measured: dedup_substring_spans 11.7 s inside a full
        # bench run vs 1.1 s hot in isolation). Dropping the cache
        # between queries restores per-query isolation.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
