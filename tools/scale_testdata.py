#!/usr/bin/env python
"""Replicate the driver's sf0.1 testdata N× with key offsets, producing a
larger scale factor for data-bound benchmarking (BASELINE.md's "honest
comparison needs sf>=1" note).

Replication preserves join semantics instead of duplicating keys:
  - orders/lineitem/customer replicate with per-replica key offsets
    (orderkey/custkey shift by replica × (max+1)), so orders⋈lineitem
    fan-out stays 1:N and customer grain stays unique;
  - nation/region/supplier/part stay fixed (dimensions don't scale with
    fact volume — per-dim fan-in grows, which is the realistic shape);
  - events replicate with event_id/user_id offsets (user population
    scales with volume);
  - documents/embeddings replicate with id offsets and a per-replica
    text/vector perturbation so near-dup structure is preserved instead
    of every row becoming an exact duplicate.

Usage: python tools/scale_testdata.py [N] [SRC] [DST]
Defaults: N=10, SRC=/root/testdata/sf0.1, DST=/tmp/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb


TABLES = (
    "region", "nation", "supplier", "part", "customer", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    build(n, src, dst)


def build(n: int = 10, src: str = "/root/testdata/sf0.1", dst: str = "/tmp/sf1") -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")
    # The 10-way UNION over a 60M-row lineitem at the sf10->sf100 step
    # buffered ~95 GB and got OOM-killed (r10): COPY preserves insertion
    # order by default, holding every branch's output in memory. Row
    # order is irrelevant here (replicas are key-shifted), so stream it
    # under a hard cap instead.
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{os.environ.get('SCALE_MEM', '24GB')}'")

    def copy(table: str, select_tpl: str | None = None) -> None:
        path = f"{src}/{table}.parquet"
        out = f"{dst}/{table}.parquet"
        if select_tpl is None:
            con.execute(f"COPY (SELECT * FROM read_parquet('{path}')) TO '{out}' (FORMAT PARQUET)")
        else:
            parts = " UNION ALL ".join(select_tpl.format(i=i, path=path) for i in range(n))
            con.execute(f"COPY ({parts}) TO '{out}' (FORMAT PARQUET)")
        rows = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {rows} rows")

    for dim in ("region", "nation", "supplier", "part"):
        copy(dim)

    ko = con.execute(f"SELECT MAX(o_orderkey)+1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
    kc = con.execute(f"SELECT MAX(c_custkey)+1 FROM read_parquet('{src}/customer.parquet')").fetchone()[0]
    ke = con.execute(f"SELECT MAX(event_id)+1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    ku = con.execute(f"SELECT MAX(user_id)+1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    kd = con.execute(f"SELECT MAX(doc_id)+1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
    kv = con.execute(f"SELECT MAX(vec_id)+1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]

    copy("customer",
         "SELECT c_custkey + {i}*" + str(kc) + " AS c_custkey, c_name, c_nationkey, "
         "c_acctbal, c_mktsegment FROM read_parquet('{path}')")
    copy("orders",
         "SELECT o_orderkey + {i}*" + str(ko) + " AS o_orderkey, "
         "o_custkey + {i}*" + str(kc) + " AS o_custkey, o_orderstatus, o_totalprice, "
         "o_orderdate, o_orderpriority FROM read_parquet('{path}')")
    copy("lineitem",
         "SELECT l_orderkey + {i}*" + str(ko) + " AS l_orderkey, l_partkey, l_suppkey, "
         "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
         "l_linestatus, l_shipdate FROM read_parquet('{path}')")
    copy("events",
         "SELECT event_id + {i}*" + str(ke) + " AS event_id, ts, "
         "user_id + {i}*" + str(ku) + " AS user_id, event_type, value, props "
         "FROM read_parquet('{path}')")
    copy("documents",
         "SELECT doc_id + {i}*" + str(kd) + " AS doc_id, "
         "CASE WHEN {i} = 0 THEN text ELSE text || ' r{i}' END AS text, "
         "lang, source, n_chars FROM read_parquet('{path}')")
    copy("embeddings",
         "SELECT vec_id + {i}*" + str(kv) + " AS vec_id, "
         "list_transform(embedding, x -> x + {i}*1e-4) AS embedding, label "
         "FROM read_parquet('{path}')")


if __name__ == "__main__":
    main()
