"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count + column names + values
(order-insensitive, columns sorted by name — the driver's documented
comparison shape). Values are compared EXACTLY (the catalog is designed
for bit-identical cross-engine output); near-misses are reported
distinctly so float-determinism regressions are visible.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

from kwwhat_spark.sources.testdata import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    norm = sorted(tuple(_cell(r[i]) for i in order) for r in rows)
    return cols, norm


def spark_result(df) -> tuple[list[str], list[tuple[str, ...]]]:
    return normalize(df.columns, [tuple(r) for r in df.collect()])


def duck_result(con, sql: str) -> tuple[list[str], list[tuple[str, ...]]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return normalize(cols, cur.fetchall())


def compare(spark_df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(con, oracle)
    problems = []
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if s_rows != d_rows:
        diff_idx = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        sample = [(s_rows[i], d_rows[i]) for i in diff_idx[:3]]
        extra_s = [r for r in s_rows[:2000] if r not in set(d_rows)][:3] if len(s_rows) != len(d_rows) else []
        problems.append(
            f"values differ on {len(diff_idx)} aligned rows; first: {sample}; spark-only sample: {extra_s}"
        )
    return problems
