"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count + column names + dtypes + values
(order-insensitive, columns sorted by name — the driver's documented
comparison shape). Values are compared EXACTLY (the catalog is designed
for bit-identical cross-engine output); near-misses are reported
distinctly so float-determinism regressions are visible.

The dtype gate mirrors what the driver's pandas conversion sees, so the
two classes that slipped past this harness in round 2 cannot hide again:
 - DuckDB TIMESTAMPTZ vs Spark naive TIMESTAMP (sliding_window_users):
   tz-awareness is part of the canonical dtype AND of the rendered value.
 - DuckDB HUGEINT (integer SUM) vs Spark BIGINT: HUGEINT converts to
   float64 in pandas while Spark emits int64 — canonicalized as
   float-vs-int, a mismatch.
NaN is rendered as "NaN", distinct from NULL.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import re
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
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        # tz-awareness is significant: an aware timestamp renders with
        # its offset so a TIMESTAMPTZ oracle can never value-match a
        # naive Spark timestamp.
        return v.isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


# --- canonical dtypes: the pandas dtype family the driver's comparison sees

_SPARK_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date", "binary": "binary",
}


def _canon_spark(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "float"  # pandas converts both to float64
    if dtype.startswith(("array", "map", "struct")):
        return "array"
    return _SPARK_CANON.get(dtype, dtype)


def _canon_duck(dtype: str) -> str:
    d = dtype.upper()
    # Container types first: BIGINT[] / TIMESTAMP[] would otherwise hit
    # the INT / TIMESTAMP substring checks below and canonicalize to a
    # scalar family, falsely (mis)matching against Spark's 'array'.
    if re.search(r"\[\]$", d) or d.startswith(("LIST", "ARRAY", "STRUCT", "MAP")):
        return "array"
    if d == "HUGEINT" or d == "UHUGEINT":
        return "float"  # pandas float64 — will NOT match Spark's int64
    if "WITH TIME ZONE" in d:
        return "timestamptz"
    if d.startswith("DECIMAL") or d in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if "INT" in d:
        return "int"
    if d == "TIMESTAMP" or d.startswith("TIMESTAMP"):
        return "timestamp"
    if d in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if d == "BOOLEAN":
        return "bool"
    if d == "DATE":
        return "date"
    if d == "BLOB":
        return "binary"
    return d.lower()


def normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    norm = sorted(tuple(_cell(r[i]) for i in order) for r in rows)
    return cols, norm


def spark_result(df) -> tuple[list[str], list[tuple[str, ...]]]:
    return normalize(df.columns, [tuple(r) for r in df.collect()])


def duck_result(con, sql: str) -> tuple[list[str], list[tuple[str, ...]], dict[str, str]]:
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = {c: _canon_duck(str(t)) for c, t in zip(cols, rel.types)}
    n_cols, n_rows = normalize(cols, rel.fetchall())
    return n_cols, n_rows, types


def compare(spark_df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows, d_types = duck_result(con, oracle)
    problems = []
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return problems
    s_types = {name: _canon_spark(dtype) for name, dtype in spark_df.dtypes}
    for c in s_cols:
        if s_types.get(c) != d_types.get(c):
            problems.append(
                f"dtype differs on {c!r}: spark={s_types.get(c)} duckdb={d_types.get(c)}"
            )
    if problems:
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
