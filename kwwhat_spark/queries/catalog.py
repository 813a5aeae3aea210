"""Query registry: name → (spark fn, duckdb oracle, citation).

Contract (driver's __spark_entry__ protocol):
  - spark fn: (SparkSession, sf_dir) -> DataFrame
  - oracle: ANSI SQL DuckDB can run on pre-registered views of the same
    parquet tables; None → driver records a weaker rows-only check.
  - Column names must match exactly between the two (the driver sorts
    columns by name before value-hashing).

Determinism rules used throughout the catalog:
  - float aggregates are computed as decimal-cast sums (order-independent,
    exact) and only cast to double at the end — both engines then produce
    bit-identical doubles;
  - arrays are sorted + joined to strings before output;
  - every ordering has a total tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    cite: str  # reference file:line whose operator family this exercises
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, cite: str = "", headline: bool = False):
    """Decorator registering a catalog query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, cite=cite, headline=headline)
        return fn

    return deco
