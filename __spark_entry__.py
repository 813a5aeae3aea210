"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (plus the
                LLM-pipeline operators), keyed by catalog name.
oracle_sql()  — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kwwhat_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
