"""Driver-facing query catalog.

Importing this package populates the registry: one entry per operator
family from SURVEY.md §2 (plus the LLM-pipeline operators), each with a
Spark implementation and, where SQL-expressible, a DuckDB oracle.
"""

from kwwhat_spark.queries.catalog import REGISTRY, Query, query  # noqa: F401

# Modules self-register on import.
from kwwhat_spark.queries import tpch  # noqa: E402,F401
from kwwhat_spark.queries import tpch_suite  # noqa: E402,F401
from kwwhat_spark.queries import events  # noqa: E402,F401
from kwwhat_spark.queries import analytics  # noqa: E402,F401
from kwwhat_spark.queries import llm  # noqa: E402,F401
from kwwhat_spark.queries import curation  # noqa: E402,F401
from kwwhat_spark.queries import ocpp_pipeline  # noqa: E402,F401
