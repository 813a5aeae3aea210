"""kwh-spark: PySpark-native analytics engine with the capabilities of
appspace/kwwhat (OCPP EV-charging analytics), built Spark-first.

Layout:
  session    — SparkSession factory tuned for local[32] and cluster scale
  config     — pipeline variables (mirrors reference dbt_project.yml:46-66)
  functions  — scalar/array/json/text helpers (exact-semantics ports)
  operators  — reusable distributed operators (windows, interval joins,
               sessionization, dedup, similarity)
  sources    — readers for OCPP logs, hardware CSVs, driver testdata
  models     — the kwwhat transformation DAG (staging→intermediate→marts)
  queries    — driver-facing query catalog with DuckDB oracle SQL
  metrics    — semantic layer (models/metrics, MetricFlow-equivalent)
  bi         — deterministic chat-BI routing over the semantic layer
  streaming  — Structured Streaming variants of the pipeline
  plans      — incremental engine (state stores, merge strategies)
"""

__version__ = "0.1.0"
