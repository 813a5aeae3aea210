from kwwhat_spark.plans.incremental import IncrementalRunner, ParquetStateStore  # noqa: F401
