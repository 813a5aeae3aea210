from kwwhat_spark.metrics.semantic import (
    METRICS,
    SEMANTIC_MODELS,
    query_metrics,
)

__all__ = ["METRICS", "SEMANTIC_MODELS", "query_metrics"]
