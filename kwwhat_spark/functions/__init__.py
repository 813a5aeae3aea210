from kwwhat_spark.functions.core import (  # noqa: F401
    array_concat_nullaware,
    array_first,
    bucket_15min,
    datediff_boundary,
    surrogate_key,
)
