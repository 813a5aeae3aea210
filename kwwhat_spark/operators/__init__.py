from kwwhat_spark.operators.windows import (  # noqa: F401
    change_points,
    gaps_and_islands,
    lag_lead_neighbors,
    sessionize,
)
