from kwwhat_spark.streaming.ocpp import (
    read_ocpp_stream,
    stage_stream,
    stream_interval_data,
    stream_request_confirmations,
    stream_status_changes,
    stream_visit_sessions,
)

__all__ = [
    "read_ocpp_stream",
    "stage_stream",
    "stream_interval_data",
    "stream_request_confirmations",
    "stream_status_changes",
    "stream_visit_sessions",
]
