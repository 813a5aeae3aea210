"""Pipeline variables.

Mirrors the reference's dbt vars (reference dbt_project.yml:46-66) — these
are *semantic* constants (thresholds that define attempts/visits/outages),
not tuning knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineVars:
    # First-run lower bound for incremental batch windows
    # (dbt_project.yml:53).
    start_processing_date: str = "2025-10-01"
    # Incremental batch window size (dbt_project.yml:54-56): 3 months.
    incremental_window_months: int = 3
    # Late-data look-back buffer, minutes (typical 30; downtime uses 1440,
    # fact_downtime_daily.sql:17).
    buffer_minutes: int = 30
    downtime_buffer_minutes: int = 1440
    # OCPP message-type ids (dbt_project.yml:62-65).
    call_message_type_id: str = "2"
    callresult_message_type_id: str = "3"
    callerror_message_type_id: str = "4"
    # CALLERROR surface: the reference classifies only 2 vs 3 and nulls
    # the payload for type 4 (stg_ocpp_logs.sql:30-36) even though its
    # generator emits [4, uid, errorCode, errorDescription, {details}]
    # (seeds/prompt.txt:13). Off by default for column-level parity;
    # on, staging adds error_code / error_description / error_details.
    extract_callerror: bool = False
    # Request→confirmation correlation window, seconds
    # (int_status_changes.sql:84).
    message_response_interval_seconds: int = 15
    # Transaction-flow retry window, seconds (int_connector_preparing.sql:100-106).
    transaction_message_retry_interval_seconds: int = 45
    # Preparing↔transaction association tolerance, seconds
    # (fact_charge_attempts.sql:132-143).
    authorize_time_threshold_seconds: int = 300
    # Offline-outage gap threshold, seconds (dbt_project.yml:60,
    # int_offline_outages.sql:181).
    heartbeat_interval_seconds: int = 300
    # Visit sessionization gaps, minutes (fact_visits.sql:91,188).
    visit_unauthenticated_gap_minutes: int = 2
    visit_authenticated_gap_minutes: int = 30
    # Success rule energy floor, kWh (fact_charge_attempts.sql:272-280).
    min_successful_energy_kwh: float = 0.1
    # Valid stop reasons for a successful attempt (fact_charge_attempts.sql:10).
    valid_stop_reasons: tuple[str, ...] = ("Local", "Remote", "EVDisconnected")
    # Charge-point-initiated actions that prove the charger is online
    # (int_offline_outages.sql:10-15).
    charge_point_actions: tuple[str, ...] = (
        "Authorize",
        "BootNotification",
        "DataTransfer",
        "DiagnosticStatusNotification",
        "FirmwareStatusNotification",
        "Heartbeat",
        "MeterValues",
        "StartTransaction",
        "StatusNotification",
        "StopTransaction",
    )
    # Actions participating in the transaction pipeline
    # (int_transactions.sql:10-13).
    transaction_actions: tuple[str, ...] = (
        "StartTransaction",
        "StopTransaction",
        "RemoteStartTransaction",
        "RemoteStopTransaction",
        "MeterValues",
    )
    # Actions participating in the preparing pipeline
    # (int_connector_preparing.sql:10-13).
    preparing_actions: tuple[str, ...] = (
        "StatusNotification",
        "Authorize",
        "StartTransaction",
        "StopTransaction",
        "RemoteStartTransaction",
        "RemoteStopTransaction",
    )
    # Connector status enum (intermediate.yml:23-25).
    connector_statuses: tuple[str, ...] = (
        "Available",
        "Preparing",
        "Charging",
        "SuspendedEVSE",
        "SuspendedEV",
        "Finishing",
        "Reserved",
        "Unavailable",
        "Faulted",
    )
    # Sentinel for unidentified drivers (int_driver_aggregates.sql).
    unknown_driver_sentinel: str = "__UNKNOWN__"
    # Surrogate-key null sentinel (dbt_utils.generate_surrogate_key).
    surrogate_key_null_sentinel: str = "_dbt_utils_surrogate_key_null_"
    # dim_dates span (dim_dates.sql:8-14).
    date_spine_start: str = "2020-01-01"
    date_spine_end: str = "2050-12-31"


VARS = PipelineVars()
