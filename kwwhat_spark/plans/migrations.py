"""Source/warehouse migrations expressed as DataFrame jobs.

Reference: migrations/001_split_ports.sql — a phase-staged warehouse
migration (Phase 1 create new tables without touching the original;
validate; Phase 2 swap; Phase 3 drop only after sign-off). The engine
analog keeps the same discipline:

 - `split_ports` (this module) is Phase 1: derive the entity-grain
   tables from the legacy connector-grain table, corrections included,
   without mutating anything. The caller writes them next to the legacy
   table, validates (the split outputs must reproduce the current seed
   tables — tests/test_migrations.py), then swaps readers.
 - Persisted STATE schema changes go through the state stores
   (plans/incremental.py): additive columns evolve automatically on
   merge (typed NULL backfill, like Delta mergeSchema); destructive
   changes require an explicit `store.migrate(name, transform)`, which
   writes a new version and leaves the previous one for rollback —
   Phase 2/3 staging for state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Data corrections shipped inside the reference migration
# (001_split_ports.sql:44-48): connector types fixed during the split.
CONNECTOR_CORRECTIONS: tuple[tuple[str, str, str, str], ...] = (
    # (charge_point_id, port_id, connector_id, corrected_type)
    ("CH-001", "2", "4", "CHAdeMO"),
)


def split_ports(legacy_ports: DataFrame) -> dict[str, DataFrame]:
    """Phase 1 of 001_split_ports.sql: one connector-grain table →
    chargers / ports / connectors entity tables (distinct projections),
    with the migration's data corrections applied to connectors.

    Input columns (the legacy denormalized grain): charge_point_id,
    location_id, commissioned_ts, decommissioned_ts, port_id,
    connector_id, connector_type.
    """
    chargers = legacy_ports.select(
        "charge_point_id", "location_id", "commissioned_ts", "decommissioned_ts"
    ).distinct()
    ports = legacy_ports.select("charge_point_id", "port_id").distinct()
    connectors = legacy_ports.select(
        "charge_point_id", "port_id", "connector_id", "connector_type"
    ).distinct()
    for cp, port, conn, corrected in CONNECTOR_CORRECTIONS:
        connectors = connectors.withColumn(
            "connector_type",
            F.when(
                (F.col("charge_point_id") == cp)
                & (F.col("port_id") == port)
                & (F.col("connector_id") == conn),
                F.lit(corrected),
            ).otherwise(F.col("connector_type")),
        )
    return {"chargers": chargers, "ports": ports, "connectors": connectors}


def validate_split(migrated: dict[str, DataFrame], expected: dict[str, DataFrame]) -> list[str]:
    """The validate step between Phase 1 and the swap: every migrated
    table must match the expected entity table exactly (row-set
    equality). Returns mismatch descriptions; empty = safe to swap."""
    problems = []
    for name, exp in expected.items():
        got = migrated[name].select(*exp.columns)
        extra = got.exceptAll(exp).count()
        missing = exp.exceptAll(got).count()
        if extra or missing:
            problems.append(f"{name}: {extra} unexpected rows, {missing} missing rows")
    return problems
