"""Typed one-pass OCPP payload parsing shared by the log-derived models.

Reference: the reference's per-action extraction map
(macros/payload_extractions.sql:131) — it extracts each field with a
per-field json_extract. At fleet scale that re-parses the payload string
once PER FIELD: the 500× sweep (BASELINE.md round 9) showed the top two
models JSON-extraction-bound (int_transactions 63 s,
int_connector_preparing 56 s) for exactly this reason.

Spark shape: one `from_json` into a named struct column, fields read as
struct accesses. Two traps, both measured (r10, 4M rows × 9 fields):

- per-field `get_json_object` — one full Jackson parse per field
  (≥4.4 s);
- `from_json(...).getField(...)` INLINE in the same projection — the
  OptimizeJsonExprs rule prunes the schema per getField, splitting the
  single parse into N single-field parses (~5 s, no better);
- `withColumn` / a dedicated select binding the struct ONCE, fields read
  from the bound column — one parse (~1.3 s, 3-4× faster).

So: always bind the parsed struct to a column (PARSED_COL) and read
fields from it; never call parsed_payload() inline per field.

Trap 4 (r11, measured at the 500× fleet): never parse AFTER a fanout
join. The request↔confirmation uid_window_join multiplies rows under
the repeated-uuid pathology (370k preparing events → ~125M joined rows;
136k transaction events → ~68M), and a parse placed after it runs once
per fanout COPY of the payload, not once per payload. Extract the
needed scalars on each side BEFORE the join: int_connector_preparing's
events_conf stage 85.7 → 5.7 s (15×), int_transactions' CALLRESULT
parse 25.0 → 5.1 s (5×). The old "only matched confirmations pay the
parse" rationale inverts exactly when the join fans out — |join output|
≫ |all CALLRESULTs|.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Union of every scalar field the log-derived models read
# (payload_extractions.sql:131). All strings: the reference extracts text
# and casts downstream; numeric JSON values round-trip verbatim through
# Jackson's raw-token-to-string path (verified identical to
# get_json_object for numbers, nested objects, nulls, and malformed
# payloads). MeterValues' nested meterValue array is NOT here — only
# models/meter_values.py pays for materializing it, via its own schema.
OCPP_PAYLOAD_SCHEMA = StructType(
    [
        StructField("connectorId", StringType()),
        StructField("transactionId", StringType()),
        StructField("idTag", StringType()),
        StructField("timestamp", StringType()),
        StructField("reason", StringType()),
        StructField("meterStart", StringType()),
        StructField("meterStop", StringType()),
        StructField("status", StringType()),
        StructField("errorCode", StringType()),
        StructField(
            "idTagInfo",
            StructType(
                [
                    StructField("status", StringType()),
                    StructField("idTag", StringType()),
                ]
            ),
        ),
    ]
)


def parsed_payload(src: str = "payload") -> Column:
    """The typed payload struct. Bind it with withColumn/select ONCE and
    read fields from the bound column (see module docstring)."""
    return F.from_json(src, OCPP_PAYLOAD_SCHEMA)


def payload_field(name: str, src: str = "payload") -> Column:
    """ONE field via an explicitly schema-pruned parse — for columns that
    become JOIN KEYS or live NEXT TO the whole bound struct in the same
    projection. Two measured traps this avoids (r10, 500× fleet):

    - join-key pushdown: isnotnull(<key>) inlines the key's expression
      into a per-row Filter; if the key reads from the bound struct the
      filter re-runs the FULL schema parse (the optimizer's own pruning
      rewrites the filter copy, but the projection copy next to a kept
      whole struct is NOT pruned);
    - projection pushdown through a join duplicates the struct alias
      into derived columns, leaving two full parses in one project
      (JsonToStructs is CodegenFallback, so codegen CSE does not merge
      them).

    A single-field schema costs what one get_json_object costs — cheap
    enough to run inside filters."""
    field = OCPP_PAYLOAD_SCHEMA[name]
    return F.from_json(src, StructType([field])).getField(name)
