"""OCPP pipeline queries (kwwhat model DAG) — populated as models land."""

from __future__ import annotations
