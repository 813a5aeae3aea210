"""DeltaStateStore merge logic under a mocked DeltaTable API (VERDICT r6
item 9): the container has no delta-spark, so the null-safe merge-key
construction and the matched/not-matched routing are asserted against a
fake `delta.tables` module instead of skipping entirely. The real
end-to-end convergence test (tests/test_incremental.py) still runs
wherever delta-spark is installed.
"""

from __future__ import annotations

import json
import os
import sys
import types
from unittest.mock import MagicMock

import pytest


@pytest.fixture()
def fake_delta(monkeypatch):
    """Inject a fake `delta.tables.DeltaTable` importable module."""
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    table = MagicMock(name="DeltaTableInstance")
    delta_table_cls = MagicMock(name="DeltaTable")
    delta_table_cls.forPath.return_value = table
    tables_mod.DeltaTable = delta_table_cls
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    return delta_table_cls, table


def test_first_merge_falls_through_to_write(fake_delta, tmp_path, spark):
    from kwwhat_spark.plans.incremental import DeltaStateStore

    store = DeltaStateStore(spark, str(tmp_path))
    writes = []
    store.write = lambda name, df, batch_id=None: writes.append((name, df, batch_id))
    df = spark.range(3)
    store.merge("m", df, ["id"], batch_id=7)
    # No _delta_log yet -> read() is None -> initial state is a plain write.
    assert writes == [("m", df, 7)]
    fake_delta[0].forPath.assert_not_called()


def test_merge_condition_is_null_safe_on_every_key(fake_delta, tmp_path, spark):
    from kwwhat_spark.plans.incremental import DeltaStateStore

    delta_table_cls, table = fake_delta
    store = DeltaStateStore(spark, str(tmp_path))
    os.makedirs(tmp_path / "m" / "_delta_log")  # existing state
    # read() would spark.read.format("delta") — unavailable here; the
    # merge path only needs its not-None signal.
    store.read = lambda name: object()

    df = spark.createDataFrame(
        [("c1", None, 1)], "charger_id string, port_id string, v int"
    )
    store.merge("m", df, ["charger_id", "port_id"], batch_id=3)

    delta_table_cls.forPath.assert_called_once_with(spark, str(tmp_path / "m"))
    merge_call = table.alias.return_value.merge
    (src, cond), _ = merge_call.call_args
    # Null-safe equality on EVERY key: port_id/phase are nullable in the
    # reference schema, and plain = would silently never match NULL keys,
    # duplicating rows on re-merge.
    assert cond == "t.`charger_id` <=> s.`charger_id` AND t.`port_id` <=> s.`port_id`"
    chained = merge_call.return_value
    chained.whenMatchedUpdateAll.assert_called_once_with()
    chained.whenMatchedUpdateAll.return_value.whenNotMatchedInsertAll.assert_called_once_with()
    (
        chained.whenMatchedUpdateAll.return_value.whenNotMatchedInsertAll.return_value.execute
    ).assert_called_once_with()
    # Batch marker recorded after the merge.
    assert json.load(open(tmp_path / "m.batch.json")) == {"batch_id": 3}


def test_constructor_requires_delta(tmp_path, spark):
    # Without the fake module the probe import must raise (the container
    # has no delta-spark; re-verified round 7).
    import importlib.util

    if importlib.util.find_spec("delta") is not None:
        pytest.skip("delta-spark installed here; probe is for bare containers")
    from kwwhat_spark.plans.incremental import DeltaStateStore

    with pytest.raises(ImportError):
        DeltaStateStore(spark, str(tmp_path))
