"""Plan-shape verification of the Delta MERGE branch of merge_upsert.

The test image has no Delta jars, so only the parquet fallback ever
executes locally — but the PRODUCTION path is the Delta `MERGE INTO`
branch. These tests inject a recording fake of `delta.tables.DeltaTable`
(and force `_delta_available` true) so the branch runs and its builder
chain — merge condition, matched/not-matched clauses, group-replace
delete+append protocol — is shape-verified without jars.
"""

from __future__ import annotations

import sys
import types

import pytest

from com_danliris_service_etl_spark.sources import sinks


class _Recorder:
    """Stands in for a DeltaTable/merge-builder: records the call chain."""

    def __init__(self, log):
        self.log = log

    def alias(self, name):
        self.log.append(("alias", name))
        return self

    def merge(self, source, cond):
        self.log.append(("merge", cond))
        # keep the source so assertions can inspect its columns
        self.log.append(("merge_source_cols", tuple(source.columns)))
        return self

    def whenMatchedDelete(self):
        self.log.append(("whenMatchedDelete",))
        return self

    def whenMatchedUpdateAll(self):
        self.log.append(("whenMatchedUpdateAll",))
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append(("whenNotMatchedInsertAll",))
        return self

    def execute(self):
        self.log.append(("execute",))


@pytest.fixture()
def delta_env(tmp_path, monkeypatch):
    """Fake delta module + _delta_available + a _delta_log dir + a write
    recorder (so the group-replace append never needs real Delta jars)."""
    log = []

    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = types.SimpleNamespace(
        forPath=lambda spark, path: _Recorder(log)
    )
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)
    monkeypatch.setattr(sinks, "_delta_available", lambda spark: True)

    from pyspark.sql.readwriter import DataFrameWriter

    def fake_save(self, path=None, **kw):
        log.append(("writer_save", path))

    monkeypatch.setattr(DataFrameWriter, "save", fake_save)

    target = tmp_path / "fact"
    (target / "_delta_log").mkdir(parents=True)
    return str(target), log


def test_merge_upsert_builds_row_grain_merge(spark, delta_env):
    target, log = delta_env
    updates = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    sinks.merge_upsert(spark, target, updates, keys=["k"])
    ops = [e[0] for e in log]
    # upsert shape: one MERGE with update-all + insert-all, then execute
    assert ops == [
        "alias",
        "merge",
        "merge_source_cols",
        "whenMatchedUpdateAll",
        "whenNotMatchedInsertAll",
        "execute",
    ]
    cond = dict((e[0], e) for e in log)["merge"][1]
    assert cond == "t.k <=> s.k"  # null-safe key equality


def test_merge_upsert_builds_composite_key_condition(spark, delta_env):
    target, log = delta_env
    updates = spark.createDataFrame([(1, 2, "a")], "k1 long, k2 long, v string")
    sinks.merge_upsert(spark, target, updates, keys=["k1", "k2"])
    cond = dict((e[0], e) for e in log)["merge"][1]
    assert cond == "t.k1 <=> s.k1 AND t.k2 <=> s.k2"


def test_merge_upsert_group_replace_is_delete_then_append(spark, delta_env):
    target, log = delta_env
    updates = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "b")], "grp long, detail long, v string"
    )
    sinks.merge_upsert(spark, target, updates, keys=["grp"], replace_group=True)
    ops = [e[0] for e in log]
    # detail-grain protocol: MERGE-delete on the group key, THEN append —
    # never update (detail rows must not collapse to one per key)
    assert ops == [
        "alias",
        "merge",
        "merge_source_cols",
        "whenMatchedDelete",
        "execute",
        "writer_save",
    ]
    assert "whenMatchedUpdateAll" not in ops
    # the delete-merge source is the distinct group keys only
    src_cols = dict((e[0], e) for e in log)["merge_source_cols"][1]
    assert src_cols == ("grp",)
    assert dict((e[0], e) for e in log)["writer_save"][1] == target
