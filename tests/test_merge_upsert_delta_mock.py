"""Drive merge_upsert's Delta MERGE branch without delta-spark (VERDICT r8
task 5): a stubbed `delta.tables.DeltaTable` records the MERGE key
predicate and matched/not-matched clauses, and a fake DataFrame writer
captures the fresh-create / group-append writes — so the production branch
(sinks.py Delta path) is asserted in this sandbox instead of only on
Delta-enabled CI."""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import DataFrame

from com_danliris_service_etl_spark.sources import sinks


class _FakeMergeBuilder:
    def __init__(self, log: dict):
        self._log = log

    def whenMatchedDelete(self):
        self._log["clauses"].append("whenMatchedDelete")
        return self

    def whenMatchedUpdateAll(self):
        self._log["clauses"].append("whenMatchedUpdateAll")
        return self

    def whenNotMatchedInsertAll(self):
        self._log["clauses"].append("whenNotMatchedInsertAll")
        return self

    def execute(self):
        self._log["executed"] = True


class _FakeDeltaTable:
    calls: list[dict] = []

    def __init__(self, path: str):
        self._path = path
        self._alias = None

    @classmethod
    def forPath(cls, spark, path):
        inst = cls(path)
        cls.calls.append({"forPath": path, "clauses": [], "executed": False})
        return inst

    def alias(self, a):
        self._alias = a
        return self

    def merge(self, source, cond):
        log = self.calls[-1]
        log["merge_cond"] = cond
        # capture the deduped source rows while Spark is still alive
        log["source_rows"] = [tuple(r) for r in source.collect()]
        log["source_cols"] = source.columns
        return _FakeMergeBuilder(log)


class _FakeWriter:
    """Stands in for DataFrame.write so `.format('delta')...save(path)`
    records instead of needing Delta jars."""

    captured: list[dict] = []

    def __init__(self, df):
        self._df = df
        self._format = None
        self._mode = None

    def format(self, f):
        self._format = f
        return self

    def mode(self, m):
        self._mode = m
        return self

    def save(self, path):
        _FakeWriter.captured.append(
            {
                "format": self._format,
                "mode": self._mode,
                "path": path,
                "rows": [tuple(r) for r in self._df.collect()],
            }
        )

    def parquet(self, path):  # the non-delta branches still work
        self._df.write_real.mode(self._mode or "error").parquet(path)


@pytest.fixture()
def delta_stub(monkeypatch, spark):
    """Install a fake `delta.tables` module + force _delta_available True
    + swap DataFrame.write for the recording writer. The patch targets the
    CONCRETE DataFrame class (pyspark.sql.classic in a classic session) —
    `pyspark.sql.DataFrame` is the abstract base in PySpark 4 and its
    `write` property is shadowed by the subclass's own."""
    _FakeDeltaTable.calls = []
    _FakeWriter.captured = []
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = _FakeDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    monkeypatch.setattr(sinks, "_delta_available", lambda spark: True)
    df_cls = type(spark.range(1))
    assert issubclass(df_cls, DataFrame)
    real_write = df_cls.write
    monkeypatch.setattr(df_cls, "write_real", real_write, raising=False)
    monkeypatch.setattr(
        df_cls, "write", property(lambda self: _FakeWriter(self))
    )
    yield


def _mk_delta_dir(tmp_path, name):
    """A target that LOOKS like a Delta fact: _delta_log present."""
    d = tmp_path / name
    (d / "_delta_log").mkdir(parents=True)
    (d / "_delta_log" / "00000000000000000000.json").write_text("{}")
    return str(d)


def test_row_grain_merge_builds_null_safe_predicate_and_upsert_clauses(
    spark, tmp_path, delta_stub
):
    target = _mk_delta_dir(tmp_path, "fact")
    batch = spark.createDataFrame(
        [(1, None, "a", 2), (1, None, "a9", 5), (2, 7, "b", 1)],
        "id long, step_id long, val string, ver long",
    )
    sinks.merge_upsert(
        spark, target, batch, keys=["id", "step_id"], order_col="ver"
    )
    assert len(_FakeDeltaTable.calls) == 1
    call = _FakeDeltaTable.calls[0]
    assert call["forPath"] == target
    # null-safe key equality on every merge key, in key order
    assert call["merge_cond"] == "t.id <=> s.id AND t.step_id <=> s.step_id"
    # row-grain MERGE: update-all + insert-all, then executed
    assert call["clauses"] == ["whenMatchedUpdateAll", "whenNotMatchedInsertAll"]
    assert call["executed"] is True
    # order_col dedupe ran BEFORE the merge: one row per key, ver=5 wins
    rows = {(r[0], r[1]): r for r in call["source_rows"]}
    assert len(call["source_rows"]) == 2
    assert rows[(1, None)][2] == "a9"
    # no extra delta writes on the row-grain path
    assert _FakeWriter.captured == []


def test_replace_group_merge_deletes_then_appends_detail_grain(
    spark, tmp_path, delta_stub
):
    target = _mk_delta_dir(tmp_path, "fact_groups")
    batch = spark.createDataFrame(
        [(10, 1, "d1"), (10, 2, "d2"), (11, 1, "e1")],
        "note_id long, line long, val string",
    )
    sinks.merge_upsert(
        spark, target, batch, keys=["note_id"], replace_group=True
    )
    call = _FakeDeltaTable.calls[0]
    assert call["merge_cond"] == "t.note_id <=> s.note_id"
    assert call["clauses"] == ["whenMatchedDelete"]
    assert call["executed"] is True
    # the delete-merge source is the DISTINCT group key set, not the rows
    assert call["source_cols"] == ["note_id"]
    assert sorted(call["source_rows"]) == [(10,), (11,)]
    # then ALL batch rows append (detail grain survives — no dedupe)
    assert len(_FakeWriter.captured) == 1
    w = _FakeWriter.captured[0]
    assert (w["format"], w["mode"], w["path"]) == ("delta", "append", target)
    assert sorted(w["rows"]) == [(10, 1, "d1"), (10, 2, "d2"), (11, 1, "e1")]


def test_fresh_fact_creates_in_delta_format_when_available(
    spark, tmp_path, delta_stub
):
    """A fresh target (no committed parquet, no _delta_log) must be CREATED
    as Delta when Delta is available, or every later merge would miss the
    _delta_log probe and run the full-rewrite parquet emulation forever."""
    target = str(tmp_path / "fresh_fact")
    batch = spark.createDataFrame([(1, "a")], "id long, val string")
    sinks.merge_upsert(spark, target, batch, keys=["id"])
    assert _FakeDeltaTable.calls == []  # no merge on the fresh path
    assert len(_FakeWriter.captured) == 1
    w = _FakeWriter.captured[0]
    assert (w["format"], w["mode"], w["path"]) == ("delta", "overwrite", target)
    assert w["rows"] == [(1, "a")]


def test_delta_log_without_delta_still_hard_stops(spark, tmp_path, monkeypatch):
    """The r8 guard stays intact under the stub fixture's absence: a Delta
    fact with no delta-spark available refuses the parquet fallback."""
    monkeypatch.setattr(sinks, "_delta_available", lambda spark: False)
    target = _mk_delta_dir(tmp_path, "orphaned")
    batch = spark.createDataFrame([(1, "a")], "id long, val string")
    with pytest.raises(RuntimeError, match="refusing the parquet fallback"):
        sinks.merge_upsert(spark, target, batch, keys=["id"])
