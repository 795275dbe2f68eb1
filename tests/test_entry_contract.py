"""Driver-contract invariants for __spark_entry__.py. The rotation order
is DERIVED from the CORRECTNESS_r*.json artifacts since round 9
(tests/test_rotation.py pins the derivation itself); this file keeps the
contract-surface checks: iteration order matches the derivation, every
query carries an exact oracle, and the smoke entry runs."""

from __future__ import annotations

import importlib.util


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_queries_iteration_order_honors_the_derived_rotation():
    mod = _entry_module()
    names = list(mod.queries())
    assert names == mod._ordered_names()
    assert len(set(names)) == len(names) == len(mod.REGISTRY)


def test_every_query_has_an_oracle():
    mod = _entry_module()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    rows_only = set(qs) - set(osql)
    assert not rows_only, (
        f"rows-only queries (weaker driver check): {sorted(rows_only)} — "
        "every registry query currently carries an exact oracle; a "
        "regression here downgrades the correctness evidence"
    )


def test_entry_runs_on_smoke_fixture(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() >= 0 and df.columns
