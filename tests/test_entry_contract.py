"""Driver-contract invariants for __spark_entry__.py: the rotation
ledger math the CORRECTNESS cap depends on (the first 50 queries() keys
are the only ones recorded), checked in CI instead of by hand."""

from __future__ import annotations

import importlib.util


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_priority_is_exactly_the_recording_budget():
    mod = _entry_module()
    assert len(mod._PRIORITY) == 50, (
        f"_PRIORITY has {len(mod._PRIORITY)} entries — the driver records "
        "exactly the first 50 queries(); an overflow silently drops the "
        "tail from CORRECTNESS, an underflow wastes recording slots"
    )


def test_rotation_lists_are_disjoint_valid_and_complete():
    mod = _entry_module()
    prio, last = mod._PRIORITY, mod._RECORD_LAST
    assert len(set(prio)) == len(prio), "duplicate in _PRIORITY"
    assert len(set(last)) == len(last), "duplicate in _RECORD_LAST"
    assert not set(prio) & set(last), sorted(set(prio) & set(last))
    unknown = (set(prio) | set(last)) - set(mod.REGISTRY)
    assert not unknown, f"rotation names not in registry: {sorted(unknown)}"
    # every registered query is explicitly placed — an unlisted query
    # lands in the implicit middle and silently displaces the plan
    unplaced = set(mod.REGISTRY) - set(prio) - set(last)
    assert not unplaced, f"queries missing from the rotation: {sorted(unplaced)}"


def test_queries_iteration_order_honors_the_rotation():
    mod = _entry_module()
    names = list(mod.queries())
    assert names[: len(mod._PRIORITY)] == mod._PRIORITY
    assert names[len(mod._PRIORITY):] == mod._RECORD_LAST
    assert len(set(names)) == len(names) == len(mod.REGISTRY)


def test_every_query_has_an_oracle():
    mod = _entry_module()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    rows_only = set(qs) - set(osql)
    assert not rows_only, (
        f"rows-only queries (weaker driver check): {sorted(rows_only)} — "
        "all 170 currently carry exact oracles; a regression here "
        "downgrades the correctness evidence"
    )


def test_entry_runs_on_smoke_fixture(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() >= 0 and df.columns
