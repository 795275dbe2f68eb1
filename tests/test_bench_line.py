"""The bench capture line must ALWAYS fit the driver's 2000-char stdout
window, at any registry size — rounds 2-4 silently front-truncated the
JSON when the registry outgrew the window, and the first fix only
degraded precision once without re-checking."""

from __future__ import annotations

import json

from bench import fit_capture_line


def _out(n_queries: int) -> dict:
    return {
        "metric": "min-of-3 warm wall-clock sec per registry query",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"q{i}": 0.001 * i + 0.123 for i in range(n_queries)},
        "n_queries": n_queries,
        "key": "queries keys = unique leading code of registry query name",
        "full": "BENCH_FULL.json",
    }


def test_small_registry_keeps_full_precision():
    line = fit_capture_line(_out(118))
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 118
    assert "dropped_cheapest" not in parsed


def test_growth_degrades_precision_before_dropping():
    # ~150 coded queries at 3dp overflow; 2dp should still hold them all
    line = fit_capture_line(_out(150))
    parsed = json.loads(line)
    assert len(line) <= 1900
    assert len(parsed["queries"]) == 150
    assert "dropped_cheapest" not in parsed


def test_runaway_growth_drops_cheapest_loudly():
    # far past what rounding can absorb: entries must be dropped, the
    # drop announced, and the EXPENSIVE tail preserved
    out = _out(400)
    out["queries"]["q_expensive"] = 9.999
    line = fit_capture_line(out)
    parsed = json.loads(line)
    assert len(line) <= 1900
    assert parsed["dropped_cheapest"] >= 1
    assert parsed["dropped_cheapest"] + len(parsed["queries"]) == 401
    assert "q_expensive" in parsed["queries"]
    # survivors are the most expensive ones
    assert min(parsed["queries"].values()) >= max(
        v for k, v in out["queries"].items() if k not in parsed["queries"]
    )


def test_pathological_limit_never_infinite_loops():
    line = fit_capture_line(_out(10), limit=10)
    # cannot fit even an empty dict — returns the smallest form, loudly
    parsed = json.loads(line)
    assert parsed["dropped_cheapest"] == 10 and parsed["queries"] == {}
