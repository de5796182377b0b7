"""bench.compute_regressions — the formal perf-regression gate
(r9 verdict #3).  The rule must flag NON-uniform per-query slowdowns
and stay silent under uniform environment drift (the host swings ~20%
hour-over-hour under identical code; see BASELINE.md)."""

from __future__ import annotations

from bench import compute_regressions

FLOOR = {"q1": 1.0, "q2": 2.0, "q3": 0.5, "q4": 4.0, "q5": 1.5}


def test_at_floor_flags_nothing():
    assert compute_regressions(dict(FLOOR), FLOOR) == []


def test_uniform_environment_drift_flags_nothing():
    # a 40% across-the-board slowdown is the machine's hour, not a plan
    slow = {q: t * 1.4 for q, t in FLOOR.items()}
    assert compute_regressions(slow, FLOOR) == []


def test_single_nonuniform_slowdown_is_flagged():
    t = dict(FLOOR)
    t["q4"] = FLOOR["q4"] * 1.6  # one query up by seconds, neighbors flat
    assert compute_regressions(t, FLOOR) == ["q4"]


def test_subsecond_jitter_never_flags_even_at_high_ratio():
    """The absolute clause: a 0.5 s query swinging 1.7x is the
    documented sub-2 s jitter envelope (<0.55 s identical-code deltas),
    not a plan regression — a pure ratio rule false-flagged exactly
    this in the r10 degraded-window run (pii_scrub 0.65->1.13 s)."""
    t = dict(FLOOR)
    t["q3"] = FLOOR["q3"] * 1.7  # +0.35 s absolute
    assert compute_regressions(t, FLOOR) == []


def test_nonuniform_on_top_of_uniform_drift_is_flagged():
    t = {q: v * 1.3 for q, v in FLOOR.items()}  # degraded window...
    t["q2"] = FLOOR["q2"] * 2.0  # ...plus one genuine plan regression
    assert compute_regressions(t, FLOOR) == ["q2"]


def test_jitter_inside_envelope_is_tolerated():
    t = dict(FLOOR)
    t["q1"] = FLOOR["q1"] * 1.2  # within the 1.25x envelope
    assert compute_regressions(t, FLOOR) == []


def test_only_shared_queries_compared():
    t = {"q1": 1.0, "brand_new_query": 99.0}  # no floor entry yet
    assert compute_regressions(t, FLOOR) == []
    assert compute_regressions({}, FLOOR) == []


def test_floor_comparison_is_sf_gated():
    """bench.py only emits vs_local_floor / regressions when the run's
    SF matches the floor's recorded SF — cross-SF ratios are noise (a
    smoke run at sf0.001 against the sf0.1 floor once flagged 7 phantom
    regressions).  Pin the gating expression's behavior."""
    import json
    from pathlib import Path

    doc = json.loads((Path(__file__).parent.parent / "BASELINE_LOCAL.json")
                     .read_text())
    assert "sf" in doc  # the gate needs the floor to declare its SF
    assert float(doc["sf"]) == 0.1


def test_bench_line_small_catalog_keeps_per_query_dict():
    """When the per-query dict fits the driver's stdout tail, the line
    keeps the full driver-contract shape (queries inline)."""
    from bench import format_bench_line
    import json

    out = {
        "metric": "headline_queries_total_runtime",
        "value": 3.5,
        "unit": "sec",
        "queries": {"q1": 1.0, "q2": 2.5},
        "total_median5": 3.6,
        "sf": 0.1,
        "run_spread_pct": 5.0,
    }
    line = format_bench_line(out)
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["queries"] == {"q1": 1.0, "q2": 2.5}
    assert parsed["value"] == 3.5


def test_bench_line_500_query_catalog_stays_under_driver_tail():
    """r10 verdict #1: 55 per-query minimums pushed the printed line to
    1952 chars and tripped bench.py's own guard — the round recorded
    rc:1/parsed:null.  The formatter must stay under 1900 chars at ANY
    catalog size by dropping the queries dict (persisted in
    BENCH_FULL.json) and keeping the aggregate stats."""
    from bench import format_bench_line
    import json

    out = {
        "metric": "headline_queries_total_runtime",
        "value": 1234.567,
        "unit": "sec",
        "queries": {f"an_operator_with_a_long_name_{i:03d}": i * 0.123
                    for i in range(500)},
        "total_median5": 1250.0,
        "sf": 0.1,
        "run_spread_pct": 12.3,
        "vs_local_floor": 0.975,
        "floor_shared_n": 500,
        "regressions": ["an_operator_with_a_long_name_007"],
    }
    line = format_bench_line(out)
    assert len(line) < 1900
    parsed = json.loads(line)
    # aggregate stats survive; per-query data is pointed at, not inlined
    assert parsed["value"] == 1234.567
    assert parsed["vs_local_floor"] == 0.975
    assert parsed["regressions"] == ["an_operator_with_a_long_name_007"]
    assert "queries" not in parsed
    assert parsed["queries_n"] == 500
    assert parsed["queries_full"] == "BENCH_FULL.json"


def test_bench_line_current_headline_set_shape():
    """The actual HEADLINE catalog (the thing that overflowed) renders
    under the limit with realistic 3-decimal timings."""
    from bench import HEADLINE, format_bench_line

    out = {
        "metric": "headline_queries_total_runtime",
        "value": 87.9,
        "unit": "sec",
        "queries": {q: 1.234 for q in HEADLINE},
        "total_median5": 90.1,
        "sf": 0.1,
        "run_spread_pct": 12.0,
        "vs_local_floor": 0.975,
        "floor_shared_n": len(HEADLINE),
        "regressions": [],
    }
    assert len(format_bench_line(out)) < 1900


def test_per_query_envelope_tolerates_measured_window_spread():
    """r13 session-2 instrument fix: a query whose same-code
    cross-window spread is RECORDED in the floor (queries_envelope) is
    only flagged beyond that measured noise; others keep 1.25."""
    t = dict(FLOOR)
    t["q4"] = FLOOR["q4"] * 1.9  # within its measured 2.0 envelope
    env = {"q4": 2.0}
    assert compute_regressions(t, FLOOR, per_query_envelope=env) == []
    t["q4"] = FLOOR["q4"] * 2.3  # beyond it -> still flaggable
    assert compute_regressions(t, FLOOR, per_query_envelope=env) == ["q4"]


def test_per_query_envelope_is_capped_and_floored():
    t = dict(FLOOR)
    t["q4"] = FLOOR["q4"] * 2.7  # beyond even the 2.5 cap
    assert compute_regressions(
        t, FLOOR, per_query_envelope={"q4": 99.0}) == ["q4"]
    # an envelope below the scalar default never TIGHTENS the gate
    t2 = dict(FLOOR)
    t2["q4"] = FLOOR["q4"] * 1.2
    assert compute_regressions(
        t2, FLOOR, per_query_envelope={"q4": 1.01}) == []


def test_per_query_envelope_leaves_other_queries_at_default():
    t = dict(FLOOR)
    t["q2"] = FLOOR["q2"] * 1.6  # q2 has NO recorded envelope
    assert compute_regressions(
        t, FLOOR, per_query_envelope={"q4": 2.5}) == ["q2"]
