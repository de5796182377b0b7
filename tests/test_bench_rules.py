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
