"""Record this machine's bench floor as BASELINE_LOCAL.json (r8 verdict #3).

The r1-era recorded baseline (BENCH_r01.json) is machine-bound: the r8
replay experiment measured a 1.25× pure-environment drift, which every
cross-round comparison had to correct by hand.  This tool snapshots the
CURRENT machine + instrument's per-query minimums from the latest
BENCH_FULL.json (and, when present, fresh-JVM minimums from
bench_isolated's output) into BASELINE_LOCAL.json; bench.py then emits
`vs_local_floor` — the shared-query ratio against this floor — in every
future BENCH_r{N} line, so round-over-round performance reads directly
with no hand arithmetic.

Usage:
    python bench.py                       # produces BENCH_FULL.json
    python tools/bench_isolated.py /root/testdata/sf0.1 BENCH_ISOLATED_rN.json
    python tools/make_baseline_local.py [round_tag] [isolated.json] [window2.json ...]

Re-run (with a new round_tag) only when the floor legitimately moves:
a machine change, an instrument change, or a deliberate plan change —
never to absorb a regression.

Extra ``window2.json`` args are bench.py outputs (BENCH_FULL shape)
from ADDITIONAL same-code runs in other host windows.  When given, the
floor takes the elementwise per-query MIN across the runs (the true
machine floor) and additionally records ``queries_envelope``: each
query's measured same-code cross-window spread relative to the median
drift (floored at the gate's 1.25 scalar, capped 2.5), which
bench.compute_regressions uses as that query's per-query envelope —
the r13 session-2 instrument fix for NON-uniform host contention (the
median query swung 1.23× between two same-code runs while the
iterative/Arrow-boundary queries swung up to 2.03×).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

sys.path.insert(0, str(REPO / "tools"))
from bench_isolated import LEGACY  # noqa: E402


def main() -> None:
    round_tag = sys.argv[1] if len(sys.argv) > 1 else "r9"
    iso_path = Path(sys.argv[2]) if len(sys.argv) > 2 else None
    window_paths = [Path(p) for p in sys.argv[3:]]

    full = json.loads((REPO / "BENCH_FULL.json").read_text())
    mins = dict(full["queries"])
    envelopes: dict[str, float] = {}
    if window_paths:
        runs = [full["queries"]] + [
            json.loads(p.read_text())["queries"] for p in window_paths
        ]
        # r13 advice: an envelope from only two same-code runs lets ONE
        # contended sample permanently widen that query's regression gate
        # (up to 2.5×) until the next deliberate re-record.  Three or
        # more window runs make a single outlier visible in the spread.
        if len(runs) < 3:
            print(
                f"WARNING: queries_envelope derived from only {len(runs)} "
                "same-code runs — a single contended sample widens the "
                "gate; prefer >=3 window runs",
                file=sys.stderr,
            )
        shared = set(runs[0])
        for r in runs[1:]:
            shared &= set(r)
        spreads = {
            q: max(r[q] for r in runs) / min(r[q] for r in runs)
            for q in shared
        }
        med_spread = sorted(spreads.values())[len(spreads) // 2]
        for q in shared:
            mins[q] = round(min(r[q] for r in runs), 3)
            env = 1.15 * spreads[q] / med_spread
            if env > 1.25:
                envelopes[q] = round(min(env, 2.5), 3)
    missing_legacy = [q for q in LEGACY if q not in mins]
    out = {
        "recorded_round": round_tag,
        "sf": full["sf"],
        "instrument": "bench.py in-suite, 7 runs/query dropping first 2, "
                      "per-query min over the 5 steady-state runs",
        "headline_total": full["value"],
        "headline_total_median5": full["total_median5"],
        "run_spread_pct": full["run_spread_pct"],
        "queries_min": mins,
        "queries_median": full.get("queries_median", {}),
        "legacy18": {q: mins[q] for q in LEGACY if q in mins},
        "legacy18_total": round(sum(mins[q] for q in LEGACY if q in mins), 3),
        "legacy18_missing": missing_legacy,
    }
    if envelopes:
        out["queries_envelope"] = envelopes
        out["queries_envelope_note"] = (
            "measured same-code cross-window spread per query relative "
            "to the median drift, ×1.15 margin, capped 2.5 — "
            "bench.compute_regressions uses it as the per-query "
            "envelope; queries absent here keep the 1.25 default"
        )
        # auditability (r13 advice): record how many same-code runs the
        # envelope was measured over, so the gate's confidence is
        # checkable from the floor document alone
        out["queries_envelope_n_runs"] = len(window_paths) + 1
        out["window_runs"] = [str(p) for p in window_paths]
    if iso_path and iso_path.exists():
        iso = json.loads(iso_path.read_text())
        out["isolated_min"] = iso.get("queries", iso)
        out["isolated_note"] = (
            "fresh-JVM-per-query minimums (tools/bench_isolated.py); NOT "
            "comparable with in-suite minimums — a full suite warms shared "
            "JVM/codegen paths single-query processes never reach"
        )
    (REPO / "BASELINE_LOCAL.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"BASELINE_LOCAL.json written: headline_total={out['headline_total']}"
          f" legacy18_total={out['legacy18_total']}"
          f" spread={out['run_spread_pct']}%")


if __name__ == "__main__":
    main()
