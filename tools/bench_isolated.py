"""Fresh-JVM-per-query bench — the contention control (r7 verdict #2).

The r7 bench drifted ~1.11x on the 26 untouched shared queries,
UNIFORMLY — including pure-scan queries whose code did not change.
That signature (uniform drift, 14% spread) points at the instrument
(steady-state contention on a shared JVM: accumulated GC pressure,
code-cache growth, block-manager state from 30+ earlier queries), not
at plan regressions.  This tool settles it: each query runs in its OWN
subprocess — a fresh JVM, fresh codegen cache, nothing else resident —
with the same warmup-then-timed protocol as bench.py (warmup at
sf0.001, then 4 runs at the bench SF, first dropped, min + median of
the rest reported).

Usage:
    python tools/bench_isolated.py [sf_dir] [out.json]

Compares against the recorded r1 baseline (BENCH_r01.json parsed
minimums) for the 18 legacy queries and prints per-query and total
ratios.  A fresh-session total ratio near 1.0 attributes the in-suite
drift to shared-JVM steady-state; per-query ratios >> 1 here would
instead name real plan regressions.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# the r1 headline set (BENCH_r01.json), the drift comparison basis
LEGACY = [
    "weekly_sales",
    "store_rp_report",
    "movements_daily_agg",
    "sap_cleaning_roundtrip",
    "star_join_revenue_by_region",
    "events_hourly_window",
    "events_sessionize",
    "dedup_keep_last",
    "exact_dedup_documents",
    "minhash_lsh_pairs",
    "simhash_sketches",
    "ann_brute_force_topk",
    "text_stats",
    "asof_join_purchase_prior_click",
    "weekly_site_sales_analytics",
    "pii_scrub",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from sap_data_pipeline_spark.session import get_spark
import __spark_entry__ as entrymod

name, sf_dir = {name!r}, {sf_dir!r}
spark = get_spark("bench-isolated")
spark.sparkContext.setLogLevel("ERROR")
q = entrymod.queries()[name]
q(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
runs = []
for _ in range(4):
    t0 = time.time()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(time.time() - t0)
runs = runs[1:]
print("BENCH_ISOLATED " + json.dumps(
    {{"name": name, "min": round(min(runs), 3),
      "median": round(sorted(runs)[1], 3)}}))
"""


def run_query(name: str, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO), name=name,
                                             sf_dir=sf_dir)],
        capture_output=True, text=True, timeout=600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_ISOLATED "):
            return json.loads(line[len("BENCH_ISOLATED "):])
    raise RuntimeError(f"{name}: no result line\n{proc.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = Path(sys.argv[2]) if len(sys.argv) > 2 else None

    r1 = json.loads((REPO / "BENCH_r01.json").read_text())["parsed"]["queries"]

    results = {}
    for name in LEGACY:
        results[name] = run_query(name, sf_dir)
        base = r1.get(name)
        ratio = round(results[name]["min"] / base, 2) if base else None
        print(f"{name:40s} min={results[name]['min']:7.3f} "
              f"median={results[name]['median']:7.3f} "
              f"r1={base} ratio={ratio}", flush=True)

    total = round(sum(r["min"] for r in results.values()), 3)
    base_total = round(sum(r1[n] for n in LEGACY if n in r1), 3)
    summary = {
        "metric": "isolated_legacy_total_min",
        "value": total,
        "unit": "sec",
        "queries": {n: r["min"] for n, r in results.items()},
        "queries_median": {n: r["median"] for n, r in results.items()},
        "r1_total": base_total,
        "ratio_vs_r1": round(total / base_total, 3),
        "sf_dir": sf_dir,
    }
    print(json.dumps(summary))
    if out_path:
        out_path.write_text(json.dumps(summary, indent=1) + "\n")


if __name__ == "__main__":
    main()
