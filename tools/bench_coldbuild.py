"""Cold-build benchmark for the artifact-served corpus indexes
(r13 verdict #3: make the artifact-served benched queries honest).

Three headline queries are served from the durable content-addressed
artifact store (``sources.artifacts``, sanctioned r8 verdict #2):
``near_dup_clusters`` (minhash pair graph + CC labels),
``semantic_dedup_clusters`` (embedding-cell pair graph + CC labels) and
``ann_ivfpq_topk`` (trained PQ codebooks + IVF centroids + the encoded
serving index).  In the steady-state bench their numbers measure a
parquet/JSON read of precomputed results plus the serving plan — which
is the production serving economics, but NOT the build cost.  This tool
measures the BUILD: each run points ``SPARK_GRAFT_ARTIFACT_DIR`` at a
fresh temp dir and clears the process-level caches, so the query's
first execution pays the full sketch/closure/train pipeline, then
commits the artifacts it would serve next time.

Methodology mirrors bench.py where it can: one sf0.001 warmup per query
(JIT/codegen), then N cold runs (fresh artifact dir + cleared process
caches each), noop sink, min+median reported.  Run 1 is NOT discarded —
the build IS the one-time cost being measured — so these numbers are
not comparable with the steady-state bench; they answer "what does a
cold corpus pay once".

Usage:
    python tools/bench_coldbuild.py [--sf DIR] [--runs N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

COLD_QUERIES = ["near_dup_clusters", "semantic_dedup_clusters", "ann_ivfpq_topk"]


def _clear_process_caches() -> None:
    """Reset every process-level artifact memo so the next invocation
    must go to the (fresh, empty) artifact store."""
    from sap_data_pipeline_spark.plans import catalog_ext as CE

    CE._sem_index_cache.clear()
    CE._near_dup_index_cache.clear()
    CE._ann_model_cache.clear()
    CE._ivfpq_index_cache.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # the artifact root must be fresh BEFORE the first import builds a
    # session; each run re-points it at a new tmp dir
    scratch = tempfile.mkdtemp(prefix="coldbuild_")
    os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = os.path.join(scratch, "run0")

    import __spark_entry__ as entrymod
    from sap_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-coldbuild")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    results: dict[str, dict] = {}
    try:
        for name in COLD_QUERIES:
            # JIT/codegen warmup on the tiny SF (also a cold build there,
            # against a throwaway store)
            os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = os.path.join(
                scratch, f"warm_{name}"
            )
            _clear_process_caches()
            spark.sparkContext.setJobDescription(f"coldbuild warmup {name}")
            queries[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()

            runs: list[float] = []
            for i in range(args.runs):
                os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = os.path.join(
                    scratch, f"{name}_{i}"
                )
                _clear_process_caches()
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"coldbuild {name} run {i}")
                t0 = time.time()
                queries[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
            results[name] = {
                "cold_min": round(min(runs), 3),
                "cold_median": round(sorted(runs)[len(runs) // 2], 3),
                "runs": [round(r, 3) for r in runs],
            }
            print(f"{name}: cold_min={results[name]['cold_min']} "
                  f"runs={results[name]['runs']}")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    out = {
        "metric": "artifact_cold_build_runtime",
        "unit": "sec",
        "sf": args.sf.rstrip("/").rsplit("sf", 1)[-1],
        "runs_per_query": args.runs,
        "methodology": (
            "fresh SPARK_GRAFT_ARTIFACT_DIR + cleared process caches per "
            "run; first execution pays sketch/CC/train + artifact commit; "
            "noop sink; run 1 kept (the build IS the measured cost) — not "
            "comparable with the steady-state bench"
        ),
        "queries": results,
    }
    out_path = Path(args.out) if args.out else (
        Path(__file__).resolve().parents[1] / "BENCH_COLDBUILD.json"
    )
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v["cold_min"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
