"""Per-query optimization instrument (rounds 13+).

Times one or more catalog queries with the bench methodology (noop sink,
N back-to-back runs, min + median of the steady-state tail) and writes
`.explain("formatted")` to plans/<round>/<query>_<tag>.txt so before/after
plan claims are checkable without running Spark.

Usage:
    python tools/opt_measure.py [--sf DIR] [--runs N] [--tag before|after]
                                [--no-plan] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from sap_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tag", default=None, help="plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", default="r14", help="plans/<round>/ output dir")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    plans_dir = Path(__file__).resolve().parents[1] / "plans" / args.round
    plans_dir.mkdir(parents=True, exist_ok=True)

    jvm_gc = spark.sparkContext._jvm.System.gc
    for name in args.queries:
        fn = queries[name]
        # warmup on the tiny SF (JIT + codegen), then one discarded run
        # at the target SF (file listing / per-sf one-time costs)
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite").save()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            jvm_gc()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs_s = sorted(runs)
        print(f"{name}: min={runs_s[0]:.3f} med={runs_s[len(runs_s)//2]:.3f} "
              f"runs={[round(r, 3) for r in runs]}")
        if not args.no_plan and args.tag:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            print(f"  wrote plans/{args.round}/{name}_{args.tag}.txt")


if __name__ == "__main__":
    main()
