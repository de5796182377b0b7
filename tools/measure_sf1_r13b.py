"""Late-r13 sf1 checkpoint rows (SCALE.md): real-catalog decade-closer
measurements for the video near-dup arm — the heaviest late-r13
additions in absolute terms (real Y4M decode per clip) —

* ``video_fp_pairs``   — fingerprint + banded Hamming pairing;
* ``video_fp_clusters`` — pairs + connected-components closure.

Reuses the key-shifted replica from tools/make_sf1_replica.py (built
on demand if absent).  Usage: python tools/measure_sf1_r13b.py [out_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sap_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
QUERIES_LATE_R13 = ["video_fp_pairs", "video_fp_clusters"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica"
    spark = get_spark("sf1_checkpoint_r13b")
    spark.sparkContext.setLogLevel("ERROR")

    if not Path(f"{out_dir}/lineitem.parquet").exists():
        from tools.make_sf1_replica import build

        t0 = time.time()
        build(spark, out_dir)
        print(f"replica built in {time.time() - t0:.0f}s", file=sys.stderr)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    jvm_gc = spark.sparkContext._jvm.System.gc
    results = {}
    for name in QUERIES_LATE_R13:
        # warm at sf0.1 (JIT/codegen), then time BOTH scales in-session
        queries[name](spark, SRC).write.format("noop").mode("overwrite").save()
        row = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", out_dir)):
            ts = []
            for _ in range(3):
                jvm_gc()
                t0 = time.time()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                ts.append(round(time.time() - t0, 2))
            row[label] = {"min": min(ts), "runs": ts}
            print(f"{name} {label}: min {min(ts)}s runs={ts}",
                  file=sys.stderr)
        row["ratio"] = round(row["sf1"]["min"] / row["sf0.1"]["min"], 2)
        results[name] = row

    print(json.dumps({"sf_dir": out_dir, "scale": "10x sf0.1 key-shifted",
                      "queries": results}))


if __name__ == "__main__":
    main()
