"""Build a 10× key-shifted replica of /root/testdata/sf0.1 (≈ sf1) and
bench the heaviest headline queries on it (r10 verdict #6).

The 2× gate is judged at sf0.1 and the 20× SCALE.md tables use synthetic
single-operator kernels; this one-off turns those ratios into measured
wall-times one decade closer to target scale on the REAL query plans.

Replication is key-shifted, not naive: every copy i (1..9) offsets all
surrogate keys AND their foreign-key references by i·10⁷, so join
selectivity, group cardinalities, and dedup-family pair volumes scale
the way a larger corpus would — a naive 10× text replication would give
every document 10 exact copies and quadratically explode LSH buckets,
measuring an adversarial corpus rather than a bigger one.  Dimension
leaves (region, nation) stay fixed, TPC-H-style.  `documents.text`
gets a per-copy suffix token and `embeddings.embedding` a per-copy
first-component nudge for the same reason.

Usage:
    python tools/make_sf1_replica.py [out_dir] [runs_per_query]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # above every key in sf0.1

# (table, [key columns to shift]) — dims with no surrogate growth stay 1×
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]

# the 10 most expensive headline queries by BENCH_FULL median (r10)
HEAVY = [
    "image_ahash_clusters",
    "knn_graph_cells",
    "simhash_near_dup_pairs64",
    "ann_ivfpq_fixed_models_topk",
    "host_pagerank",
    "store_rp_report",
    "host_communities_lpa",
    "tpch_q21_suppliers_who_kept_waiting",
    "weekly_sales",
    "doc_tree_root_depth",
]


def build(spark, out_dir: str) -> None:
    for name in FIXED:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
    for name, keys in SHIFTED.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        copies = []
        for i in range(10):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if name == "documents" and i:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            if name == "embeddings" and i:
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (F.element_at("embedding", 1)
                             + F.lit(i * 1e-3)).cast("float")
                        ),
                        F.slice("embedding", 2, 10_000),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("sf1_checkpoint")
    spark.sparkContext.setLogLevel("ERROR")

    if not Path(f"{out_dir}/lineitem.parquet").exists():
        t0 = time.time()
        build(spark, out_dir)
        print(f"replica built in {time.time() - t0:.0f}s -> {out_dir}",
              file=sys.stderr)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    results = {}
    jvm_gc = spark.sparkContext._jvm.System.gc
    for name in HEAVY:
        # warm at sf0.1 so JIT/codegen is paid before the sf1 timing
        queries[name](spark, SRC).write.format("noop").mode(
            "overwrite").save()
        ts = []
        for _ in range(runs):
            jvm_gc()
            t0 = time.time()
            queries[name](spark, out_dir).write.format("noop").mode(
                "overwrite").save()
            ts.append(round(time.time() - t0, 2))
        results[name] = {"sf1_min": min(ts), "runs": ts}
        print(f"{name}: sf1 min {min(ts)}s runs={ts}", file=sys.stderr)

    print(json.dumps({"sf_dir": out_dir, "scale": "10x sf0.1 key-shifted",
                      "queries": results}))


if __name__ == "__main__":
    main()
