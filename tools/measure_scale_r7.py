"""One-off scaling measurements for the round-7 operators (SCALE.md).

Times each new operator at 1× and 20× synthetic scale in one session
(best of 2 after a warm run), printing the table rows SCALE.md records.
Usage: python tools/measure_scale_r7.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.operators import graph as G  # noqa: E402
from sap_data_pipeline_spark.operators import sampling as SA  # noqa: E402
from sap_data_pipeline_spark.operators import similarity as S  # noqa: E402
from sap_data_pipeline_spark.operators.temporal import (  # noqa: E402
    interval_overlap_join,
)
from sap_data_pipeline_spark.session import get_spark  # noqa: E402


def best2(make_df):
    runs = []
    for _ in range(3):  # run 1 warms; report best of the last 2
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs[1:])


def edges(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(8))).alias("j"),
        )
        .select(
            "src",
            ((F.col("src") * 2654435761 + F.col("j") * 40503) % n).alias("dst"),
        )
    )


def vecs(spark, n, dim=32):
    comps = F.array(*[
        (F.pmod(F.xxhash64(F.col("id"), F.lit(h)), F.lit(2001)) / 1000.0 - 1.0)
        .cast("float")
        for h in range(dim)
    ])
    return spark.range(n).select(F.col("id").alias("vec_id"), comps.alias("embedding"))


def intervals(spark, n):
    return spark.range(n).select(
        F.col("id").alias("iid"),
        (F.col("id") * 977 % 1_000_000).alias("s"),
        (F.col("id") * 977 % 1_000_000 + F.col("id") % 500).alias("e"),
    )


def docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 7).cast("string")).alias("lang"),
        (F.col("id") % 5000 + 1).cast("long").alias("n_chars"),
    )


def main() -> None:
    spark = get_spark("scale_r7")
    spark.sparkContext.setLogLevel("ERROR")
    n1 = 20_000
    skip_graph = "--skip-graph" in sys.argv
    for name, fn in [
        ("label_propagation (4 rounds, 8·N edges)",
         None if skip_graph else
         lambda n: G.label_propagation(edges(spark, n), iterations=4)),
        ("triangle_counts orient=degree (8·N edges)",
         None if skip_graph else
         lambda n: G.triangle_counts(edges(spark, n), orient="degree")),
        # cells scale with the corpus so |cell| stays ~300 (the IVF
        # contract); pair space is N·|cell|·nprobe, never N².  Measured
        # at 4× (not 20×): the candidate SHUFFLE is the honest cost and
        # 4× already exercises it at ~50M rows on this box.
        ("knn_graph 4× (|cell|≈300 both scales, nprobe 2)",
         lambda n: S.knn_graph(
             vecs(spark, min(n, n1 * 4)), k=3,
             n_cells=max(8, min(n, n1 * 4) // 300))),
        ("interval_overlap_join (self, 500-wide, bin 512)",
         lambda n: interval_overlap_join(
             intervals(spark, n),
             intervals(spark, n).select(
                 F.col("iid").alias("jid"), F.col("s").alias("s2"),
                 F.col("e").alias("e2"),
             ),
             left_start="s", left_end="e", right_start="s2",
             right_end="e2", bin_size=512)),
        ("weighted_sample_n (7 strata, n=100)",
         lambda n: SA.weighted_sample_n(
             docs(spark, n), ["lang"], 100, key="doc_id",
             weight_col="n_chars")),
        ("pca_project serve (dim 32, k 8, trained at 1×)",
         "pca"),  # handled below (train once)
    ]:
        if fn is None:
            continue
        if fn == "pca":
            model = S.pca_train(vecs(spark, n1), dim=32, k=8)
            t1 = best2(lambda: S.pca_project(vecs(spark, n1), model))
            t20 = best2(lambda: S.pca_project(vecs(spark, n1 * 20), model))
        else:
            t1 = best2(lambda: fn(n1))
            t20 = best2(lambda: fn(n1 * 20))
        print(f"| {name} | {t1:.1f} s | {t20:.1f} s | {t20 / t1:.1f}× |", flush=True)


if __name__ == "__main__":
    main()
