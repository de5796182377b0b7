"""One-off scaling measurements for the r8/r9 heavy additions
(SCALE.md round-10 section, r9 verdict #6): wall-clock at 1x and 20x
synthetic scale for the four operators behind the promoted queries
``host_communities_lpa``, ``host_triangle_stats``, ``knn_graph_cells``
(4x — see note in SCALE.md), and ``events_windowed_distinct_hll``,
measured against the CURRENT implementations (triangle edge-list
checkpoint, one-exchange knn tail).  Best of 2 after a warm run, same
instrument as tools/measure_scale_r7.py.  Usage:

    python tools/measure_scale_r10.py
"""

from __future__ import annotations

import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.operators import graph as G  # noqa: E402
from sap_data_pipeline_spark.operators import similarity as S  # noqa: E402
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


def events(spark, n):
    """Synthetic events star slice: ~90 days x 8 types, user cardinality
    grows with n so the HLL register MERGE (not just the scan) scales."""
    return spark.range(n).select(
        (F.timestamp_seconds(1_700_000_000 + (F.col("id") * 977) % (90 * 86400)))
        .alias("ts"),
        F.concat(F.lit("type_"), (F.col("id") % 8).cast("string"))
        .alias("event_type"),
        ((F.col("id") * 2654435761) % (n // 3 + 1)).alias("user_id"),
    )


def main() -> None:
    spark = get_spark("scale_r10")
    spark.sparkContext.setLogLevel("ERROR")
    n1 = 20_000

    from sap_data_pipeline_spark.plans.catalog_ext import (
        events_windowed_distinct_hll,
    )

    for name, fn, n20 in [
        ("host_communities_lpa kernel: label_propagation (4 rounds, 8*N edges)",
         lambda n: G.label_propagation(edges(spark, n), iterations=4), 20),
        ("host_triangle_stats kernel: triangle_counts orient=id, checkpointed "
         "(8*N edges)",
         lambda n: G.triangle_counts(edges(spark, n)), 20),
        # cells scale with the corpus so |cell| stays ~300 (the IVF
        # contract); measured at 4x like r7 — the candidate shuffle is
        # the honest cost and 4x already exercises ~50M pairs here.
        ("knn_graph_cells kernel: knn_graph 4x (|cell|~300, one-exchange tail)",
         lambda n: S.knn_graph(vecs(spark, n), k=3, n_cells=max(8, n // 300)),
         4),
        ("events_windowed_distinct_hll (explicit-register batch kernel)",
         lambda n: events_windowed_distinct_hll(
             types.SimpleNamespace(events=events(spark, n))), 20),
    ]:
        t1 = best2(lambda: fn(n1))
        tN = best2(lambda: fn(n1 * n20))
        print(
            f"| {name} | {t1:.1f} s | {n20}x: {tN:.1f} s | {tN / t1:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
