"""1x/20x scaling measurements for the r10 sampling additions
(SCALE.md measured-ratio table): ``epoch_shuffle_order`` (one hash
exchange + per-shard sort) and ``ring_negatives_pairs`` (broadcast
shard sizes + narrow self-equi-join).  Same instrument as
tools/measure_scale_r10.py (best of 2 after a warm run).  Usage:

    python tools/measure_scale_r10_sampling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.operators.sampling import (  # noqa: E402
    epoch_shuffle,
    ring_negatives,
)
from sap_data_pipeline_spark.session import get_spark  # noqa: E402


def best2(make_df):
    runs = []
    for _ in range(3):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs[1:])


def main() -> None:
    spark = get_spark("scale_r10_sampling")
    spark.sparkContext.setLogLevel("ERROR")
    n1 = 250_000

    def docs(n):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    from sap_data_pipeline_spark.operators.linear_model import (
        logreg_score,
        logreg_train,
    )
    from sap_data_pipeline_spark.operators.sampling import (
        apply_mixture_plan_with_repetition,
    )

    def feats(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 997).alias("x1"),
            ((F.col("id") * 31) % 83).alias("x2"),
            ((F.col("id") % 997 > 500).cast("int")).alias("y"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
        )

    upplan = spark.createDataFrame(
        [("a", 2.5), ("b", 0.25)], "stratum string, sampling_fraction double"
    )

    def train_then_score(n):
        d = feats(n).persist()
        try:
            m = logreg_train(d, ["x1", "x2"], "y", iterations=8, lr=1.0)
        finally:
            d.unpersist()
        return logreg_score(feats(n), m)

    for name, fn in [
        # shards scale with the corpus so per-shard sort size stays
        # bounded (the 100 TB contract: n_shards ~ corpus/shard-target)
        ("epoch_shuffle (shards ~ n/8k: bounded per-shard sorts)",
         lambda n: epoch_shuffle(docs(n), "doc_id",
                                 n_shards=max(8, n // 8000))),
        ("ring_negatives k=2 (broadcast sizes + narrow self-join)",
         lambda n: ring_negatives(docs(n), "doc_id", k=2,
                                  n_shards=max(8, n // 8000))),
        ("logreg train (8 iters, bounded driver transfer) + score",
         train_then_score),
        ("mixture apply with repetition (2.5x / 0.25x strata)",
         lambda n: apply_mixture_plan_with_repetition(
             feats(n), upplan, "src", key="doc_id")),
    ]:
        t1 = best2(lambda: fn(n1))
        tN = best2(lambda: fn(n1 * 20))
        print(
            f"| {name} | {t1:.1f} s | 20x: {tN:.1f} s | {tN / t1:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
