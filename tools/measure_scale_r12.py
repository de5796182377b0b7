"""One-off scaling measurements for the round-12 operators (SCALE.md).

Times each new operator at 1× and 20× synthetic scale in one session
(best of 2 after a warm run), printing the table rows SCALE.md records.
Usage: python tools/measure_scale_r12.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.functions import text as X  # noqa: E402
from sap_data_pipeline_spark.operators.corpus import (  # noqa: E402
    c4_line_filters,
    intra_doc_line_dedup,
    robots_disallow_gate,
)
from sap_data_pipeline_spark.operators.similarity import (  # noqa: E402
    centroid_outliers,
)
from sap_data_pipeline_spark.session import get_spark  # noqa: E402

N1 = 50_000
WEIGHTS = [round(((b * 37 + 11) % 199) / 199.0 - 0.5, 6) for b in range(64)]


def best2(make_df):
    runs = []
    for _ in range(3):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs[1:])


def multiline_docs(spark, n, lines=12):
    line = lambda i: F.concat(  # noqa: E731
        F.when(F.pmod(i, F.lit(3)) == 0, F.lit("nav menu item and such"))
        .otherwise(F.lit("body sentence number ")),
        F.pmod(F.col("id") + i * i, F.lit(17)).cast("string"),
        F.when(F.pmod(i, F.lit(2)) == 0, F.lit(".")).otherwise(F.lit("")),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n", F.transform(F.sequence(F.lit(0), F.lit(lines)), line)
        ).alias("text"),
    )


def frontier(spark, n, hosts):
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), F.pmod(F.col("id"), F.lit(hosts)).cast("string"),
            F.lit("/p"), F.pmod(F.col("id"), F.lit(5)).cast("string"),
            F.lit("/x"), F.col("id").cast("string"),
        ).alias("url")
    )


def rules(spark, hosts):
    return spark.createDataFrame(
        [(f"h{i}", f"/p{j}", bool(j % 2)) for i in range(hosts)
         for j in range(5)],
        "host string, path_prefix string, allow boolean",
    )


def embs(spark, n, dim=64, groups=50):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.col("id"), F.lit(groups)).alias("grp"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.col("id") * 31 + i * 7, F.lit(1000))
                       .cast("double") / 500.0 - 1.0),
        ).alias("embedding"),
    )


def main() -> None:
    spark = get_spark("scale_r12")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for label, n in (("1x", N1), ("20x", N1 * 20)):
        t_idl = best2(lambda: intra_doc_line_dedup(multiline_docs(spark, n)))
        t_c4 = best2(lambda: c4_line_filters(multiline_docs(spark, n)))
        # hosts grow with the frontier (politeness realism): n/500
        t_rb = best2(lambda: robots_disallow_gate(
            frontier(spark, n, max(n // 500, 10)),
            rules(spark, max(n // 500, 10))))
        t_sc = best2(lambda: centroid_outliers(embs(spark, n), "grp"))
        t_hs = best2(lambda: (
            multiline_docs(spark, n)
            .select("doc_id", X.tokens("text").alias("_t"))
            .select("doc_id", X.hashed_gram_buckets(
                F.col("_t"), n_buckets=64, seed=5).alias("_b"))
            .select("doc_id",
                    X.hashed_linear_score_from(F.col("_b"), WEIGHTS)
                    .alias("score"))
        ))
        rows.append((label, t_idl, t_c4, t_rb, t_sc, t_hs))

    names = ["intra_doc_line_dedup", "c4_line_filters",
             "robots_disallow_gate", "centroid_outliers",
             "hashed_ngram_score"]
    (l1, *t1), (l2, *t2) = rows
    for name, a, b in zip(names, t1, t2):
        print(f"| {name} | {a:.1f} s | {b:.1f} s | {b / a:.1f}x |")


if __name__ == "__main__":
    main()
