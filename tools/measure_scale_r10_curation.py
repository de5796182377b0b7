"""One-off scaling measurements for the r10 curation additions
(SCALE.md round-10 section): wall-clock at 1x and 20x synthetic scale
for the operators behind ``exact_substring_excise``,
``host_boilerplate_lines``, and ``source_drift_psi``.  Best of 2 after
a warm run, same instrument as tools/measure_scale_r10.py.  Usage:

    python tools/measure_scale_r10_curation.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.operators.corpus import (  # noqa: E402
    host_boilerplate_removal,
)
from sap_data_pipeline_spark.operators.dedup import (  # noqa: E402
    exact_substring_excise,
)
from sap_data_pipeline_spark.operators.quality import drift_psi  # noqa: E402
from sap_data_pipeline_spark.session import get_spark  # noqa: E402

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "one", "two",
    "three", "four", "five", "six",
]


def best2(make_df):
    runs = []
    for _ in range(3):  # run 1 warms; report best of the last 2
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs[1:])


def docs(spark, n):
    """~40-token docs over a 30-word vocab; every 10th doc carries the
    same planted 12-token span so cross-doc duplicates exist at every
    scale (mirrors the generator's planted duplicates)."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.element_at(
                vocab, ((F.col("id") * 31 + j * 7) % 30 + 1).cast("int")
            ),
        ),
    )
    planted = F.when(
        F.col("id") % 10 == 0,
        F.lit(" the quick brown fox jumps over the lazy dog again and again"),
    ).otherwise(F.lit(""))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(body, planted).alias("text"),
        (F.col("id") % 5).cast("string").alias("lang"),
        (F.col("id") % 7).cast("string").alias("source"),
        (F.length(body) + F.length(planted)).alias("n_chars"),
    )


def hosted(spark, n):
    """8-line docs, host = id % (n/64): 64 docs/host at every scale;
    2 chrome lines repeat host-wide, 6 lines are doc-unique."""
    hosts = max(n // 64, 1)
    host = (F.col("id") % hosts).cast("string")
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        host.alias("host"),
        F.concat_ws(
            "\n",
            F.concat(F.lit("NAV "), host),
            F.concat(F.lit("FOOTER "), host),
            *[
                F.concat(F.lit(f"line{k} doc "), F.col("id").cast("string"))
                for k in range(6)
            ],
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("scale-r10-curation")
    base = 20_000
    for label, factor in (("1x", 1), ("20x", 20)):
        n = base * factor
        d = docs(spark, n)
        h = hosted(spark, n)
        t_x = best2(lambda: exact_substring_excise(d, width=8))
        t_b = best2(
            lambda: host_boilerplate_removal(
                h, host_col="host", threshold_pct=50, min_docs=3
            )
        )
        ref = d.filter(F.col("doc_id") % 2 == 0)
        cur = d.filter(F.col("doc_id") % 2 == 1)
        feats = {
            "lang": F.col("lang"),
            "source": F.col("source"),
            "len_bucket": F.least(F.floor(F.col("n_chars") / 100), F.lit(9)),
        }
        t_p = best2(lambda: drift_psi(ref, cur, feats))
        print(
            f"{label} n={n}: exact_substring_excise={t_x:.2f}s "
            f"host_boilerplate={t_b:.2f}s drift_psi={t_p:.2f}s"
        )
    spark.stop()




def main_tail() -> None:
    """Second batch (holdout / k-anonymity / OOV drift), same instrument."""
    from pyspark.sql import functions as F  # noqa: F811

    from sap_data_pipeline_spark.operators.corpus import oov_drift
    from sap_data_pipeline_spark.operators.quality import k_anonymity_report
    from sap_data_pipeline_spark.operators.sampling import proportional_holdout

    spark = get_spark("scale-r10-curation2")
    base = 20_000
    for label, factor in (("1x", 1), ("20x", 20)):
        n = base * factor
        d = docs(spark, n)
        t_h = best2(lambda: proportional_holdout(d, "lang", n // 10, key="doc_id"))
        qid = d.select(
            "lang", "source",
            F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).alias("lb"),
        )
        t_k = best2(lambda: k_anonymity_report(qid, ["lang", "source", "lb"], 5))
        ref = d.filter(F.col("doc_id") % 2 == 0)
        cur = d.filter(F.col("doc_id") % 2 == 1)
        t_o = best2(lambda: oov_drift(ref, cur, group_col="lang"))
        print(
            f"{label} n={n}: proportional_holdout={t_h:.2f}s "
            f"k_anonymity={t_k:.2f}s oov_drift={t_o:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main_tail() if "--tail" in sys.argv else main()
