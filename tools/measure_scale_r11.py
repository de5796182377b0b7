"""One-off scaling measurements for the round-11 operators (SCALE.md).

Times each new operator at 1× and 20× synthetic scale in one session
(best of 2 after a warm run), printing the table rows SCALE.md records.
Usage: python tools/measure_scale_r11.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.functions import text as X  # noqa: E402
from sap_data_pipeline_spark.operators.corpus import (  # noqa: E402
    bigram_logprob,
    bloom_bitmap,
    bloom_probe,
)
from sap_data_pipeline_spark.operators.relational import (  # noqa: E402
    snapshot_diff_stats,
)
from sap_data_pipeline_spark.operators.sampling import (  # noqa: E402
    domain_reweight_mw,
)
from sap_data_pipeline_spark.operators.temporal import (  # noqa: E402
    crawl_schedule,
    url_change_rate,
)
from sap_data_pipeline_spark.session import get_spark  # noqa: E402

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast",
         "tree", "house", "blue", "sky", "return", "value", "data"]


def best2(make_df):
    runs = []
    for _ in range(3):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs[1:])


def docs(spark, n, toks=40):
    """~40-token synthetic docs with skewed word choice + per-doc tail
    (vocabulary grows with n so the bigram table does too)."""
    word = F.array(*[F.lit(w) for w in WORDS])
    body = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(toks)),
        lambda i: F.element_at(word, (F.pmod(F.col("id") * 31 + i * 7,
                                             F.lit(len(WORDS))) + 1).cast("int")),
    ))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(body, F.lit(" tail"), (F.col("id") % (n // 10 + 1)).cast("string"))
        .alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
        (F.length(body) + 8).alias("n_chars"),
    )


def fetches(spark, n):
    u = F.pmod(F.col("id"), F.lit(n // 20 + 1))
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("u"), u.cast("string")).alias("url"),
        F.timestamp_seconds(1_700_000_000 + (F.col("id") * 977) % (90 * 86400))
        .alias("fetch_ts"),
        F.md5(F.concat(u.cast("string"), (F.col("id") % 5).cast("string")))
        .alias("content_hash"),
    )


def main() -> None:
    spark = get_spark("scale_r11")
    spark.sparkContext.setLogLevel("ERROR")
    n1 = 20_000

    def code_router(n):
        d = docs(spark, n)
        s = X.code_signals(F.col("text"))
        return d.select("doc_id", *[v.alias(k) for k, v in s.items()]) \
            .withColumn("is_code", X.is_code_verdict(
                {k: F.col(k) for k in s}))

    def diff(n):
        d = docs(spark, n)
        ref = d.select("doc_id", "source",
                       F.md5("text").alias("fingerprint"))
        cur = d.filter(F.col("doc_id") % 11 != 0).select(
            "doc_id", "source",
            F.md5(F.concat(F.col("text"),
                           F.when(F.col("doc_id") % 7 == 0, F.lit("u"))
                           .otherwise(F.lit("")))).alias("fingerprint"))
        return snapshot_diff_stats(ref, cur, group_col="source")

    def reweight(n):
        d = docs(spark, n)
        per = d.groupBy(F.col("source").alias("domain")).agg(
            (F.count(F.lit(1)) / F.lit(float(n))).alias("weight"),
            (F.avg("n_chars") / 200.0 - 1.0).alias("excess_loss"))
        return domain_reweight_mw(per.select("domain", "weight"),
                                  per.select("domain", "excess_loss"))

    def funnel(n):
        from sap_data_pipeline_spark.operators.quality import (
            admission_funnel,
        )
        d = docs(spark, n)
        sig = X.code_signals(F.col("text"))
        enriched = d.select(
            "source",
            X.token_count("text").alias("_ntok"),
            X.is_code_verdict(sig).alias("_is_code"),
            X.quality_score("text").alias("_q"),
        )
        return admission_funnel(
            enriched,
            {"too_short": F.col("_ntok") < 20,
             "code": F.col("_is_code"),
             "low_quality": F.col("_q") < 0.5},
            group_col="source",
        )

    def bloom(n):
        seen = docs(spark, n).select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"))
        bm = bloom_bitmap(seen, "url", m_bits=1 << 20, k=4)
        return bloom_probe(seen, bm, "url", m_bits=1 << 20, k=4)

    for name, fn in [
        ("code_prose_router kernel: code_signals + verdict (pure regex scan)",
         code_router),
        ("url_change_rate (url-keyed lag window, urls ~ n/20)",
         lambda n: url_change_rate(fetches(spark, n),
                                   order_tiebreak="event_id")),
        ("corpus_snapshot_diff (id-keyed full-outer fingerprint join)", diff),
        ("domain_reweight_mw (7 domains; losses from corpus aggregates)",
         reweight),
        ("url_seen_bloom kernel: bloom build m=2^20 + map-side probe", bloom),
        ("bigram_logprob (bigram count agg + 3 keyed windows)",
         lambda n: bigram_logprob(docs(spark, n))),
        ("admission_funnel (token+code+quality kernels, one scan)",
         funnel),
        ("crawl_schedule (lag window -> Hamilton -> per-host rank)",
         lambda n: crawl_schedule(fetches(spark, n), n // 100 + 10,
                                  order_tiebreak="event_id")),
    ]:
        t1 = best2(lambda: fn(n1))
        tN = best2(lambda: fn(n1 * 20))
        print(f"| {name} | {t1:.1f} s | 20×: {tN:.1f} s | {tN / t1:.1f}× |",
              flush=True)


if __name__ == "__main__":
    main()
