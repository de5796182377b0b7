"""Round-13 late-batch measurement battery (results in SCALE.md r13
section, "late-r13 kernels" table): 1x/20x synthetic rows for the six
operators added after the main r13 battery — the video near-dup arm
(video_luma_fingerprint / video_fp_pairs / video_fp_clusters) and the
ingest-hygiene trio (sitemap_index_extract / http_revalidation_plan /
charset_sniff).  Run on a QUIET machine:

    python tools/measure_scale_r13b.py [op ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "12g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def timeit(df_fn):
    best = None
    for i in range(3):  # run 1 = warm, then best of 2
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i and (best is None or dt < best):
            best = dt
    return best


def docs(n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def fetch_log(n):
    # the catalog fixture's shape: 8 header variants, real IMF-fixdate
    # strings formatted from closed-form epochs
    from sap_data_pipeline_spark.operators.temporal import IMF_FIXDATE_FMT

    d = F.col("id")
    v = F.pmod(d, F.lit(8))
    fetched = (F.lit(1_700_000_000) + F.pmod(d * 37, F.lit(100_000))).cast(
        "long"
    )

    def imf(e):
        return F.date_format(F.timestamp_seconds(e), IMF_FIXDATE_FMT)

    return spark.range(n).select(
        F.concat(F.lit("https://h"), F.pmod(d, F.lit(50)).cast("string"),
                 F.lit("/p"), d.cast("string")).alias("url"),
        fetched.alias("fetched_at"),
        F.when(v.isin(0, 1, 3, 7), F.lit('"e"')).alias("etag"),
        F.when(v == 2, imf(fetched - F.lit(5000)))
        .when(v == 5, imf(fetched - F.pmod(d, F.lit(200_000)) * 10))
        .when(v == 6, F.lit("not-a-date"))
        .when(v == 7, imf(fetched - F.lit(100))).alias("last_modified"),
        F.when(v == 0, F.lit("public, max-age=3600"))
        .when(v == 1, F.lit('max-age="0"'))
        .when(v == 2, F.lit("no-cache, max-age=9999"))
        .when(v == 3, F.lit("no-store"))
        .when(v == 7, F.lit("x-max-age=5")).alias("cache_control"),
        F.when(v == 4, imf(fetched + F.pmod(d, F.lit(1000)) - F.lit(500)))
        .alias("expires"),
        F.when(v.isin(2, 4, 5, 7), imf(fetched)).alias("date"),
    )


def sitemap_files(n):
    # n hosts x 30 <sitemap> entries each
    h = F.col("id").cast("string")
    entry = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("<sitemap><loc>https://h"), h, F.lit("/sm-"),
            i.cast("string"),
            F.lit(".xml?p=1&amp;c=2</loc><lastmod>2024-03-01</lastmod>"
                  "</sitemap>"),
        ),
    )
    return spark.range(n).select(
        F.concat(F.lit("h"), h).alias("host"),
        F.concat(F.lit("<sitemapindex>"), F.concat_ws("", entry),
                 F.lit("</sitemapindex>")).alias("sitemap_xml"),
    )


results = {}

from sap_data_pipeline_spark.operators import multimodal as MM
from sap_data_pipeline_spark.operators.corpus import sitemap_index_extract
from sap_data_pipeline_spark.operators.dedup import near_dup_clusters
from sap_data_pipeline_spark.operators.sampling import curriculum_interleave
from sap_data_pipeline_spark.operators.similarity import matryoshka_agreement
from sap_data_pipeline_spark.operators.temporal import (
    http_revalidation_plan,
    parse_http_response_head,
)


def video_fps(n):
    return MM.video_luma_fingerprint(
        MM.synth_y4m_media_templated(docs(n),
                                     n_templates=max(40, n // 200))
    )


KERNELS = {
    "video_luma_fingerprint": (
        lambda n: (lambda: video_fps(n)),
        3_000,
    ),
    "video_fp_pairs": (
        lambda n: (lambda: MM.video_fp_pairs(video_fps(n))),
        3_000,
    ),
    "video_fp_clusters": (
        lambda n: (lambda fps=video_fps(n): (lambda: near_dup_clusters(
            fps.select("media_id"), id_col="media_id",
            pairs=MM.video_fp_pairs(fps))))(),
        3_000,
    ),
    "sitemap_index_extract": (
        lambda n: (lambda df=sitemap_files(n): (
            lambda: sitemap_index_extract(df)))(),
        5_000,
    ),
    "http_revalidation_plan": (
        lambda n: (lambda df=fetch_log(n): (
            lambda: http_revalidation_plan(df, now=1_700_050_000)))(),
        100_000,
    ),
    "charset_sniff": (
        lambda n: (lambda df=MM.synth_charset_media(docs(n)): (
            lambda: MM.charset_sniff(df)))(),
        100_000,
    ),
    "curriculum_interleave": (
        lambda n: (lambda df=spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"),
                     F.pmod(F.col("id"), F.lit(50)).cast("string"))
            .alias("source"),
            F.pmod(F.col("id") * 31, F.lit(100_000)).alias("q"),
        ): (lambda: curriculum_interleave(df, "q")))(),
        100_000,
    ),
}

KERNELS["http_headers_parse"] = (
    lambda n: (lambda df=spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.concat(
            F.lit("HTTP/1.1 200 OK\r\nDate: Tue, 14 Nov 2023 22:13:20 "
                  "GMT\r\nCache-Control: public\r\nCache-Control: "
                  "max-age="),
            F.pmod(F.col("id"), F.lit(9000)).cast("string"),
            F.lit('\r\nETag: "e'), F.col("id").cast("string"),
            F.lit('"\r\nContent-Type: text/html; charset=UTF-8\r\n'
                  "Content-Length: 123\r\n"),
        ).alias("raw_head"),
    ): (lambda: parse_http_response_head(df)))(),
    100_000,
)

KERNELS["matryoshka_dim_agreement"] = (
    # audit-cadence op: quadratic in the SAMPLE by design (documented
    # like minhash_jaccard_estimate) -- the row pins the curve
    lambda n: (lambda df=spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.sin((F.col("id") + 1) * (j + 1) * 0.37),
        ).alias("embedding"),
    ): (lambda: matryoshka_agreement(df, ks=(8, 16, 32))))(),
    150,
)

name_filter = sys.argv[1:] or list(KERNELS)
for name in name_filter:
    mk, base = KERNELS[name]
    t1 = timeit(mk(base))
    t20 = timeit(mk(base * 20))
    print(f"{name}: 1x({base})={t1:.2f}s 20x={t20:.2f}s "
          f"ratio={t20 / t1:.1f}x", flush=True)
