"""One-off scaling measurements for the r10 admission additions
(SCALE.md round-10 section): wall-clock at 1x and 20x synthetic scale
for ``dedup_safe_split``, ``host_quality_gate``+``blocklist_filter``,
``link_host_graph``, ``snapshot_admission``, and the image-aHash
near-dup chain.  Best of 2 after a warm run, same instrument as
tools/measure_scale_r10_curation.py.  Usage:

    python tools/measure_scale_r10_admission.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sap_data_pipeline_spark.operators.corpus import link_host_graph  # noqa: E402
from sap_data_pipeline_spark.operators.dedup import snapshot_admission  # noqa: E402
from sap_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    ahash_near_dup_pairs,
    image_ahash,
    synth_bmp_media_templated,
)
from sap_data_pipeline_spark.operators.quality import (  # noqa: E402
    blocklist_filter,
    host_quality_gate,
)
from sap_data_pipeline_spark.operators.sampling import dedup_safe_split  # noqa: E402
from sap_data_pipeline_spark.session import get_spark  # noqa: E402


def best2(make_df):
    runs = []
    for _ in range(3):  # run 1 warms; report best of the last 2
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs[1:])


def docs(spark, n):
    """~30-token docs; every 5th doc is an exact re-crawl of doc-4 so
    duplicate groups exist at every scale; host = id % (n/64)."""
    hosts = max(n // 64, 1)
    base_id = F.col("id") - (F.col("id") % 5 == 4).cast("long") * 4
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda j: F.concat(
                F.lit("w"), ((base_id * 17 + j * 3) % 97).cast("string")
            ),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        body.alias("text"),
        (F.col("id") % hosts).cast("string").alias("host"),
    )


def main() -> None:
    spark = get_spark("scale-r10-admission")
    base = 20_000
    img_base = 5_000
    for label, factor in (("1x", 1), ("20x", 20)):
        n = base * factor
        d = docs(spark, n)
        t_split = best2(lambda: dedup_safe_split(d))

        scored = d.select(
            "host", (F.length("text") % 3 == 0).alias("is_low")
        )
        t_gate = best2(
            lambda: blocklist_filter(
                d, host_quality_gate(scored, min_docs=5, max_low_pct=50)
            )
        )

        html = d.select(
            F.col("host").alias("src_host"),
            F.concat(
                F.lit('<a href="https://h'),
                (F.col("doc_id") % 997).cast("string"),
                F.lit('.example.com/p">x</a><a href="http://h'),
                ((F.col("doc_id") * 3 + 1) % 997).cast("string"),
                F.lit('.example.com/q">y</a>'),
            ).alias("html"),
        )
        t_links = best2(lambda: link_host_graph(html))

        ref = d.filter(F.col("doc_id") % 2 == 0)
        cur = d.filter(F.col("doc_id") % 2 == 1)
        t_adm = best2(lambda: snapshot_admission(ref, cur))

        ni = img_base * factor
        imgs = docs(spark, ni).select("doc_id")
        t_img = best2(
            lambda: ahash_near_dup_pairs(
                image_ahash(
                    synth_bmp_media_templated(imgs, n_templates=max(ni // 5, 1))
                )
            )
        )
        print(
            f"{label} n={n}: dedup_safe_split={t_split:.2f}s "
            f"host_blocklist={t_gate:.2f}s link_graph={t_links:.2f}s "
            f"snapshot_admission={t_adm:.2f}s "
            f"image_ahash_pairs(n={ni})={t_img:.2f}s"
        )
    spark.stop()




def main_anchor() -> None:
    """anchor_text_terms batch, same instrument."""
    from sap_data_pipeline_spark.operators.corpus import anchor_text_terms

    spark = get_spark("scale-r10-anchor")
    base = 20_000
    for label, factor in (("1x", 1), ("20x", 20)):
        n = base * factor
        html = docs(spark, n).select(
            F.concat(
                F.lit('<a href="https://h'),
                (F.col("doc_id") % 997).cast("string"),
                F.lit('.example.com/p">click best site '),
                (F.col("doc_id") % 5).cast("string"),
                F.lit('</a><a href="http://h'),
                ((F.col("doc_id") * 3 + 1) % 997).cast("string"),
                F.lit('.example.com/q">read more '),
                (F.col("doc_id") % 4).cast("string"),
                F.lit("</a>"),
            ).alias("html")
        )
        t = best2(lambda: anchor_text_terms(html, k=5))
        print(f"{label} n={n}: anchor_text_terms={t:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main_anchor() if "--anchor" in sys.argv else main()
