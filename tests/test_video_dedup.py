"""Tests for the perceptual video near-dup family (luma-contour
fingerprint over the real Y4M decode path + banded Hamming pairing) —
the video twin of test_audio_dedup.py, completing the
image/audio/video perceptual-dedup triad."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_video_luma_fingerprint_known_bits(spark):
    """Hand-built two-frame clips: rising luma sets bit 0, falling
    doesn't; a corrupt payload degrades to the all-NULL row."""
    from sap_data_pipeline_spark.operators.multimodal import (
        video_luma_fingerprint,
    )

    def clip(levels, w=4, h=2):
        parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
        for lvl in levels:
            parts.append(
                b"FRAME\n" + bytes([lvl]) * (w * h)
                + bytes([128]) * (w * h // 2)
            )
        return b"".join(parts)

    rows = [
        (1, clip([10, 20, 15])),   # up then down -> bits 0b01
        (2, clip([30, 30])),       # equal -> strict > unset
        (3, b"\x89PNG not video"),  # degrade row
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in video_luma_fingerprint(df).collect()}
    assert got[1]["fingerprint"] == 0b01
    assert got[1]["n_frames"] == 3
    assert got[1]["total_luma"] == 8 * (10 + 20 + 15)
    assert got[2]["fingerprint"] == 0
    assert got[3]["n_frames"] is None
    assert got[3]["total_luma"] is None
    assert got[3]["fingerprint"] is None


def test_video_fp_pairs_delegates_banded_plan(spark):
    """video_fp_pairs shares the audio banding: pigeonhole recall at
    radius 3, the every-band-damaged distance-4 pair excluded, NULL
    fingerprints (corrupt payloads) excluded."""
    from sap_data_pipeline_spark.operators.multimodal import video_fp_pairs

    base = 0x5C32B1E9
    rows = [
        (1, base),
        (2, base ^ 0b101),  # distance 2 -> found
        (3, base ^ (1 << 30) ^ (1 << 20) ^ (1 << 10) ^ 1),  # 4, no band
        (4, None),
    ]
    fps = spark.createDataFrame(rows, "media_id long, fingerprint long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in video_fp_pairs(fps, max_hamming=3).collect()
    }
    assert got == {(1, 2): 2}


def test_templated_y4m_brightness_invariance_and_spike_radius(spark, star):
    """End-to-end over the real Y4M decode: template peers with the
    same spike status produce IDENTICAL fingerprints regardless of the
    uniform brightness offset (every frame sum shifts by w·h·b,
    preserving every delta sign), spike variants sit within the
    radius-3 pairing of their base, and no cross-template pair exists
    (fixture designed at cross-template min Hamming 5 — the
    fixture-design measurement pinned in the synth docstring)."""
    from sap_data_pipeline_spark.operators.multimodal import (
        synth_y4m_media_templated,
        video_fp_pairs,
        video_luma_fingerprint,
    )

    docs = star.documents.limit(400)
    fps = video_luma_fingerprint(
        synth_y4m_media_templated(docs, n_templates=40)
    ).cache()
    # (template, spike-status) ⇒ exactly one fingerprint — brightness
    # absorbed
    n_distinct = (
        fps.select(
            F.pmod("media_id", F.lit(40)).alias("t"),
            (F.pmod((F.col("media_id") / 40).cast("long"), F.lit(5)) == 0)
            .alias("v"),
            "fingerprint",
        )
        .groupBy("t", "v")
        .agg(F.count_distinct("fingerprint").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert n_distinct == 1
    pairs = video_fp_pairs(fps, max_hamming=3)
    cross = pairs.filter(
        F.pmod("id_a", F.lit(40)) != F.pmod("id_b", F.lit(40))
    ).count()
    assert cross == 0
    from collections import Counter

    ids = [r["media_id"] for r in fps.select("media_id").collect()]
    per_t = Counter(i % 40 for i in ids)
    expect = sum(n * (n - 1) // 2 for n in per_t.values())
    assert pairs.count() == expect
    # spike variants really are NEAR dups, not exact
    assert pairs.filter("hamming > 0").count() > 0
    fps.unpersist()


def test_templated_y4m_no_pixel_wrap(spark, star):
    """The closed-form oracle only holds if no pixel wraps mod 256:
    level ≤ 179, offset ≤ 20, texture ≤ 42 — re-derive the max over
    the fixture's real bytes."""
    from sap_data_pipeline_spark.operators.multimodal import (
        decode_y4m,
        synth_y4m_media_templated,
    )

    rows = synth_y4m_media_templated(
        star.documents.limit(120), n_templates=40
    ).collect()
    peak = 0
    for r in rows:
        _, _, _, _, frames = decode_y4m(r["payload"])
        peak = max(peak, max(int(f.max()) for f in frames))
    assert peak <= 241
