"""Tests for the perceptual audio near-dup family (energy-contour
fingerprint over the real WAV decode path + banded Hamming pairing) —
the audio twin of test_image_dedup.py."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_audio_fp_pairs_pigeonhole_radius(spark):
    """Fingerprints within Hamming <= 3 are always found (one of the
    four 8-bit bands must be intact); a distance-4 fingerprint crafted
    to damage EVERY band is not a candidate — the documented
    banded-recall boundary."""
    from sap_data_pipeline_spark.operators.multimodal import audio_fp_pairs

    base = 0x12A4CE70
    rows = [
        (1, base),
        (2, base ^ 0b111),  # distance 3 -> found
        (3, base),          # distance 0 -> found
        # one flipped bit in each 8-bit band -> distance 4, no band
        # intact -> NOT a candidate
        (4, base ^ (1 << 25) ^ (1 << 17) ^ (1 << 9) ^ 1),
        (5, None),          # corrupt payload row: excluded
    ]
    fps = spark.createDataFrame(rows, "media_id long, fingerprint long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_fp_pairs(fps, max_hamming=3).collect()
    }
    assert got == {(1, 2): 3, (1, 3): 0, (2, 3): 3}


def test_audio_fp_pairs_each_pair_emitted_once(spark):
    """Identical fingerprints share all 4 bands — the pair must still
    come out exactly once."""
    from sap_data_pipeline_spark.operators.multimodal import audio_fp_pairs

    fps = spark.createDataFrame(
        [(1, 9917), (2, 9917)], "media_id long, fingerprint long"
    )
    out = audio_fp_pairs(fps).collect()
    assert len(out) == 1 and out[0]["hamming"] == 0


def test_templated_wav_gain_invariance_and_spike_radius(spark, star):
    """End-to-end over the real WAV decode: template peers with the
    same spike status produce IDENTICAL fingerprints regardless of
    gain (energies scale by gain², preserving every delta sign), and
    spike variants sit within the radius-3 pairing of their base."""
    from sap_data_pipeline_spark.operators.multimodal import (
        audio_energy_fingerprint,
        audio_fp_pairs,
        synth_wav_media_templated,
    )

    docs = star.documents.limit(400)
    fps = audio_energy_fingerprint(
        synth_wav_media_templated(docs, n_templates=40)
    ).cache()
    # (template, spike-status) ⇒ exactly one fingerprint — gain absorbed
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
    # every same-template pair (base x variant included) is within the
    # radius: pairs restricted to a template = C(n_t, 2) exactly
    pairs = audio_fp_pairs(fps, max_hamming=3)
    cross = pairs.filter(
        F.pmod("id_a", F.lit(40)) != F.pmod("id_b", F.lit(40))
    ).count()
    assert cross == 0  # fixture designed for zero cross-template pairs
    from collections import Counter

    ids = [r["media_id"] for r in fps.select("media_id").collect()]
    per_t = Counter(i % 40 for i in ids)
    expect = sum(n * (n - 1) // 2 for n in per_t.values())
    assert pairs.count() == expect
    # variants really are NEAR dups: some nonzero hammings exist
    assert pairs.filter("hamming > 0").count() > 0
    fps.unpersist()
