"""Tests for the perceptual image near-dup family (aHash over the real
BMP decode path + banded Hamming pairing)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _hash_of(spark, px):
    from sap_data_pipeline_spark.operators.multimodal import (
        encode_bmp,
        image_ahash,
    )

    payload = encode_bmp(px.astype(np.uint8))
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    [row] = image_ahash(media).collect()
    return row


def test_ahash_hand_computed_two_tone(spark):
    """Left half dark, right half bright: bits are 1 exactly on the
    bright half (strict > mean), independent of image size."""
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:, 8:, :] = 200
    row = _hash_of(spark, px)
    # row-major 8x8: each grid row is 0b00001111 -> 0x0F
    assert row["hash_hi"] == 0x0F0F0F0F
    assert row["hash_lo"] == 0x0F0F0F0F
    assert (row["width"], row["height"]) == (16, 16)


def test_ahash_brightness_invariance(spark):
    """A uniform +b on every channel byte flips no bit — the invariance
    the near-dup pairing relies on."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 200, size=(11, 13, 3))
    a = _hash_of(spark, base)
    b = _hash_of(spark, base + 37)
    assert (a["hash_hi"], a["hash_lo"]) == (b["hash_hi"], b["hash_lo"])


def test_ahash_flat_image_is_all_zero_bits(spark):
    """Every cell equals the mean -> strict > sets nothing (consistent
    tie rule both engines)."""
    row = _hash_of(spark, np.full((8, 8, 3), 55, dtype=np.uint8))
    assert row["hash_hi"] == 0 and row["hash_lo"] == 0


def test_ahash_pairs_pigeonhole_radius(spark):
    """Hashes within Hamming <= 3 are always found (one of 4 bands must
    be intact); a distance-4 pair crafted to damage EVERY band is not a
    candidate — the documented banded-recall boundary."""
    from sap_data_pipeline_spark.operators.multimodal import (
        ahash_near_dup_pairs,
    )

    base_hi, base_lo = 0x12345678, 0x0ABCDEF0
    rows = [
        (1, base_hi, base_lo),
        (2, base_hi ^ 0b111, base_lo),          # distance 3 -> found
        (3, base_hi, base_lo),                   # distance 0 -> found
        # one flipped bit in each 16-bit band -> distance 4, no band
        # intact -> NOT a candidate
        (4, base_hi ^ (1 << 20) ^ 1, base_lo ^ (1 << 20) ^ 1),
    ]
    hashes = spark.createDataFrame(
        rows, "media_id long, hash_hi long, hash_lo long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(hashes, max_hamming=3).collect()
    }
    assert got == {(1, 2): 3, (1, 3): 0, (2, 3): 3}


def test_ahash_pairs_each_pair_emitted_once(spark):
    """Identical hashes share all 4 bands — the pair must still come out
    exactly once."""
    from sap_data_pipeline_spark.operators.multimodal import (
        ahash_near_dup_pairs,
    )

    hashes = spark.createDataFrame(
        [(1, 99, 7), (2, 99, 7)], "media_id long, hash_hi long, hash_lo long"
    )
    out = ahash_near_dup_pairs(hashes).collect()
    assert len(out) == 1 and out[0]["hamming"] == 0


def test_templated_synth_template_peers_hash_equal(spark, star):
    """End-to-end over the real decode: docs sharing a template (with
    different brightness) produce identical hashes; the pairing finds
    every same-template pair at Hamming 0."""
    from sap_data_pipeline_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        image_ahash,
        synth_bmp_media_templated,
    )

    docs = star.documents.limit(60)
    hashes = image_ahash(synth_bmp_media_templated(docs, n_templates=10))
    n_distinct = (
        hashes.withColumn("t", F.pmod("media_id", F.lit(10)))
        .groupBy("t")
        .agg(F.count_distinct("hash_hi", "hash_lo").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert n_distinct == 1  # template ⇒ one hash, brightness absorbed
    pairs = ahash_near_dup_pairs(hashes, max_hamming=0)
    same_template = pairs.filter(
        F.pmod("id_a", F.lit(10)) == F.pmod("id_b", F.lit(10))
    ).count()
    ids = [r["media_id"] for r in hashes.select("media_id").collect()]
    from collections import Counter

    want = sum(
        n * (n - 1) // 2 for n in Counter(i % 10 for i in ids).values()
    )
    assert same_template == want


def test_ahash_clusters_chain_collapses_to_one(spark):
    """Perceptual dups chain: A~B and B~C within radius with A~C beyond
    it must still land in ONE cluster with the min id canonical."""
    from sap_data_pipeline_spark.operators.dedup import near_dup_clusters
    from sap_data_pipeline_spark.operators.multimodal import (
        ahash_near_dup_pairs,
    )

    base = 0x0F0F0F0F
    rows = [
        (1, base, base),                  # A
        (2, base ^ 0b11, base),           # B: 2 bits from A
        (3, base ^ 0b11, base ^ 0b11),    # C: 2 bits from B, 4 from A
        (9, 0x70F0F0F0, 0x12345678),      # unrelated singleton
    ]
    hashes = spark.createDataFrame(
        rows, "media_id long, hash_hi long, hash_lo long"
    )
    pairs = ahash_near_dup_pairs(hashes, max_hamming=3)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got_pairs and (2, 3) in got_pairs
    assert (1, 3) not in got_pairs  # distance 4 — chained only

    out = near_dup_clusters(
        hashes.select("media_id"), id_col="media_id", pairs=pairs
    )
    got = {r["media_id"]: (r["cluster_id"], r["cluster_size"],
                           r["is_canonical"]) for r in out.collect()}
    assert got[1] == (1, 3, True)
    assert got[2] == (1, 3, False) and got[3] == (1, 3, False)
    assert got[9] == (9, 1, True)


def test_ahash_mixed_modality_batch_degrades_to_null_hash(spark):
    """ADVICE r10: one non-BMP or null payload in a batch must not kill
    the job — the row degrades to the null-hash contract (null
    width/height/hash) that ahash_near_dup_pairs already filters,
    while BMP rows in the SAME batch still hash."""
    from sap_data_pipeline_spark.operators.multimodal import (
        encode_bmp,
        image_ahash,
    )

    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:, 8:, :] = 200
    rows = [
        (1, bytearray(encode_bmp(px))),          # real BMP
        (2, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)),  # PNG magic
        (3, None),                               # null payload
        (4, bytearray(b"shrt")),                 # truncated garbage
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in image_ahash(media).collect()}
    assert len(got) == 4
    assert got[1]["hash_hi"] == 0x0F0F0F0F  # the BMP row still hashes
    for mid in (2, 3, 4):
        assert got[mid]["width"] is None
        assert got[mid]["height"] is None
        assert got[mid]["hash_hi"] is None
        assert got[mid]["hash_lo"] is None
