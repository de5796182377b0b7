"""Multimodal plumbing: schema, Arrow batch shape, deterministic decode."""

from __future__ import annotations

import pytest

from sap_data_pipeline_spark.operators import multimodal as MM


def test_synth_media_schema(spark, star):
    media = MM.synth_media(star.documents.limit(10))
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_extract_features_shapes(spark, star):
    media = MM.synth_media(star.documents.limit(20))
    feats = MM.extract_features(media, batch_parallelism=4)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature"]) == MM.FakeDecoder.DIM
        assert r["n_bytes"] > 0
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # histogram normalized


def test_fake_decoder_deterministic():
    f1 = MM.FakeDecoder.decode(b"abc")
    f2 = MM.FakeDecoder.decode(b"abc")
    assert f1 == f2
    assert MM.FakeDecoder.decode(None) == [0.0] * MM.FakeDecoder.DIM


def test_real_decode_gated():
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"payload")


def test_sample_frames_shape(spark, star):
    from sap_data_pipeline_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(star.documents.limit(20))
    frames = sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert {r["frame_idx"] for r in rows} <= {0, 1, 2, 3}
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
        assert isinstance(r["frame_payload"], (bytes, bytearray))
    assert all(len(v) == 4 for v in per_media.values())  # texts are >4 bytes
