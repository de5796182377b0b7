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


def test_decode_wav_meta_exact_fixture():
    """REAL stdlib WAV decode: a hand-built 16-bit PCM payload must parse
    to exactly the parameters it was written with."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        # 3200 stereo frames of constant ±1000 → 200 ms, rms exactly 1000
        w.writeframes(struct.pack(
            "<6400h", *[1000 if i % 2 == 0 else -1000 for i in range(6400)]
        ))
    rate, n_ch, n_frames, dur, rms, peak = MM.decode_wav_meta(buf.getvalue())
    assert (rate, n_ch, n_frames) == (16000, 2, 3200)
    assert dur == 200
    assert rms == 1000.0 and peak == 1000


def test_decode_wav_meta_gates_compressed():
    """Non-RIFF payloads stay env-gated (mp3/jpeg need codec libs)."""
    with pytest.raises(NotImplementedError):
        MM.decode_wav_meta(b"ID3\x04fake mp3 header and data")


def test_extract_wav_meta_roundtrip(spark, star):
    """synth → parse round-trip through the Arrow-batched stage: every
    field must equal its closed form in doc_id."""
    docs = star.documents.limit(25).select("doc_id")
    got = {r["media_id"]: r for r in
           MM.extract_wav_meta(MM.synth_wav_media(docs)).collect()}
    assert len(got) == 25
    for did, r in got.items():
        n_frames = 100 + did % 400
        amp = did % 1000 + 1
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert r["n_frames"] == n_frames
        assert r["n_bytes"] == 44 + 2 * n_frames
        assert r["duration_ms"] == n_frames * 1000 // 8000
        assert r["rms_amplitude"] == float(amp)
        assert r["peak_amplitude"] == amp
