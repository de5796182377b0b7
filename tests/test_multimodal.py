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


def test_bmp_encode_decode_roundtrip_exact():
    """REAL stdlib BMP codec: encode → decode returns the identical pixel
    array, across widths that exercise every stride-padding remainder."""
    import numpy as np

    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 16):  # 3w % 4 covers 3, 2, 1, 0 padding bytes
        px = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
        got_w, got_h, bpp, got = MM.decode_bmp_pixels(MM.encode_bmp(px))
        assert (got_w, got_h, bpp) == (w, 5, 24)
        assert np.array_equal(got, px)


def test_bmp_decode_row_order_is_top_down():
    """BMP stores rows bottom-up; decode must flip back to image order —
    a payload whose TOP row is all-255 must come back with row 0 = 255."""
    import numpy as np

    px = np.zeros((3, 2, 3), dtype=np.uint8)
    px[0, :, :] = 255
    payload = MM.encode_bmp(px)
    *_, got = MM.decode_bmp_pixels(payload)
    assert got[0].min() == 255 and got[1:].max() == 0


def test_bmp_decode_gates_compressed():
    with pytest.raises(NotImplementedError):
        MM.decode_bmp_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_resize_images_nearest_neighbor_exact(spark, star):
    """Resize 8x5 via the Arrow stage, then verify each output pixel is
    the exact nearest-neighbor gather from the closed-form source."""
    import numpy as np

    docs = star.documents.limit(10).select("doc_id")
    resized = {r["media_id"]: r["payload"] for r in
               MM.resize_images(MM.synth_bmp_media(docs), width=8, height=5).collect()}
    assert len(resized) == 10
    for did, payload in resized.items():
        w, h = 4 + did % 13, 3 + did % 7
        got_w, got_h, bpp, px = MM.decode_bmp_pixels(bytes(payload))
        assert (got_w, got_h, bpp) == (8, 5, 24)
        r2 = (np.arange(5) * h) // 5
        c2 = (np.arange(8) * w) // 8
        expect = (
            did + 11 * r2[:, None, None] + 5 * c2[None, :, None]
            + np.arange(3)[None, None, :]
        ) % 256
        assert np.array_equal(px, expect.astype(np.uint8))


def test_extract_image_meta_closed_form(spark, star):
    """synth → parse round-trip: width/height/n_bytes/stats must equal
    their closed forms in doc_id (differential proof of the decode)."""
    import numpy as np

    docs = star.documents.limit(15).select("doc_id")
    got = {r["media_id"]: r for r in
           MM.extract_image_meta(MM.synth_bmp_media(docs)).collect()}
    assert len(got) == 15
    for did, r in got.items():
        w, h = 4 + did % 13, 3 + did % 7
        stride = ((3 * w + 3) // 4) * 4
        assert (r["width"], r["height"], r["bits_per_pixel"]) == (w, h, 24)
        assert r["n_bytes"] == 54 + stride * h
        vals = (
            did + 11 * np.arange(h)[:, None, None]
            + 5 * np.arange(w)[None, :, None] + np.arange(3)[None, None, :]
        ) % 256
        assert r["max_luma"] == int(vals.max())
        assert abs(r["mean_luma"] - float(vals.mean())) < 1e-12


def test_y4m_decode_hand_built_stream():
    """REAL Y4M parse: a hand-assembled two-frame C420 stream must come
    back with exactly the written dims, fps, and luma planes."""
    import numpy as np

    w, h = 4, 2
    f0 = np.arange(8, dtype=np.uint8).reshape(h, w)
    f1 = (np.arange(8, dtype=np.uint8) + 100).reshape(h, w)
    chroma = bytes([128] * (w * h // 2))
    payload = (
        b"YUV4MPEG2 W4 H2 F30000:1001 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + f0.tobytes() + chroma
        + b"FRAME\n" + f1.tobytes() + chroma
    )
    gw, gh, num, den, frames = MM.decode_y4m(payload)
    assert (gw, gh, num, den) == (4, 2, 30000, 1001)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f0) and np.array_equal(frames[1], f1)


def test_y4m_decode_gates_compressed():
    with pytest.raises(NotImplementedError):
        MM.decode_y4m(b"\x00\x00\x00\x18ftypmp42 fake mp4")


def test_extract_video_meta_closed_form(spark, star):
    docs = star.documents.limit(12).select("doc_id")
    got = {r["media_id"]: r for r in
           MM.extract_video_meta(MM.synth_y4m_media(docs)).collect()}
    assert len(got) == 12
    for did, r in got.items():
        w, h, nf = 8 + 2 * (did % 5), 6 + 2 * (did % 3), 2 + did % 6
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert (r["fps_num"], r["fps_den"]) == (25, 1)
        assert r["duration_ms"] == nf * 40
        header = len(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n")
        assert r["n_bytes"] == header + nf * (6 + w * h * 3 // 2)
        total = sum(
            (did + 17 * f + 3 * rr + cc) % 256
            for f in range(nf) for rr in range(h) for cc in range(w)
        )
        assert abs(r["mean_luma"] - total / (w * h * nf)) < 1e-12


def test_sample_video_frames_even_spacing_and_pixels(spark, star):
    """Sampled frames carry the SOURCE frame index and the exact raw
    luma plane of that frame."""
    import numpy as np

    docs = star.documents.limit(8).select("doc_id")
    rows = MM.sample_video_frames(MM.synth_y4m_media(docs), n_frames=3).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 8
    for did, rs in by_media.items():
        w, h, nf = 8 + 2 * (did % 5), 6 + 2 * (did % 3), 2 + did % 6
        k = min(3, nf)
        assert sorted(r["frame_idx"] for r in rs) == [(i * nf) // k for i in range(k)]
        for r in rs:
            f = r["frame_idx"]
            expect = (
                (did + 17 * f + 3 * np.arange(h)[:, None] + np.arange(w)[None, :])
                % 256
            ).astype(np.uint8)
            assert np.frombuffer(bytes(r["frame_payload"]), dtype=np.uint8).reshape(
                h, w
            ).tolist() == expect.tolist()


def test_sniff_media_meta_dispatches_all_kinds(spark, star):
    """Magic-byte dispatch: every modality routes to its real decoder,
    unknown blobs quarantine as kind='unknown' rows instead of failing
    the batch."""
    from pyspark.sql import functions as F

    # deterministic subset: limit() re-evaluates per filter branch
    docs = star.documents.filter(F.col("doc_id") < 40).select("doc_id", "text")
    n_docs = docs.count()
    got = {r["media_id"]: r for r in
           MM.sniff_media_meta(MM.synth_mixed_media(docs)).collect()}
    assert len(got) == n_docs > 0
    for did, r in got.items():
        expect_kind = ["wav", "bmp", "y4m", "unknown"][did % 4]
        assert r["kind"] == expect_kind, (did, r["kind"])
        if expect_kind == "wav":
            assert r["sample_rate"] == 8000 and r["width"] is None
            assert r["mean_level"] == float(did % 1000 + 1)
        elif expect_kind == "bmp":
            assert (r["width"], r["height"]) == (4 + did % 13, 3 + did % 7)
            assert r["n_frames"] is None
        elif expect_kind == "y4m":
            assert r["n_frames"] == 2 + did % 6
            assert r["duration_ms"] == (2 + did % 6) * 40
        else:
            assert r["width"] is None and r["mean_level"] is None
            assert r["n_bytes"] > 0


def test_bmp_roundtrip_property():
    """Property: encode→decode is identity for ANY uint8 pixel array
    (hypothesis drives width/height/pixel contents, covering every
    stride remainder and degenerate 1×1 images)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=23),
        h=st.integers(min_value=1, max_value=11),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        gw, gh, bpp, got = MM.decode_bmp_pixels(MM.encode_bmp(px))
        assert (gw, gh, bpp) == (w, h, 24)
        assert np.array_equal(got, px)

    check()


def test_y4m_roundtrip_property():
    """Property: synth-style Y4M assembly → decode recovers every frame
    byte-exactly for arbitrary dims / frame counts / contents."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=2, max_value=24).filter(lambda v: v % 2 == 0),
        h=st.integers(min_value=2, max_value=12).filter(lambda v: v % 2 == 0),
        nf=st.integers(min_value=1, max_value=6),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, nf, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(nf)
        ]
        chroma = bytes([128] * (w * h // 2))
        payload = f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode() + b"".join(
            b"FRAME\n" + f.tobytes() + chroma for f in frames
        )
        gw, gh, num, den, got = MM.decode_y4m(payload)
        assert (gw, gh, num, den) == (w, h, 25, 1)
        assert len(got) == nf
        for a, b in zip(got, frames):
            assert np.array_equal(a, b)

    check()


def test_png_roundtrip_all_filters(spark):
    """Encode with per-row filters 0-4, decode, pixel-exact — proves
    every PNG filter reconstruction (None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for ch in (3, 4):
        px = rng.randint(0, 256, size=(7, 11, ch)).astype(np.uint8)
        payload = encode_png(px, filters=[0, 1, 2, 3, 4, 1, 4])
        w, h, ct, out = decode_png_pixels(payload)
        assert (w, h) == (11, 7)
        assert ct == (2 if ch == 3 else 6)
        assert (out == px).all()


def test_png_crc_and_gate(spark):
    """A corrupted chunk CRC raises; non-PNG payloads hit the codec
    env-gate; unsupported profiles return header-only metadata."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from sap_data_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        decode_png_pixels,
        encode_png,
    )

    px = np.zeros((2, 3, 3), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    payload[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(bytes(payload))

    with pytest.raises(NotImplementedError):
        decode_png_pixels(b"\xff\xd8\xff\xe0 not a png")

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    pal = PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0)
    ) + chunk(b"IEND", b"")
    w, h, ct, pxo = decode_png_pixels(pal)
    assert (w, h, ct, pxo) == (5, 4, 3, None)  # palette: header-only


def test_sniff_dispatch_recognizes_png(spark):
    """The magic-byte front door routes PNG payloads to the real PNG
    decoder (kind='png' with true dims and mean luma)."""
    import numpy as np

    from sap_data_pipeline_spark.operators import multimodal as MM

    px = np.full((4, 6, 3), 7, dtype=np.uint8)
    rows = [(1, bytearray(MM.encode_png(px))), (2, bytearray(b"plain text"))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in MM.sniff_media_meta(media).collect()}
    assert got[1]["kind"] == "png"
    assert (got[1]["width"], got[1]["height"]) == (6, 4)
    assert abs(got[1]["mean_level"] - 7.0) < 1e-9
    assert got[2]["kind"] == "unknown"


def test_ulaw_expansion_matches_audioop(spark):
    """G.711 µ-law expansion differential against stdlib audioop over
    all 256 byte values (falls back to known table points if audioop
    is gone — it leaves in Python 3.13)."""
    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import ulaw_expand

    data = bytes(range(256))
    mine = ulaw_expand(data)
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        ref = np.frombuffer(audioop.ulaw2lin(data, 2), dtype="<i2")
        assert (mine == ref).all()
    except ImportError:
        assert mine[0] == -32124 and mine[0xFF] == 0 and mine[0x7F] == 0


def test_decode_wav_meta_ulaw_and_unknown_formats(spark):
    """The non-PCM RIFF fallback: µ-law payloads get real stats; an
    unknown compressed format reports header metadata with NULL stats
    instead of crashing (stdlib wave raises on both)."""
    import struct

    from sap_data_pipeline_spark.operators import multimodal as MM

    def wav(fmt_code, data, bits=8):
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    rate, ch, nf, dur, rms, peak = MM.decode_wav_meta(wav(7, bytes([0x00, 0xFF])))
    assert (rate, ch, nf) == (8000, 1, 2)
    assert peak == 32124 and rms is not None  # real µ-law expansion

    rate, ch, nf, dur, rms, peak = MM.decode_wav_meta(wav(85, b"\x01\x02\x03"))
    assert rate == 8000 and rms is None and peak is None  # MP3-in-RIFF: header only


def test_gif_roundtrip_growth_clear_interlace(spark):
    """GIF LZW round trip: random palettes/sizes, interlaced and not,
    plus a large low-entropy image that forces dictionary growth
    through multiple code widths and a mid-stream CLEAR."""
    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.RandomState(3)
    for h, w, nc, il in [(5, 7, 4, False), (16, 23, 16, True), (40, 50, 100, True)]:
        pal = [((j * 7) % 256, (j * 11) % 256, (j * 13) % 256) for j in range(nc)]
        idx = rng.randint(0, nc, size=(h, w)).astype(np.uint8)
        w2, h2, il2, px = decode_gif_pixels(encode_gif(idx, pal, interlace=il))
        assert (w2, h2, il2) == (w, h, il)
        assert (px == np.array(pal, dtype=np.uint8)[idx]).all()

    idx = (np.arange(200 * 300) % 7).reshape(200, 300).astype(np.uint8)
    pal = [(j, j, j) for j in range(8)]
    _, _, _, px = decode_gif_pixels(encode_gif(idx, pal))
    assert (px[..., 0] == idx).all()


def test_gif_gate_and_corruption(spark):
    """Non-GIF payloads hit the codec env-gate; a truncated LZW stream
    degrades (prefix decode), an invalid code raises."""
    import numpy as np
    import pytest

    from sap_data_pipeline_spark.operators.multimodal import (
        _lzw_decode_gif,
        decode_gif_pixels,
    )

    with pytest.raises(NotImplementedError):
        decode_gif_pixels(b"\x89PNG not a gif")
    with pytest.raises(ValueError, match="corrupt"):
        # code 300 with an empty table at width 3 is out of range
        _lzw_decode_gif(bytes([0b11111111, 0b11111111]), 2, 10)


def test_sniff_quarantines_corrupt_payloads_with_valid_magic(spark):
    """A payload with VALID magic but corrupt innards (bad PNG CRC,
    corrupt GIF LZW, truncated RIFF) must land as kind='corrupt' — one
    bad blob in a 100 TB dump may not kill the Arrow batch — while
    healthy payloads in the same batch decode normally."""
    import numpy as np

    from sap_data_pipeline_spark.operators import multimodal as MM

    good_png = MM.encode_png(np.full((3, 4, 3), 9, dtype=np.uint8))
    bad_png = bytearray(good_png)
    bad_png[20] ^= 0xFF                      # CRC mismatch inside IHDR
    bad_gif = b"GIF89a" + b"\x00" * 20       # truncated header garbage
    bad_wav = b"RIFF\x10\x00\x00\x00WAVEjunk"  # no fmt chunk
    rows = [
        (1, bytearray(good_png)),
        (2, bytearray(bytes(bad_png))),
        (3, bytearray(bad_gif)),
        (4, bytearray(bad_wav)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["kind"] for r in MM.sniff_media_meta(media).collect()}
    assert got[1] == "png"
    assert got[2] == "corrupt" and got[3] == "corrupt" and got[4] == "corrupt"


# ---------------------------------------------------------------------------
# TIFF (r11): real stdlib decode, both byte orders
# ---------------------------------------------------------------------------

def test_tiff_roundtrip_both_endian():
    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    px = ((np.arange(5)[:, None, None] * 11
           + np.arange(7)[None, :, None] * 5
           + np.arange(3)[None, None, :]) % 256).astype(np.uint8)
    for big in (False, True):
        w, h, spp, b, out = decode_tiff_pixels(encode_tiff(px, big_endian=big))
        assert (w, h, spp, b) == (7, 5, 3, big)
        assert np.array_equal(out, px)


def test_tiff_non_tiff_payload_is_env_gated():
    import pytest as _pytest

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_tiff_pixels,
    )

    with _pytest.raises(NotImplementedError):
        decode_tiff_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with _pytest.raises(NotImplementedError):
        decode_tiff_pixels(b"xx")


def test_tiff_compressed_reports_header_only():
    """A compression tag != 1 degrades to header-only metadata (None
    pixels) instead of failing — same contract as the BMP decoder."""
    import struct

    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    # entry 4 (index 3) is the Compression SHORT: flip its value to 5 (LZW)
    ifd_off = struct.unpack_from("<I", payload, 4)[0]
    comp_entry = ifd_off + 2 + 12 * 3
    assert struct.unpack_from("<H", payload, comp_entry)[0] == 259
    struct.pack_into("<H", payload, comp_entry + 8, 5)
    w, h, spp, big, out = decode_tiff_pixels(bytes(payload))
    assert (w, h, spp, big) == (2, 2, 3, False)
    assert out is None


def test_tiff_meta_query_shapes(spark):
    from sap_data_pipeline_spark.operators.multimodal import (
        extract_tiff_meta,
        synth_tiff_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    rows = {r["media_id"]: r for r in
            extract_tiff_meta(synth_tiff_media(docs)).collect()}
    assert len(rows) == 6
    for did, r in rows.items():
        assert r["width"] == 4 + did % 13
        assert r["height"] == 3 + did % 7
        assert r["channels"] == 3
        assert r["big_endian"] == bool(did % 2)
        assert r["max_luma"] is not None


def test_tiff_corrupt_body_behind_valid_magic_env_gates():
    # r11 ADVICE: truncated IFDs / out-of-range offsets / missing
    # width-height tags pass the 'II'/'MM' magic check but must raise
    # the NotImplementedError env-gate, never a raw struct.error.
    import struct

    import numpy as np
    import pytest

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    # truncated header: magic + version but IFD offset past the payload
    for bad in (
        b"II" + struct.pack("<HI", 42, 9999),       # IFD offset out of range
        b"II" + struct.pack("<HI", 42, 8),           # IFD count truncated
        b"MM" + struct.pack(">HI", 42, 8) + b"\x00\x02" + b"\x01" * 5,
    ):
        with pytest.raises(NotImplementedError):
            decode_tiff_pixels(bad)
    # missing required width/height tags: real IFD with only an
    # unrelated entry
    ifd = struct.pack("<HHHIIII", 1, 259, 3, 1, 1, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_tiff_pixels(b"II" + struct.pack("<HI", 42, 8) + ifd)
    # valid payload truncated mid-strip: value offsets point past EOF
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_tiff(px)
    with pytest.raises(NotImplementedError):
        decode_tiff_pixels(good[: len(good) // 2])


def test_tiff_meta_degrades_corrupt_rows_to_null(spark):
    # per-row guard: one corrupt TIFF must not kill the batch — it
    # yields an all-NULL metadata row (the image_ahash contract)
    import struct

    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        encode_tiff,
        extract_tiff_meta,
    )

    good = encode_tiff(np.full((2, 3, 1), 7, dtype=np.uint8))
    corrupt = b"II" + struct.pack("<HI", 42, 9999)
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt)),
         (3, bytearray(b"\x89PNG\r\n\x1a\nnot a tiff"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_tiff_meta(media).collect()}
    assert rows[1]["width"] == 3 and rows[1]["mean_luma"] == 7.0
    for bad_id in (2, 3):
        r = rows[bad_id]
        assert all(r[c] is None for c in
                   ("width", "height", "channels", "big_endian",
                    "mean_luma", "max_luma"))


# ---------------------------------------------------------------------------
# audio energy fingerprint (r12)
# ---------------------------------------------------------------------------

def _wav_bytes(samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_audio_fingerprint_hand_computed_and_gain_invariant(spark):
    from sap_data_pipeline_spark.operators.multimodal import (
        AUDIO_FP_WINDOW,
        audio_energy_fingerprint,
    )

    w = AUDIO_FP_WINDOW
    # three complete windows with energies low < high > mid
    # -> delta bits: e1>e0 set (bit 0), e2>e1 unset -> fingerprint 1
    quiet, loud, mid = [10] * w, [100] * w, [50] * w
    samples = quiet + loud + mid + [7] * 10  # +partial tail, dropped
    media = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(samples))),
         (2, bytearray(_wav_bytes([s * 3 for s in samples]))),  # gain x3
         (3, bytearray(b"not a wav at all")),
         (4, bytearray(_wav_bytes([5] * 10)))],  # < one window
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in
           audio_energy_fingerprint(media).collect()}
    r1 = got[1]
    assert r1["n_windows"] == 3
    assert r1["fingerprint"] == 1
    assert r1["total_energy"] == (10 * 10 + 100 * 100 + 50 * 50) * w
    # uniform gain scales every window energy by 9 -> same delta signs
    assert got[2]["fingerprint"] == r1["fingerprint"]
    assert got[2]["total_energy"] == 9 * r1["total_energy"]
    # corrupt payload and sub-window clip degrade to NULLs, job survives
    for bad in (3, 4):
        assert got[bad]["fingerprint"] is None
        assert got[bad]["n_windows"] is None
