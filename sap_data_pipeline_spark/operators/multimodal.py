"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode libraries (PIL, ffmpeg, librosa…) are not in this container,
so the *decode kernels* are stubbed behind ``FakeDecoder`` (deterministic
bytes-derived features) / ``NotImplementedError`` — but the Spark-side
plumbing is real and tested: schemas, Arrow-batched ``mapInPandas``
signatures, batch shapes, and partition discipline are exactly what a
production decode stage uses.

Design for 100 TB of media:
* binary payloads stay columnar (parquet BINARY) with typed metadata
  structs alongside — no driver round-trips;
* decode/resize/frame-sample run as ``mapInPandas`` stages: Arrow batches
  in, Arrow batches out, one Python worker per core, no per-row pickling;
* ``repartition`` before the decode stage balances payload bytes, not row
  counts (rows carry multi-MB blobs — AQE only sees row counts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_data_pipeline_spark.functions.sizing import right_size

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


class FakeDecoder:
    """Deterministic stand-in for a real image/audio decoder.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    gated here because the libs aren't in the container (see module
    docstring).  Produces an 8-dim byte-histogram "feature".
    """

    DIM = 8

    @staticmethod
    def decode(payload: bytes | None) -> list[float]:
        if payload is None:
            return [0.0] * FakeDecoder.DIM
        hist = [0] * FakeDecoder.DIM
        for b in payload:
            hist[b % FakeDecoder.DIM] += 1
        total = max(len(payload), 1)
        return [h / total for h in hist]


def real_decode(payload: bytes) -> list[float]:  # pragma: no cover - env-gated
    """Decode kernel for codec-compressed media — unavailable here.

    WAV (RIFF PCM) and BMP (24-bit DIB) decode ARE real in this
    container — see :func:`decode_wav_meta` / :func:`extract_wav_meta`
    and :func:`decode_bmp_pixels` / :func:`extract_image_meta` /
    :func:`resize_images`, stdlib+numpy only.  This gate remains for
    formats that need a codec library (JPEG/MP3/H.264 → PIL/ffmpeg).
    """
    raise NotImplementedError(
        "compressed-media decode requires PIL/ffmpeg which are not "
        "installed; WAV/BMP payloads decode for real via "
        "extract_wav_meta / extract_image_meta"
    )


# --- Real audio modality: RIFF/WAVE PCM via stdlib wave + struct -----------

WAV_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms_amplitude", T.DoubleType(), True),
    T.StructField("peak_amplitude", T.IntegerType(), True),
])


def decode_wav_meta(payload: bytes) -> tuple:
    """REAL decode of a RIFF/WAVE PCM payload — stdlib ``wave`` for the
    container structure, ``struct`` for the 16-bit sample frames.

    Returns (sample_rate, n_channels, n_frames, duration_ms,
    rms_amplitude, peak_amplitude).  Non-WAV payloads raise
    ``NotImplementedError`` (the codec env-gate); non-16-bit PCM decodes
    the header but reports NULL sample stats.
    """
    import io
    import math
    import struct
    import wave

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "payload is not RIFF/WAVE; compressed formats need a codec "
            "library (env-gated, see real_decode)"
        )
    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            n_ch, sampwidth = w.getnchannels(), w.getsampwidth()
            rate, n_frames = w.getframerate(), w.getnframes()
            raw = w.readframes(n_frames)
    except wave.Error:
        # non-PCM WAVE (stdlib wave only reads format 1): parse the RIFF
        # chunks ourselves — µ-law (G.711 format 7) gets a REAL decode,
        # other compressed formats report header metadata with NULL stats
        fmt, n_ch, rate, _bits, data = _parse_riff_fmt_data(bytes(payload))
        n_frames = len(data) // max(n_ch, 1)
        duration_ms = n_frames * 1000 // rate if rate else None
        if fmt == 7:  # µ-law: one byte per sample
            vals = ulaw_expand(data)
            peak = int(abs(vals).max()) if len(vals) else None
            rms = math.sqrt(float((vals.astype("int64") ** 2).mean())) if len(vals) else None
            return rate, n_ch, n_frames, duration_ms, rms, peak
        return rate, n_ch, n_frames, duration_ms, None, None
    duration_ms = n_frames * 1000 // rate if rate else None
    rms = peak = None
    if sampwidth == 2 and raw:
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
        peak = max(abs(s) for s in samples)
        rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    return rate, n_ch, n_frames, duration_ms, rms, peak


def _parse_riff_fmt_data(payload: bytes) -> tuple:
    """Minimal RIFF chunk walk: returns (format_code, n_channels,
    sample_rate, bits_per_sample, data_bytes).  Raises on missing
    fmt/data chunks (malformed container)."""
    import struct

    pos, fmt = 12, None
    data = b""
    while pos + 8 <= len(payload):
        tag, ln = payload[pos: pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks pad to even offsets
    if fmt is None:
        raise ValueError("RIFF/WAVE without a fmt chunk")
    code, n_ch, rate, _brate, _align, bits = fmt
    return code, n_ch, rate, bits, data


def ulaw_expand(data: bytes):
    """G.711 µ-law → linear 14-bit samples (ITU-T G.711, public spec),
    vectorized: u = ~b; magnitude = ((mantissa·8 + 132) << exponent)
    − 132, negated when the (post-complement) sign bit is set."""
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8)
    u = (~b) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int32)


def extract_wav_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched WAV metadata/feature extraction — the real-modality
    instance of the decode stage (same ``mapInPandas`` shape a PIL/ffmpeg
    kernel slots into; see module docstring for the 100 TB discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in WAV_META_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n_ch, n_frames, dur, rms, peak = decode_wav_meta(payload)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["n_frames"].append(n_frames)
                out["duration_ms"].append(dur)
                out["rms_amplitude"].append(rms)
                out["peak_amplitude"].append(peak)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=WAV_META_SCHEMA)


def synth_ulaw_media(documents: DataFrame) -> DataFrame:
    """Deterministic µ-law WAV fixture: mono 8 kHz G.711 (format 7),
    ``50 + doc_id % 100`` one-byte samples, byte i = ``(doc_id·7 +
    i·13) % 256`` — closed-form in ``doc_id`` so the REAL µ-law
    expansion gets a full value-hash oracle (the DuckDB twin applies
    the G.711 formula arithmetically)."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 50 + did % 100
                data = bytes((did * 7 + i * 13) % 256 for i in range(n))
                fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
                body = (
                    b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", n) + data + (b"\x00" if n % 2 else b"")
                )
                ids.append(did)
                payloads.append(
                    b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


def synth_wav_media(documents: DataFrame) -> DataFrame:
    """Deterministic WAV fixture generator: one mono 16-bit PCM payload
    per document, fully parameterized by ``doc_id`` (rate 8000 Hz,
    ``100 + doc_id % 400`` frames, samples alternating ±(doc_id % 1000
    + 1)).  Because every derived quantity is closed-form in ``doc_id``,
    the REAL parse path gets a full value-hash oracle: the catalog query
    decodes the bytes with ``wave``/``struct`` while the DuckDB twin
    computes the same numbers arithmetically — any header/frame
    misparse breaks the hash.  Byte synthesis happens executor-side in
    the same Arrow-batched stage shape as the decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                n_frames = 100 + int(did) % 400
                amp = int(did) % 1000 + 1
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(
                        struct.pack(
                            f"<{n_frames}h",
                            *[amp if i % 2 == 0 else -amp for i in range(n_frames)],
                        )
                    )
                ids.append(did)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


# --- Real image modality: BMP (Windows DIB, 24-bit BI_RGB) via struct ------

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("bits_per_pixel", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("max_luma", T.IntegerType(), True),
])


def _bmp_stride(width: int) -> int:
    """BMP rows pad to 4-byte boundaries: stride = ceil(3w / 4) * 4."""
    return ((width * 3 + 3) // 4) * 4


def decode_bmp_pixels(payload: bytes):
    """REAL decode of an uncompressed 24-bit BMP payload — ``struct`` for
    the BITMAPFILEHEADER/BITMAPINFOHEADER, numpy for the padded,
    bottom-up pixel rows.  Returns an (h, w, 3) uint8 array in image row
    order (row 0 = top) with file BGR channel order preserved.

    Non-BMP payloads raise ``NotImplementedError`` (the codec env-gate,
    same contract as :func:`decode_wav_meta` for non-RIFF audio);
    compressed or non-24-bit DIBs return ``None`` pixels so callers can
    still report header metadata.
    """
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError(
            "payload is not a BMP; compressed image formats (JPEG/PNG) "
            "need a codec library (env-gated, see real_decode)"
        )
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, compression = struct.unpack_from("<H", payload, 28)[0], struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or height <= 0 or width <= 0:
        return width, abs(height), bpp, None
    stride = _bmp_stride(width)
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * height, offset=data_offset)
    rows = raw.reshape(height, stride)[:, : width * 3]
    # file rows are bottom-up: file row 0 is image row height-1
    pixels = rows[::-1].reshape(height, width, 3)
    return width, height, bpp, pixels


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 array (image row order, BGR) as an
    uncompressed 24-bit BMP — the inverse of :func:`decode_bmp_pixels`."""
    import struct

    import numpy as np

    h, w = pixels.shape[:2]
    stride = _bmp_stride(w)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1].reshape(h, w * 3)
    size = 54 + stride * h
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


def extract_image_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched BMP metadata/stat extraction — the real image-modality
    instance of the decode stage (same ``mapInPandas`` shape a PIL kernel
    slots into).  ``mean_luma``/``max_luma`` are over all pixel channel
    bytes — order-invariant, so the stats stay closed-form in ``doc_id``
    regardless of channel order; stride/row-order misparses are pinned by
    the resize differential query, whose gather is position-dependent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in IMAGE_META_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, bpp, px = decode_bmp_pixels(payload)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                out["width"].append(w)
                out["height"].append(h)
                out["bits_per_pixel"].append(bpp)
                out["mean_luma"].append(float(px.mean()) if px is not None else None)
                out["max_luma"].append(int(px.max()) if px is not None else None)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def synth_bmp_media(documents: DataFrame) -> DataFrame:
    """Deterministic BMP fixture generator: one 24-bit image per document,
    fully parameterized by ``doc_id`` (width ``4 + doc_id % 13``, height
    ``3 + doc_id % 7``, channel byte at image row r / col c / channel ch
    = ``(doc_id + 11 r + 5 c + ch) % 256``).  Every derived quantity is
    closed-form in ``doc_id``, so the REAL parse path gets a full
    value-hash oracle — any header-offset, stride-padding, or row-order
    misparse breaks the hash (see ``image_meta_bmp`` /
    ``image_resize_meta`` in the catalog)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((did + 11 * r + 5 * c + ch) % 256).astype(np.uint8)
                ids.append(did)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """REAL resize stage for uncompressed 24-bit BMP payloads:
    nearest-neighbor via numpy index maps (``src = floor(dst · src_dim /
    dst_dim)``), re-encoded as BMP.  Same Arrow-batched payload-in /
    payload-out shape a PIL/opencv kernel slots into for compressed
    formats (those still env-gate via :func:`decode_bmp_pixels`).

    Nearest-neighbor is the right kernel for a differential oracle: the
    resized image's pixels are an exact integer-index gather from the
    source, so a closed-form fixture stays closed-form after resizing —
    interpolating kernels would turn the oracle into float soup."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, bpp, px = decode_bmp_pixels(payload)
                if px is None:
                    raise NotImplementedError(
                        f"resize of {bpp}-bit/compressed BMP needs a codec "
                        "library (env-gated)"
                    )
                rows = (np.arange(height) * h) // height
                cols = (np.arange(width) * w) // width
                ids.append(mid)
                payloads.append(encode_bmp(px[rows][:, cols]))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return media.select("media_id", "payload").mapInPandas(run, schema=schema)


# --- Real video modality: YUV4MPEG2 (Y4M) raw video via stdlib -------------
#
# Y4M is the standard uncompressed-video interchange format (mjpegtools,
# ffmpeg's rawvideo pipeline): an ASCII stream header
# ``YUV4MPEG2 W<w> H<h> F<num>:<den> ...\n`` followed by frames, each
# ``FRAME\n`` + raw planar YUV bytes.  Entirely parseable with stdlib —
# so the video decode/frame-sample stages run for REAL here; only
# codec-compressed video (H.264/VP9) stays env-gated.

VIDEO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("fps_num", T.IntegerType(), True),
    T.StructField("fps_den", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


# ---------------------------------------------------------------------------
# PNG (ISO/IEC 15948, the public spec): a REAL stdlib decoder/encoder —
# zlib inflate + all five scanline filters — closing the biggest image
# env-gate (PNG is the web's dominant lossless format).  Supported
# profile: 8-bit, color type 2 (RGB) / 6 (RGBA), non-interlaced; other
# profiles return header metadata with NULL pixels (same contract as
# non-24-bit BMPs); non-PNG payloads raise the env-gate.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels, filters=None) -> bytes:
    """Encode an (h, w, ch) uint8 array (ch 3=RGB or 4=RGBA) as an
    8-bit non-interlaced PNG.  ``filters`` (per-row filter-type list)
    defaults to 0; the synthetic fixtures pass ``row % 5`` so every
    decode exercises ALL five filter reconstructions — a filter bug
    anywhere breaks the closed-form pixel oracle."""
    import struct
    import zlib

    h, w, ch = pixels.shape
    color_type = 2 if ch == 3 else 6
    bpp = ch
    raw = pixels.reshape(h, w * ch)
    lines = []
    prior = bytes(w * ch)
    for r in range(h):
        ft = 0 if filters is None else int(filters[r]) % 5
        line = bytes(raw[r])
        if ft == 0:
            filt = line
        else:
            fb = bytearray(len(line))
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                pred = {1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[ft]
                fb[x] = (line[x] - pred) % 256
            filt = bytes(fb)
        lines.append(bytes([ft]) + filt)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes):
    """REAL decode of an 8-bit RGB/RGBA non-interlaced PNG: chunk walk
    (IHDR/IDAT*/IEND with CRC-verified framing), zlib inflate of the
    concatenated IDAT stream, and per-scanline reconstruction of all
    five filter types (None/Sub/Up/Average/Paeth).  Returns
    (width, height, color_type, pixels) with pixels an (h, w, ch)
    uint8 array, or NULL pixels for unsupported PNG profiles
    (palette/16-bit/interlaced).  Non-PNG payloads raise
    ``NotImplementedError`` — the codec env-gate (JPEG/WebP need codec
    libraries)."""
    import struct
    import zlib

    import numpy as np

    if payload is None or len(payload) < 8 or payload[:8] != PNG_SIG:
        raise NotImplementedError(
            "payload is not a PNG; lossy/compressed formats (JPEG/WebP) "
            "need a codec library (env-gated, see real_decode)"
        )
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + ln]
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, flt, interlace = hdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if depth != 8 or color_type not in (2, 6) or interlace != 0:
        return w, h, color_type, None
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = bytes(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1: (r + 1) * (stride + 1)]
        if ft == 0:
            recon = bytearray(line)
        elif ft == 2:  # Up vectorizes: recon = line + prior
            recon = bytearray(
                (np.frombuffer(line, np.uint8)
                 + np.frombuffer(prior, np.uint8)).astype(np.uint8).tobytes()
            )
        else:  # Sub/Average/Paeth carry a left dependency — per byte
            recon = bytearray(stride)
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                pred = {1: a, 3: (a + b) // 2, 4: _paeth(a, b, c)}[ft]
                recon[x] = (line[x] + pred) % 256
        out[r] = np.frombuffer(bytes(recon), np.uint8)
        prior = bytes(recon)
    return w, h, color_type, out.reshape(h, w, channels)


PNG_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("color_type", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("max_luma", T.IntegerType(), True),
])


def extract_png_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched PNG decode + stats — the PNG instance of the image
    decode stage.  ``n_bytes`` is deliberately absent from the output:
    PNG byte size depends on the zlib compressor, so it has no
    closed-form oracle (every other column is exact in ``doc_id``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in PNG_META_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ct, px = decode_png_pixels(bytes(payload))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(px.shape[2] if px is not None else None)
                out["color_type"].append(ct)
                out["mean_luma"].append(float(px.mean()) if px is not None else None)
                out["max_luma"].append(int(px.max()) if px is not None else None)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PNG_META_SCHEMA)


def synth_png_media(documents: DataFrame) -> DataFrame:
    """Deterministic PNG fixture: per document, width ``4 + doc_id %
    13``, height ``3 + doc_id % 7``, channels ``3 + doc_id % 2`` (RGB
    and RGBA both exercised), channel byte ``(doc_id + 11 r + 5 c +
    ch) % 256`` — and row filters ``r % 5``, so decoding walks every
    PNG filter type under the closed-form value-hash oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, ch = 4 + did % 13, 3 + did % 7, 3 + did % 2
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                chs = np.arange(ch)[None, None, :]
                px = ((did + 11 * r + 5 * c + chs) % 256).astype(np.uint8)
                ids.append(did)
                payloads.append(encode_png(px, filters=range(h)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


def _y4m_frame_size(width: int, height: int, colorspace: str) -> int:
    if colorspace.startswith("C444"):
        return width * height * 3
    if colorspace.startswith("C422"):
        return width * height * 2
    # C420 and variants (the default when no C tag is present)
    return width * height * 3 // 2


def decode_y4m(payload: bytes):
    """REAL parse of a YUV4MPEG2 stream: header tags via ``bytes.split``,
    frames by stride-walking ``FRAME`` markers, numpy for the luma
    plane.  Returns (width, height, fps_num, fps_den, frames) where
    ``frames`` is a list of (h, w) uint8 luma arrays (Y plane only —
    chroma subsampling varies by colorspace tag and stays opaque).

    Non-Y4M payloads raise ``NotImplementedError`` (the codec env-gate,
    same contract as the WAV/BMP decoders for compressed formats).
    """
    import numpy as np

    if payload is None or not bytes(payload).startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "payload is not YUV4MPEG2; compressed video (H.264/VP9) "
            "needs a codec library (env-gated, see real_decode)"
        )
    payload = bytes(payload)
    nl = payload.index(b"\n")
    width = height = None
    fps_num, fps_den, colorspace = 30, 1, "C420"
    for tag in payload[10:nl].split(b" "):
        if not tag:
            continue
        k, v = chr(tag[0]), tag[1:].decode("ascii")
        if k == "W":
            width = int(v)
        elif k == "H":
            height = int(v)
        elif k == "F":
            num, den = v.split(":")
            fps_num, fps_den = int(num), int(den)
        elif k == "C":
            colorspace = "C" + v
    fsize = _y4m_frame_size(width, height, colorspace)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        body = payload[fnl + 1: fnl + 1 + fsize]
        frames.append(
            np.frombuffer(body, dtype=np.uint8, count=width * height)
            .reshape(height, width)
        )
        pos = fnl + 1 + fsize
    return width, height, fps_num, fps_den, frames


def extract_video_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched Y4M metadata extraction — the real video-modality
    instance of the decode stage.  ``mean_luma`` averages the Y plane
    across all frames (chroma excluded: it is subsampled per the C tag
    and not comparable across colorspaces)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in VIDEO_META_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, num, den, frames = decode_y4m(payload)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                out["width"].append(w)
                out["height"].append(h)
                out["fps_num"].append(num)
                out["fps_den"].append(den)
                out["n_frames"].append(len(frames))
                out["duration_ms"].append(
                    len(frames) * 1000 * den // num if num else None
                )
                # exact global mean: integer sum of sums / total count —
                # bit-identical to the oracle's SUM/COUNT double division
                # (a mean-of-frame-means would drift in the last ulp)
                out["mean_luma"].append(
                    sum(int(f.sum()) for f in frames)
                    / (w * h * len(frames)) if frames else None
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=VIDEO_META_SCHEMA)


def sample_video_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """REAL frame sampling for Y4M payloads: evenly-spaced frame indices
    (``idx = (i · total) // n``), each emitted as its raw luma plane —
    the real-kernel instance of the :func:`sample_frames` 1→N contract
    (row explosion inside Arrow, downstream stages see independent
    (media_id, frame_idx, bytes) rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, _, frames = decode_y4m(payload)
                if not frames:
                    continue
                k = min(n_frames, len(frames))
                for i in range(k):
                    ids.append(mid)
                    idxs.append((i * len(frames)) // k)
                    payloads.append(frames[(i * len(frames)) // k].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("n_frame_bytes", T.LongType(), True),
    T.StructField("frame_mean", T.DoubleType(), True),
])


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-frame byte stats over :data:`FRAME_SCHEMA` rows (any modality:
    sampled video frames, byte-window stubs).  Mean is integer-sum /
    count, so it is bit-identical to a SUM/COUNT oracle division."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in FRAME_STATS_SCHEMA.fieldNames()}
            for mid, idx, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame_payload"]
            ):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["n_frame_bytes"].append(len(arr))
                out["frame_mean"].append(
                    int(arr.sum()) / len(arr) if len(arr) else None
                )
            yield pd.DataFrame(out)

    return frames.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


def synth_y4m_media(documents: DataFrame) -> DataFrame:
    """Deterministic Y4M fixture generator: one C420 clip per document,
    fully parameterized by ``doc_id`` (width ``8 + 2·(doc_id % 5)``,
    height ``6 + 2·(doc_id % 3)``, ``2 + doc_id % 6`` frames at 25 fps,
    luma at frame f / row r / col c = ``(doc_id + 17 f + 3 r + c) %
    256``, chroma planes constant 128).  Closed-form in ``doc_id`` →
    the REAL parse path gets a full value-hash oracle (header tag
    parse, frame walking, plane-size arithmetic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + 2 * (did % 5), 6 + 2 * (did % 3)
                nf = 2 + did % 6
                parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                for f in range(nf):
                    luma = ((did + 17 * f + 3 * r + c) % 256).astype(np.uint8)
                    chroma = np.full(w * h // 2, 128, dtype=np.uint8)
                    parts.append(b"FRAME\n" + luma.tobytes() + chroma.tobytes())
                ids.append(did)
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


# --- Mixed-media front door: magic-byte dispatch over all real decoders ----

MEDIA_KIND_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("mean_level", T.DoubleType(), True),
])


def sniff_media_meta(media: DataFrame) -> DataFrame:
    """Heterogeneous media-dump front door: detect each payload's format
    from its magic bytes and dispatch to the matching REAL decoder —
    WAV (``RIFF..WAVE``), BMP (``BM``), PNG (8-byte signature),
    Y4M (``YUV4MPEG2``).
    Unrecognized payloads land as ``kind='unknown'`` rows (all-NULL
    stats) instead of failing the batch — the quarantine discipline a
    100 TB crawl dump needs, where a decode-crash-per-bad-blob kills
    the job (same contract as the JSONL reader's corrupt-line frame).

    ``mean_level`` is the modality's natural level stat: RMS amplitude
    for audio, mean luma for images/video.  One Arrow-batched stage; no
    per-modality re-scan of the payload column.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in MEDIA_KIND_SCHEMA.fieldNames()}

            def emit(mid, kind, nb, w=None, h=None, sr=None, nf=None,
                     dur=None, lvl=None):
                for col, v in zip(
                    MEDIA_KIND_SCHEMA.fieldNames(),
                    (mid, kind, nb, w, h, sr, nf, dur, lvl),
                ):
                    out[col].append(v)

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                nb = len(p)
                # a corrupt payload with VALID magic (bad CRC, truncated
                # container, corrupt LZW) must quarantine like unknown
                # magic does — one bad blob may not kill the batch
                try:
                    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        rate, _, nf, dur, rms, _ = decode_wav_meta(p)
                        emit(mid, "wav", nb, sr=rate, nf=nf, dur=dur, lvl=rms)
                    elif p[:2] == b"BM" and nb >= 54:
                        w, h, _, px = decode_bmp_pixels(p)
                        emit(mid, "bmp", nb, w=w, h=h,
                             lvl=float(px.mean()) if px is not None else None)
                    elif p[:8] == PNG_SIG:
                        w, h, _, px = decode_png_pixels(p)
                        emit(mid, "png", nb, w=w, h=h,
                             lvl=float(px.mean()) if px is not None else None)
                    elif p[:4] == b"GIF8":
                        w, h, _, px = decode_gif_pixels(p)
                        emit(mid, "gif", nb, w=w, h=h,
                             lvl=float(px.mean()) if px is not None else None)
                    elif p.startswith(b"YUV4MPEG2"):
                        w, h, num, den, frames = decode_y4m(p)
                        total = sum(int(f.sum()) for f in frames)
                        emit(mid, "y4m", nb, w=w, h=h, nf=len(frames),
                             dur=len(frames) * 1000 * den // num if num else None,
                             lvl=total / (w * h * len(frames)) if frames else None)
                    else:
                        emit(mid, "unknown", nb)
                except Exception:
                    emit(mid, "corrupt", nb)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=MEDIA_KIND_SCHEMA)


def synth_mixed_media(documents: DataFrame) -> DataFrame:
    """Mixed-media fixture: rotate documents through the three real
    formats plus an unknown blob by ``doc_id % 4`` (0 → WAV, 1 → BMP,
    2 → Y4M, 3 → raw text bytes), each synthesized with the same
    closed-form parameters as the single-modality generators — so the
    dispatch path gets the same full value-hash oracle."""
    wav = synth_wav_media(documents.filter(F.col("doc_id") % 4 == 0))
    bmp = synth_bmp_media(documents.filter(F.col("doc_id") % 4 == 1))
    y4m = synth_y4m_media(documents.filter(F.col("doc_id") % 4 == 2))
    unk = documents.filter(F.col("doc_id") % 4 == 3).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return wav.unionAll(bmp).unionAll(y4m).unionAll(unk)


def extract_features(media: DataFrame, *, batch_parallelism: int | None = None) -> DataFrame:
    """Decode + featurize binary payloads via Arrow-batched mapInPandas.

    The UDF boundary is per-*batch* (Arrow), not per-row; the repartition
    spreads payload bytes across workers before the Python stage.
    """
    if batch_parallelism:
        media = media.repartition(batch_parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": pdf["payload"].map(FakeDecoder.decode),
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(documents: DataFrame) -> DataFrame:
    """Derive a media table from ``documents`` (text bytes as payload) so
    the plumbing is testable on the provided testdata."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_payload", T.BinaryType(), True),
])


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads — the 1→N mapInPandas shape.

    A real kernel seeks N keyframes via ffmpeg; the stub slices the
    payload into N equal byte windows (deterministic).  The Spark
    contract is the point: one input batch yields a *longer* output
    batch (row explosion inside Arrow, never per-row Python calls), and
    downstream stages see plain (media_id, frame_idx, bytes) rows they
    can repartition/decode independently.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step:(i + 1) * step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize stage — decode-dependent, so fully gated in this container.

    The schema contract (payload in → payload out, meta.width/height
    updated) is what a PIL/opencv kernel would slot into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "resize requires an image decode library (PIL/opencv), "
            "not installed in this container"
        )
        yield  # pragma: no cover

    return media.mapInPandas(run, schema=media.schema)


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a, public spec incl. Appendix F LZW): a REAL stdlib
# decoder/encoder — variable-width LSB-first LZW with code-width growth
# and clear handling, global color table, optional interlacing (the
# 4-pass row order).  First frame only (animation = repeated image
# blocks; the corpus decode stage wants the poster frame).  Non-GIF
# payloads raise the codec env-gate.
# ---------------------------------------------------------------------------


def _lzw_decode_gif(data: bytes, min_code: int, npix: int) -> list:
    """GIF LZW: codes start at min_code+1 bits (LSB-first), the table
    grows by one entry per emitted code, and the code width bumps when
    the table fills the current width (cap 12 bits)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out: list = []
    table: list = []
    width = min_code + 1
    prev = None
    acc = nbits = 0
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [None, None]
        width = min_code + 1
        prev = None

    reset()
    while len(out) < npix:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode_gif(indices, min_code: int) -> bytes:
    """The matching GIF LZW encoder (real dictionary growth, not the
    all-literals trick — decodes must walk the table-extension path)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    emit(clear, width)
    buf = b""
    for px in indices:
        nxt = buf + bytes([int(px)])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], width)
        table[nxt] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        buf = bytes([int(px)])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_row_order(h: int) -> list:
    """Interlaced row order: pass 1 rows 0,8,16…, pass 2 rows 4,12…,
    pass 3 rows 2,6…, pass 4 rows 1,3,5…"""
    order = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(indices, palette, *, interlace: bool = False) -> bytes:
    """Encode an (h, w) uint8 index array + [(r,g,b), …] palette as a
    single-frame GIF89a (global color table, real LZW)."""
    import struct

    import numpy as np

    h, w = indices.shape
    ncolors = len(palette)
    bits = max(1, (ncolors - 1).bit_length())
    gct_size = 1 << bits
    min_code = max(2, bits)
    rows = indices[_gif_row_order(h)] if interlace else indices
    lzw = _lzw_encode_gif(np.asarray(rows).reshape(-1), min_code)
    sub = b"".join(
        bytes([len(lzw[i: i + 255])]) + lzw[i: i + 255]
        for i in range(0, len(lzw), 255)
    ) + b"\x00"
    gct = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (gct_size - ncolors)
    screen = struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    return (
        b"GIF89a" + screen + gct + img + bytes([min_code]) + sub + b"\x3B"
    )


def decode_gif_pixels(payload: bytes):
    """REAL decode of a single-frame GIF: header + logical screen
    descriptor, global/local color tables, extension-block skipping,
    variable-width LZW, and interlace reordering.  Returns
    (width, height, interlaced, pixels) with pixels (h, w, 3) uint8
    RGB.  Non-GIF payloads raise ``NotImplementedError``."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 13 or payload[:4] != b"GIF8":
        raise NotImplementedError(
            "payload is not a GIF; other compressed image formats need "
            "a codec library (env-gated, see real_decode)"
        )
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode_gif(b"".join(chunks), min_code, iw * ih)
            interlaced = bool(ipacked & 0x40)
            arr = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if interlaced:
                un = np.empty_like(arr)
                un[_gif_row_order(ih)] = arr
                arr = un
            if ct is None:
                raise ValueError("GIF image without a color table")
            return iw, ih, interlaced, ct[arr].astype(np.uint8)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF without an image block")


GIF_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("interlaced", T.IntegerType(), True),
    T.StructField("mean_rgb", T.DoubleType(), True),
    T.StructField("max_rgb", T.IntegerType(), True),
    T.StructField("pos_weighted_sum", T.LongType(), True),
])


def extract_gif_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched GIF decode + stats.  ``pos_weighted_sum`` =
    Σ v·(31r + 7c + ch + 1) is POSITION-DEPENDENT by construction — an
    interlace-reorder or row/col transposition bug changes it even when
    the order-invariant mean/max survive."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in GIF_META_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, il, px = decode_gif_pixels(bytes(payload))
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                wgt = (31 * r + 7 * c + ch + 1).astype(np.int64)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["interlaced"].append(int(il))
                out["mean_rgb"].append(float(px.mean()))
                out["max_rgb"].append(int(px.max()))
                out["pos_weighted_sum"].append(int((px.astype(np.int64) * wgt).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=GIF_META_SCHEMA)


def synth_gif_media(documents: DataFrame) -> DataFrame:
    """Deterministic GIF fixture: width ``4 + doc_id % 13``, height
    ``3 + doc_id % 7``, palette size ``4 + doc_id % 5``, pixel index
    ``(doc_id + 3r + 5c) % ncolors``, palette ``j → (7j, 11j, 13j) %
    256``, interlaced when ``doc_id`` is odd — every decode walks the
    real LZW (dictionary growth included) and half of them the 4-pass
    interlace reorder, all under the closed-form value-hash oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, nc = 4 + did % 13, 3 + did % 7, 4 + did % 5
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                idx = ((did + 3 * r + 5 * c) % nc).astype(np.uint8)
                pal = [((j * 7) % 256, (j * 11) % 256, (j * 13) % 256)
                       for j in range(nc)]
                ids.append(did)
                payloads.append(encode_gif(idx, pal, interlace=bool(did % 2)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("hash_hi", T.LongType(), True),
    T.StructField("hash_lo", T.LongType(), True),
])


def image_ahash(media: DataFrame, *, grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) over the REAL BMP decode path —
    the image-modality dedup fingerprint (the LAION-style near-dup
    primitive): nearest-neighbor-sample the image to a ``grid``×``grid``
    cell lattice (same index map as :func:`resize_images`:
    ``src = (dst · src_dim) // grid``), sum the 3 channel bytes per cell
    (channel-order-invariant), and set bit i when its cell is strictly
    above the lattice mean.  The mean compare is cross-multiplied
    integer arithmetic (``grid²·cell > Σcells``) — no floats, so hashes
    are engine- and platform-exact, and a uniform brightness shift
    (+b to every byte) provably flips no bit: both sides of the compare
    gain ``grid²·3b``.

    Bits are row-major; the 64-bit hash ships as two non-negative
    32-bit words ``(hash_hi, hash_lo)`` so SQL engines without unsigned
    64-bit types can reproduce it.  Arrow-batched ``mapInPandas`` — one
    decode pass per payload, no per-row pickling.
    """
    if grid * grid != 64:
        raise ValueError("grid must be 8 (64-bit hash contract)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in AHASH_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # A mixed-modality corpus WILL contain non-BMP / null
                # payloads in the same batch; the codec env-gate raises
                # NotImplementedError for those, and one such row must
                # not kill the whole job (ADVICE r10).  Degrade to the
                # null-hash contract (ahash_near_dup_pairs filters
                # null hashes), same as compressed/non-24bpp BMPs.
                try:
                    w, h, bpp, px = decode_bmp_pixels(payload)
                except NotImplementedError:
                    w = h = px = None
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                if px is None:
                    out["hash_hi"].append(None)
                    out["hash_lo"].append(None)
                    continue
                rs = (np.arange(grid) * h) // grid
                cs = (np.arange(grid) * w) // grid
                cells = px[np.ix_(rs, cs)].astype(np.int64).sum(axis=2)
                total = int(cells.sum())
                bits = (cells.reshape(-1) * (grid * grid)) > total
                hi = lo = 0
                for i in range(32):
                    if bits[i]:
                        hi |= 1 << (31 - i)
                    if bits[32 + i]:
                        lo |= 1 << (31 - i)
                out["hash_hi"].append(hi)
                out["hash_lo"].append(lo)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AHASH_SCHEMA)


def ahash_near_dup_pairs(hashes: DataFrame, *, max_hamming: int = 3,
                         id_col: str = "media_id") -> DataFrame:
    """Banded Hamming pairing over aHash fingerprints — the image twin
    of the SimHash text near-dup: the 64 bits split into four 16-bit
    bands, candidates join on (band index, band value), and exact
    Hamming distance (``bit_count(xor)``) verifies.  Pigeonhole:
    distance ≤ 3 leaves at least one of 4 bands intact, so recall is
    complete for the default radius.

    Scale: the fingerprint frame (one narrow row per image — id + two
    32-bit hash words, never pixels) is materialized once before the
    banding, the guide §8.4 "fingerprints only" step: the banded
    self-join otherwise evaluates the whole Arrow decode chain once per
    join side (r13 plan audit: two full MapInPandas chains, no
    ReusedExchange).  The self-join then shuffles narrow banded rows;
    candidate volume is Σ|bucket|², bounded by how many images truly
    share a 16-bit band.  (A bucket-collect_set pair generator was
    A/B'd here and measured 30% slower: the per-candidate interpreted
    struct transform loses to the codegen'd join at equal candidate
    volume.)  The Hamming verify is map-side and filters BEFORE the
    cross-band distinct, so the dedup exchange carries only
    within-radius pairs.  Output is ``(id_a, id_b, hamming)`` with
    ``id_a < id_b``, each pair once.
    """
    # materialized fingerprints feed light banding/join work — read them
    # back data-sized, not scan-sized (functions.sizing; guide §2.2)
    hashes, _ = right_size(hashes.localCheckpoint(eager=False))  # count materializes
    b = [
        (F.shiftright(F.col("hash_hi"), 16) % 65536).alias("b0"),
        (F.col("hash_hi") % 65536).alias("b1"),
        (F.shiftright(F.col("hash_lo"), 16) % 65536).alias("b2"),
        (F.col("hash_lo") % 65536).alias("b3"),
    ]
    banded = (
        hashes.filter(F.col("hash_hi").isNotNull())
        .select(F.col(id_col), "hash_hi", "hash_lo", *b)
        .select(
            F.col(id_col), "hash_hi", "hash_lo",
            F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
                "band_idx", "band_val"
            ),
        )
    )
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("hash_hi").alias("hi_a"),
        F.col("hash_lo").alias("lo_a"),
        "band_idx", "band_val",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("hash_hi").alias("hi_b"),
        F.col("hash_lo").alias("lo_b"),
        "band_idx", "band_val",
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).alias("hamming")
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def synth_bmp_media_templated(documents: DataFrame, *,
                              n_templates: int = 100) -> DataFrame:
    """Templated BMP fixture generator for the near-dup path: image
    CONTENT is parameterized by ``doc_id % n_templates`` (so template
    peers are visual duplicates) plus a per-document brightness shift
    ``doc_id % 3`` added to every channel byte (base bytes are mod 250,
    so +2 never wraps) — a perturbation :func:`image_ahash` is provably
    invariant to.  The template drives the image STRUCTURE (gradient
    slopes and a row×col interaction term), never a uniform offset —
    a uniform offset would be brightness by another name and every
    template would hash identically.  Same closed-form discipline as
    :func:`synth_bmp_media`: every pixel is arithmetic in ``doc_id``,
    so the REAL decode → hash → band → verify pipeline gets a full
    value-hash oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                t = did % n_templates
                bright = did % 3
                w, h = 4 + t % 13, 3 + t % 7
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = (
                    ((t % 13 + 2) * r + (t % 11 + 3) * c * (r + 1)
                     + 41 * (t // 13) + ch) % 250 + bright
                ).astype(np.uint8)
                ids.append(did)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# TIFF (baseline, uncompressed) — the scanned-document / print-pipeline
# format the web corpus still carries; REAL stdlib decode like
# BMP/PNG/GIF (struct for the IFD walk, numpy for the strip bytes).
# Both byte orders ('II' little / 'MM' big) are first-class: TIFF is
# the only common image container where endianness is a per-FILE fact.
# ---------------------------------------------------------------------------

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits_per_sample",
    259: "compression", 262: "photometric", 273: "strip_offsets",
    277: "samples_per_pixel", 278: "rows_per_strip",
    279: "strip_byte_counts",
}
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def encode_tiff(pixels, *, big_endian: bool = False) -> bytes:
    """Minimal single-strip baseline TIFF writer for (h, w, ch) uint8
    RGB arrays — test-fixture encoder (same role as encode_bmp /
    encode_png): header, pixel strip, external BitsPerSample array,
    one IFD."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    bo = ">" if big_endian else "<"
    magic = b"MM" if big_endian else b"II"

    strip = px.tobytes()
    strip_off = 8
    bps_off = strip_off + len(strip)
    ifd_off = bps_off + 2 * ch
    if ifd_off % 2:  # IFD offsets must be word-aligned
        bps_off += 1
        ifd_off += 1

    def entry(tag, typ, count, value):
        return struct.pack(f"{bo}HHI", tag, typ, count) + struct.pack(
            f"{bo}I", value
        )

    entries = [
        entry(256, 4, 1, w),
        entry(257, 4, 1, h),
        entry(258, 3, ch, bps_off),       # external SHORT[ch] array
        entry(259, 3, 1, 1),              # no compression
        entry(262, 3, 1, 2),              # RGB
        entry(273, 4, 1, strip_off),
        entry(277, 3, 1, ch),
        entry(278, 4, 1, h),
        entry(279, 4, 1, len(strip)),
    ]
    # SHORT values < 65536 stored left-justified in the 4-byte slot:
    # re-pack the SHORT-typed inline entries correctly for big-endian
    def entry_short(tag, count, value):
        return struct.pack(f"{bo}HHI", tag, 3, count) + struct.pack(
            f"{bo}HH", value, 0
        )

    entries[3] = entry_short(259, 1, 1)
    entries[4] = entry_short(262, 1, 2)
    entries[6] = entry_short(277, 1, ch)
    if ch <= 2:
        # a SHORT[ch] array with 2·ch ≤ 4 bytes is stored INLINE in the
        # value slot per the TIFF spec, not behind an offset — without
        # this, grayscale (ch=1) files carried an offset the decoder
        # read as bits_per_sample and the strip degraded to header-only
        entries[2] = struct.pack(f"{bo}HHI", 258, 3, ch) + struct.pack(
            f"{bo}HH", *([8] * ch + [0] * (2 - ch))
        )

    out = bytearray()
    out += magic + struct.pack(f"{bo}HI", 42, ifd_off)
    out += strip
    if bps_off > strip_off + len(strip):
        out += b"\x00"  # alignment pad
    out += struct.pack(f"{bo}{ch}H", *([8] * ch))
    out += struct.pack(f"{bo}H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(f"{bo}I", 0)  # next-IFD terminator
    return bytes(out)


def decode_tiff_pixels(payload: bytes):
    """REAL decode of a single-strip uncompressed 8-bit TIFF — returns
    (width, height, samples_per_pixel, big_endian, pixels) with pixels
    an (h, w, ch) uint8 array, or None pixels for compressed /
    non-8-bit / multi-strip files (header metadata still reported).
    Non-TIFF payloads — including truncated IFDs, out-of-range value
    offsets, and headers missing the required width/height tags, all
    of which pass the 2-byte magic check — raise
    ``NotImplementedError`` (the codec env-gate, same contract as
    :func:`decode_bmp_pixels`); a corrupt payload must surface as the
    per-row degrade contract, never a raw ``struct.error`` that kills
    the whole job (the r10 ``image_ahash`` failure mode)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise NotImplementedError(
            "payload is not a TIFF; other containers are decoded by "
            "their own stdlib decoders or env-gated"
        )
    big = payload[:2] == b"MM"
    bo = ">" if big else "<"
    try:
        (forty_two, ifd_off) = struct.unpack_from(f"{bo}HI", payload, 2)
        if forty_two != 42:
            raise NotImplementedError("bad TIFF version")
        n = struct.unpack_from(f"{bo}H", payload, ifd_off)[0]
        tags: dict[str, tuple] = {}
        for i in range(n):
            off = ifd_off + 2 + 12 * i
            tag, typ, count = struct.unpack_from(f"{bo}HHI", payload, off)
            name = _TIFF_TAGS.get(tag)
            if name is None or typ not in _TIFF_TYPE_SIZE:
                continue
            size = _TIFF_TYPE_SIZE[typ] * count
            if size <= 4:
                vals_off = off + 8
            else:
                vals_off = struct.unpack_from(f"{bo}I", payload, off + 8)[0]
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            vals = struct.unpack_from(f"{bo}{count}{fmt}", payload, vals_off)
            tags[name] = vals
        w = tags["width"][0]
        h = tags["height"][0]
        spp = tags.get("samples_per_pixel", (1,))[0]
        comp = tags.get("compression", (1,))[0]
        bps = tags.get("bits_per_sample", (8,))
        offs = tags.get("strip_offsets", ())
        if (comp != 1 or any(b != 8 for b in bps) or len(offs) != 1
                or tags.get("rows_per_strip", (h,))[0] < h
                or offs[0] + w * h * spp > len(payload)):
            return w, h, spp, big, None
        raw = np.frombuffer(payload, dtype=np.uint8,
                            count=w * h * spp, offset=offs[0])
        return w, h, spp, big, raw.reshape(h, w, spp)
    except (struct.error, KeyError, IndexError, ValueError) as exc:
        raise NotImplementedError(f"corrupt/truncated TIFF: {exc!r}") from exc


TIFF_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("big_endian", T.BooleanType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("max_luma", T.IntegerType(), True),
])


def extract_tiff_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched TIFF decode + stats — the TIFF instance of the
    image decode stage (same shape as :func:`extract_png_meta`).

    Per-row degrade contract (same as :func:`image_ahash`): a payload
    the decoder env-gates — non-TIFF magic OR a corrupt/truncated body
    behind a valid magic — yields an all-NULL metadata row instead of
    killing the job; quarantine-by-filter stays possible downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in TIFF_META_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, spp, big, px = decode_tiff_pixels(bytes(payload))
                except NotImplementedError:
                    w = h = spp = big = px = None
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(spp)
                out["big_endian"].append(big)
                out["mean_luma"].append(
                    float(px.mean()) if px is not None else None)
                out["max_luma"].append(
                    int(px.max()) if px is not None else None)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=TIFF_META_SCHEMA)


def synth_tiff_media(documents: DataFrame) -> DataFrame:
    """Deterministic TIFF fixture: width ``4 + doc_id % 13``, height
    ``3 + doc_id % 7``, RGB, byte order alternating per doc (both
    endian paths under the value-hash oracle), channel byte
    ``(doc_id + 11 r + 5 c + ch) % 256``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                chs = np.arange(3)[None, None, :]
                px = ((did + 11 * r + 5 * c + chs) % 256).astype(np.uint8)
                ids.append(did)
                payloads.append(encode_tiff(px, big_endian=bool(did % 2)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Audio energy fingerprint — the audio arm of the perceptual-dedup
# family (image twin: image_ahash).  Chromaprint-style pipelines hash a
# spectral contour; the engine-portable core is the ENERGY contour:
# integer sum-of-squares per fixed window, then sign-of-delta bits.
# All arithmetic is int64 (no float RMS), so the fingerprint is
# bit-identical across engines and replicas.
# ---------------------------------------------------------------------------

AUDIO_FP_WINDOW = 64       # samples per energy window
AUDIO_FP_MAX_BITS = 32     # delta bits kept (windows 0..32 contribute)

AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_windows", T.LongType(), True),
    T.StructField("total_energy", T.LongType(), True),
    T.StructField("fingerprint", T.LongType(), True),
])


def audio_energy_fingerprint(media: DataFrame) -> DataFrame:
    """REAL WAV decode → integer energy-contour fingerprint: 16-bit PCM
    samples are windowed (``AUDIO_FP_WINDOW``, complete windows only),
    each window's energy is the exact int64 sum of squares, and bit j
    of the fingerprint is set when window j+1 carries more energy than
    window j (first ``AUDIO_FP_MAX_BITS`` deltas).  Near-identical
    recordings (re-encodes, small gain changes... gain changes scale
    energies uniformly, preserving every delta sign) collide; different
    audio doesn't — the dedup key for an audio corpus, 8 bytes per
    clip like the image aHash.

    Per-row degrade contract (the image_ahash precedent): non-WAV or
    corrupt payloads yield an all-NULL row instead of killing the job.
    Arrow-batched ``mapInPandas``; the energy math is numpy int64 —
    exact integer arithmetic, no float summation order anywhere.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        import numpy as np

        for pdf in batches:
            out = {k: [] for k in AUDIO_FP_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                nw = te = fp = None
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        if w.getsampwidth() == 2 and w.getnchannels() == 1:
                            raw = w.readframes(w.getnframes())
                            s = np.asarray(
                                struct.unpack(f"<{len(raw) // 2}h", raw),
                                dtype=np.int64,
                            )
                            k = len(s) // AUDIO_FP_WINDOW
                            if k > 0:
                                e = (
                                    (s[: k * AUDIO_FP_WINDOW] ** 2)
                                    .reshape(k, AUDIO_FP_WINDOW)
                                    .sum(axis=1)
                                )
                                bits = 0
                                for j in range(min(k - 1, AUDIO_FP_MAX_BITS)):
                                    if e[j + 1] > e[j]:
                                        bits |= 1 << j
                                nw, te, fp = k, int(e.sum()), bits
                except Exception:
                    nw = te = fp = None
                out["media_id"].append(mid)
                out["n_windows"].append(nw)
                out["total_energy"].append(te)
                out["fingerprint"].append(fp)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


def synth_wav_media_varied(documents: DataFrame) -> DataFrame:
    """Deterministic VARIED-energy WAV fixture (the alternating ±amp
    fixture of :func:`synth_wav_media` has a flat energy contour, which
    degenerates the fingerprint): sample ``i`` of doc ``d`` is
    ``((d·7 + i²) mod 2001) − 1000`` over ``256 + d mod 257`` frames —
    closed-form in (d, i), so the DuckDB twin recomputes every window
    energy arithmetically while the catalog query decodes the REAL
    bytes (the image_ahash oracle precedent, audio edition)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 256 + did % 257
                samples = [((did * 7 + i * i) % 2001) - 1000
                           for i in range(n)]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(struct.pack(f"<{n}h", *samples))
                ids.append(did)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


def audio_fp_pairs(fps: DataFrame, *, max_hamming: int = 3,
                   id_col: str = "media_id") -> DataFrame:
    """Banded Hamming pairing over audio energy fingerprints — the
    audio arm of the perceptual-dedup family, mirroring
    :func:`ahash_near_dup_pairs` (the image arm): the 32 fingerprint
    bits split into four 8-bit bands, candidates join on (band index,
    band value), exact Hamming distance (``bit_count(xor)``) verifies.
    Pigeonhole: distance ≤ 3 leaves at least one of 4 bands intact, so
    recall is complete for the default radius.

    Scale: the fingerprint frame (one narrow row per clip — never audio
    samples) is materialized once before the banding (the guide §8.4
    "fingerprints only" step; the banded self-join otherwise evaluates
    the WAV-decode chain once per join side — r13 plan audit, same
    finding as the image twin).  The self-join then shuffles narrow
    banded rows; candidate volume is Σ|bucket|², bounded by how many
    clips truly share an 8-bit band.  The Hamming verify is map-side
    and filters before the cross-band distinct.  Output is
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``, each pair once;
    NULL fingerprints (corrupt/non-WAV payloads) are excluded.
    """
    # data-sized read-back of the materialized fingerprint frame
    # (functions.sizing; guide §2.2)
    fps, _ = right_size(fps.localCheckpoint(eager=False))  # count materializes
    fp = F.col("fingerprint")
    b = [
        ((F.shiftright(fp, 24)) % 256).alias("b0"),
        ((F.shiftright(fp, 16)) % 256).alias("b1"),
        ((F.shiftright(fp, 8)) % 256).alias("b2"),
        (fp % 256).alias("b3"),
    ]
    banded = (
        fps.filter(fp.isNotNull())
        .select(F.col(id_col), "fingerprint", *b)
        .select(
            F.col(id_col), "fingerprint",
            F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
                "band_idx", "band_val"
            ),
        )
    )
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("fingerprint").alias("fp_a"),
        "band_idx", "band_val",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("fingerprint").alias("fp_b"),
        "band_idx", "band_val",
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias(
        "hamming"
    )
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def synth_wav_media_templated(documents: DataFrame, *,
                              n_templates: int = 40) -> DataFrame:
    """Templated WAV fixture for the audio near-dup path (the
    :func:`synth_bmp_media_templated` recipe, audio edition): clip
    CONTENT is parameterized by template ``t = doc_id % n_templates``
    — template peers are the SAME recording — plus a per-document
    integer gain ``1 + doc_id % 3`` (energies scale by gain², so every
    delta sign and therefore the whole fingerprint is provably
    gain-invariant) and, for every fifth template copy
    (``(doc_id // n_templates) % 5 == 0``), a +400 amplitude
    spike in window 2 (perturbing at most the two delta bits touching
    that window — a near-dup within the radius-3 pairing, not an exact
    dup).  Sample ``i`` alternates ±gain·amp(i//64) where
    ``amp(w) = 100 + ((t+1)·48271·(w+1)·(w+2)) % 900`` (the 48271
    multiplier scrambles the contour so all 40 template fingerprints
    are distinct and no cross-template pair sits within the radius —
    chosen by measurement, see the fixture-design test) over
    ``64·(24 + t%9)`` frames — window energies are exactly
    ``64·gain²·amp²``, closed-form in (doc_id, w), so the DuckDB twin
    recomputes every energy arithmetically while Spark decodes the
    real bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                t = did % n_templates
                gain = 1 + did % 3
                # keyed on the template COPY index: n_templates and 5
                # share a factor, so `did % 5` would make spike status
                # a function of t alone and no within-template pair
                # could ever be a near-(not exact-)dup
                spike = 400 if (did // n_templates) % 5 == 0 else 0
                n_w = 24 + t % 9
                samples = []
                for w_i in range(n_w):
                    amp = 100 + ((t + 1) * 48271 * (w_i + 1) * (w_i + 2)) % 900
                    if w_i == 2:
                        amp += spike
                    a = gain * amp
                    samples.extend([a, -a] * (AUDIO_FP_WINDOW // 2))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
                ids.append(did)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


SCENE_CUT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("diff", T.LongType(), True),
    T.StructField("is_cut", T.BooleanType(), True),
])


def video_scene_cuts(media: DataFrame, *,
                     threshold_pct: int = 10) -> DataFrame:
    """Scene-change detection over the REAL Y4M decode path — the
    shot-boundary pass a video curation pipeline runs before frame
    sampling (sampling within one static shot wastes the clip's
    diversity; cuts delimit the shots).  The metric is the classic sum
    of absolute pixelwise luma differences between consecutive frames,
    in exact int64 arithmetic; a transition is a cut when
    ``100·diff > threshold_pct · (w·h·255)`` — integer cross-multiply
    against the maximum possible difference, no floats, so verdicts
    are engine- and platform-exact.

    One output row per frame TRANSITION: (media_id, frame_idx = f for
    the f→f+1 transition, diff, is_cut).  Corrupt / non-Y4M payloads
    degrade to a single all-NULL transition row (the per-row degrade
    contract of the decoder family — the clip stays visible to the
    audit instead of vanishing); single-frame clips emit none.
    Arrow-batched ``mapInPandas``, one decode per payload.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in SCENE_CUT_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, _, _, frames = decode_y4m(payload)
                except (NotImplementedError, ValueError):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(None)
                    out["diff"].append(None)
                    out["is_cut"].append(None)
                    continue
                denom = w * h * 255
                for f in range(len(frames) - 1):
                    a = frames[f].astype(np.int64)
                    b = frames[f + 1].astype(np.int64)
                    d = int(np.abs(b - a).sum())
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["diff"].append(d)
                    out["is_cut"].append(100 * d > threshold_pct * denom)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=SCENE_CUT_SCHEMA)


def synth_y4m_media_scenes(documents: DataFrame) -> DataFrame:
    """Scene-structured Y4M fixture (the :func:`synth_y4m_media` recipe
    with SHOT structure): ``2 + doc_id % 4`` scenes of ``2 + doc_id %
    3`` frames each; scene ``s`` renders at luma level
    ``L(s) = 20 + (doc_id·31 + s·97) % 160`` with the per-pixel texture
    ``L + 3·row + col`` — texture offset ≤ 42 and L ≤ 179, so no pixel
    ever wraps mod 256 and the pixelwise inter-frame difference is
    EXACTLY ``w·h·|L(s+1) − L(s)|`` at scene boundaries and 0 inside a
    scene — closed-form in doc_id, so the DuckDB twin recomputes every
    transition arithmetically while Spark decodes the real bytes.
    Consecutive-scene level deltas are 97 or 63 (mod-160 step), both
    far above any sane threshold, so cut/no-cut both hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + 2 * (did % 5), 6 + 2 * (did % 3)
                scene_len = 2 + did % 3
                n_scenes = 2 + did % 4
                parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                for f in range(scene_len * n_scenes):
                    lvl = 20 + (did * 31 + (f // scene_len) * 97) % 160
                    luma = (lvl + 3 * r + c).astype(np.uint8)
                    chroma = np.full(w * h // 2, 128, dtype=np.uint8)
                    parts.append(b"FRAME\n" + luma.tobytes() + chroma.tobytes())
                ids.append(did)
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Video perceptual fingerprint: luma-contour delta-sign bits — the video
# arm of the perceptual-dedup family, completing the image (aHash,
# image_ahash:1326) / audio (energy contour, audio_energy_fingerprint:
# 1727) / video triad.  Production video fingerprints (TMK, ISCC video
# codes) hash a temporal activity contour; the engine-portable core is
# the per-frame LUMA contour: exact int64 sum of the Y plane per frame,
# then sign-of-delta bits across consecutive frames.  All arithmetic is
# int64, so the fingerprint is bit-identical across engines.  A uniform
# brightness shift (+b per pixel, no clipping) adds w·h·b to every frame
# sum, preserving every delta sign — the fingerprint is provably
# brightness-invariant, the video analogue of the audio arm's gain
# invariance.
# ---------------------------------------------------------------------------

VIDEO_FP_MAX_BITS = 32     # frame-transition delta bits kept

VIDEO_FP_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("total_luma", T.LongType(), True),
    T.StructField("fingerprint", T.LongType(), True),
])


def video_luma_fingerprint(media: DataFrame) -> DataFrame:
    """REAL Y4M decode → luma-contour fingerprint: each frame's Y plane
    is summed in exact int64, and bit j of the fingerprint is set when
    frame j+1 carries more total luma than frame j (first
    ``VIDEO_FP_MAX_BITS`` transitions).  Re-encodes and uniform
    brightness shifts preserve every delta sign and collide; different
    footage doesn't — the dedup key for a video corpus, 8 bytes per
    clip like the image aHash and the audio energy fingerprint.

    Per-row degrade contract (the decoder-family precedent): non-Y4M or
    corrupt payloads yield an all-NULL row instead of killing the job.
    Arrow-batched ``mapInPandas``; one decode per payload.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in VIDEO_FP_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                nf = tl = fp = None
                try:
                    _, _, _, _, frames = decode_y4m(payload)
                    if frames:
                        sums = [int(f.astype(np.int64).sum()) for f in frames]
                        bits = 0
                        for j in range(min(len(sums) - 1, VIDEO_FP_MAX_BITS)):
                            if sums[j + 1] > sums[j]:
                                bits |= 1 << j
                        nf, tl, fp = len(sums), sum(sums), bits
                except Exception:
                    nf = tl = fp = None
                out["media_id"].append(mid)
                out["n_frames"].append(nf)
                out["total_luma"].append(tl)
                out["fingerprint"].append(fp)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=VIDEO_FP_SCHEMA)


def video_fp_pairs(fps: DataFrame, *, max_hamming: int = 3,
                   id_col: str = "media_id") -> DataFrame:
    """Banded Hamming pairing over video luma-contour fingerprints —
    the video arm of the perceptual-dedup family.  Video and audio
    fingerprints share the 32-bit delta-sign representation, so the
    banding/verify plan is IDENTICAL to :func:`audio_fp_pairs` (four
    8-bit bands, pigeonhole-complete at radius 3, fingerprint-sized
    shuffle) and this delegates to it."""
    return audio_fp_pairs(fps, max_hamming=max_hamming, id_col=id_col)


def synth_y4m_media_templated(documents: DataFrame, *,
                              n_templates: int = 40) -> DataFrame:
    """Templated Y4M fixture for the video near-dup path (the
    :func:`synth_wav_media_templated` recipe, video edition): clip
    CONTENT is parameterized by template ``t = doc_id % n_templates``
    — template peers are the SAME footage — plus a per-document uniform
    brightness offset ``b = 10·(doc_id % 3)`` (every pixel shifts
    equally and nothing clips, so every frame-sum delta sign and
    therefore the whole fingerprint is provably brightness-invariant)
    and, for every fifth template copy
    (``(doc_id // n_templates) % 5 == 0``), a +80 perturbation INSIDE
    frame 2's mod-160 level congruence (perturbing at most the two
    delta bits touching that frame — a near-dup within the radius-3
    pairing, not an exact dup).  Frame ``f`` renders at luma level
    ``L(f) = 20 + ((t+1)·48271·(f+1)·(f+2) + spike·[f=2]) % 160`` with
    the per-pixel texture ``L + b + 3·row + col`` — level ≤ 179, offset
    ≤ 20, texture ≤ 42, so no pixel ever wraps mod 256 and frame f's
    luma sum is EXACTLY ``w·h·(L(f)+b) + T`` with the closed-form
    texture total ``T = 3w·h(h−1)/2 + h·w(w−1)/2`` — so the DuckDB twin
    recomputes every frame sum arithmetically while Spark decodes the
    real bytes.  ``24 + t % 9`` frames of ``(8+2·(t%5)) × (6+2·(t%3))``
    C420; the 48271 multiplier gives cross-template min Hamming 5 and
    within-template spike Hamming ≤ 2 over all 40 templates — chosen by
    measurement, pinned in the fixture-design test.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                t = did % n_templates
                b = 10 * (did % 3)
                spike = 80 if (did // n_templates) % 5 == 0 else 0
                w, h = 8 + 2 * (t % 5), 6 + 2 * (t % 3)
                nf = 24 + t % 9
                parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                chroma = np.full(w * h // 2, 128, dtype=np.uint8)
                for f in range(nf):
                    lvl = 20 + ((t + 1) * 48271 * (f + 1) * (f + 2)
                                + (spike if f == 2 else 0)) % 160
                    luma = (lvl + b + 3 * r + c).astype(np.uint8)
                    parts.append(b"FRAME\n" + luma.tobytes()
                                 + chroma.tobytes())
                ids.append(did)
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Charset sniffing (WHATWG Encoding Standard §4.2 "BOM sniff" + the
# HTML meta-prescan): every ingest pipeline must decide how to decode
# fetched bytes BEFORE any text operator runs — a wrong charset guess
# mojibakes the document and poisons dedup/quality/tokenization
# downstream.  The binary-column twin of media_sniff_dispatch: magic
# numbers for text encodings.
# ---------------------------------------------------------------------------

META_CHARSET_RE = r"(?i)<meta[^>]*charset\s*=\s*[\"']?\s*([A-Za-z0-9._:-]+)"


def charset_sniff(media: DataFrame, *, payload_col: str = "payload",
                  prefix_bytes: int = 1024) -> DataFrame:
    """Sniff the character encoding of raw fetched bytes, WHATWG-style:

    1. **BOM** (always wins, per the Encoding Standard): ``EF BB BF``
       → utf-8; ``FF FE 00 00`` → utf-32le (checked BEFORE utf-16le,
       whose BOM it contains); ``00 00 FE FF`` → utf-32be; ``FF FE`` →
       utf-16le; ``FE FF`` → utf-16be.
    2. **meta prescan** over the first ``prefix_bytes`` bytes (the
       standard prescan window is 1024): the first
       ``<meta … charset=…>`` declaration, covering both the HTML5
       ``<meta charset=…>`` and the legacy
       ``http-equiv="Content-Type"`` forms — a ``charset=`` outside a
       meta tag never matches.  Reported lowercased.
    3. else **us-ascii** when every prefix byte is printable ASCII /
       tab / CR / LF, else **windows-1252** (the WHATWG default).

    All native Column expressions: BOM tests compare ``hex()`` of
    binary prefixes, the prescan regexes a lossless ISO-8859-1 decode
    of the prefix (every byte maps 1:1, so no decode can throw).  NULL
    payloads degrade to an all-NULL verdict row.  ``bom_charset`` and
    ``meta_charset`` are reported separately so a BOM/meta conflict is
    visible to the audit even though the BOM wins the verdict.

    Returns (media_id, bom_charset, meta_charset, charset).
    """
    p = F.col(payload_col)
    h2 = F.hex(F.expr(f"substring({payload_col}, 1, 2)"))
    h3 = F.hex(F.expr(f"substring({payload_col}, 1, 3)"))
    h4 = F.hex(F.expr(f"substring({payload_col}, 1, 4)"))
    bom = (
        F.when(h3 == "EFBBBF", F.lit("utf-8"))
        .when(h4 == "FFFE0000", F.lit("utf-32le"))
        .when(h4 == "0000FEFF", F.lit("utf-32be"))
        .when(h2 == "FFFE", F.lit("utf-16le"))
        .when(h2 == "FEFF", F.lit("utf-16be"))
    )
    head = F.decode(
        F.expr(f"substring({payload_col}, 1, {prefix_bytes})"), "ISO-8859-1"
    )
    meta = F.lower(
        F.nullif(F.regexp_extract(head, META_CHARSET_RE, 1), F.lit(""))
    )
    ascii_ok = head.rlike(r"^[\x09\x0A\x0D\x20-\x7E]*$")
    verdict = F.coalesce(
        bom, meta,
        F.when(ascii_ok, F.lit("us-ascii")).otherwise(F.lit("windows-1252")),
    )
    return media.select(
        "media_id",
        F.when(p.isNotNull(), bom).alias("bom_charset"),
        F.when(p.isNotNull(), meta).alias("meta_charset"),
        F.when(p.isNotNull(), verdict).alias("charset"),
    )


def synth_charset_media(documents: DataFrame) -> DataFrame:
    """Deterministic charset fixture: nine byte-level variants keyed on
    ``doc_id % 9``, each exercising one sniff rule or trap —

    0. UTF-8 BOM + a CONFLICTING ``<meta charset="iso-8859-1">`` (BOM
       must win the verdict; the meta still reports);
    1. ``FF FE`` + ASCII body → utf-16le (next bytes nonzero, so the
       utf-32le test must not fire);
    2. ``FE FF`` → utf-16be;
    3. ``FF FE 00 00`` → utf-32le (the contained utf-16le BOM must
       lose to the longer match);
    4. ``00 00 FE FF`` → utf-32be;
    5. ``<META Charset='Shift_JIS'>`` (mixed case, single quotes) →
       shift_jis;
    6. legacy ``http-equiv="Content-Type" content="text/html;
       charset=ISO-8859-7"`` → iso-8859-7;
    7. pure-ASCII page whose body contains a bare ``charset=evil``
       OUTSIDE any meta tag AND a real meta declaration placed past
       the 1024-byte prescan window (both must be ignored) →
       us-ascii;
    8. a 0xE9 high byte, no BOM, no meta → the windows-1252 default.

    Closed-form in doc_id, so the DuckDB twin recomputes the expected
    verdicts arithmetically while Spark sniffs the REAL bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                v = did % 9
                if v == 0:
                    b = (b"\xef\xbb\xbf<html><head>"
                         b'<meta charset="iso-8859-1"></head></html>')
                elif v == 1:
                    b = b"\xff\xfe<html>ok</html>"
                elif v == 2:
                    b = b"\xfe\xff<html>ok</html>"
                elif v == 3:
                    b = b"\xff\xfe\x00\x00rest"
                elif v == 4:
                    b = b"\x00\x00\xfe\xffrest"
                elif v == 5:
                    b = b"<html><META Charset='Shift_JIS'>body</html>"
                elif v == 6:
                    b = (b'<html><meta http-equiv="Content-Type" '
                         b'content="text/html; charset=ISO-8859-7">x</html>')
                elif v == 7:
                    b = (b"<html><p>charset=evil</p>" + b" " * 1024
                         + b'<meta charset="utf-8"></html>')
                else:
                    b = b"<html>caf\xe9</html>"
                ids.append(did)
                payloads.append(b)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    return documents.select("doc_id").mapInPandas(run, schema=schema)
