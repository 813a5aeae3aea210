"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode is REAL for the formats the container can handle with stdlib +
numpy — WAV audio (`wave`), non-interlaced RGB/RGBA-8 PNG (zlib inflate
+ full unfilter incl. Paeth), baseline JFIF JPEG (operators/jpeg.py:
Huffman + dequant + batched IDCT, 4:4:4/4:2:0, restart markers), PPM
(P6) and uncompressed 24-bit BMP images — and extends to
interlaced/paletted PNG and progressive JPEG wherever PIL is installed
(import-gated; absent in this container, see BASELINE.md). Payloads no decoder recognizes fall
back to the deterministic digest stub, clearly marked per-row via
`decoder`. The Spark-side plumbing — schemas, batch iteration,
partition-preserving mapInPandas, metadata propagation — is identical
for every decoder, so adding a codec never changes the plan.
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional codec coverage (PNG/JPEG/...); not in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None

# Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("decoder", StringType()),  # wav|png|jpeg|ppm|bmp|pil|stub
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _stub_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Fallback for payloads no installed decoder recognizes:
    deterministic fake embedding from the payload digest."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


# --- real decoders (stdlib + numpy; PIL widens coverage when present) ---


def _image_feature(rgb: np.ndarray, dim: int) -> list[float]:
    """Fixed-dim feature from an HxWx3 uint8 array: normalized size,
    per-channel mean/std, 8-bin luma histogram."""
    h, w = rgb.shape[:2]
    chans = rgb.reshape(-1, 3).astype(np.float64) / 255.0
    luma = chans @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    hist = hist / max(len(luma), 1)
    feat = [w / 4096.0, h / 4096.0, *chans.mean(axis=0), *chans.std(axis=0), *hist]
    return [float(x) for x in (feat + [0.0] * dim)[:dim]]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, h: int, w: int, ch: int):
    """Reverse per-scanline filtering (None/Sub/Up/Average/Paeth) into an
    (h, w*ch) uint8 array. Up is vectorized; Sub/Average/Paeth are
    sequential within a row by definition."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    pred = _paeth(a, b, int(prev[i - ch]) if i >= ch else 0)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(payload: bytes, dim: int):
    """Pure-stdlib PNG: non-interlaced 8-bit RGB/RGBA (color type 2/6),
    zlib-inflated IDAT + full unfilter incl. Paeth. Interlaced, paletted,
    and 16-bit variants return None (→ PIL if present, else stub)."""
    if not payload.startswith(_PNG_SIG):
        return None
    import zlib

    pos, w, idat = 8, None, []
    h = bit_depth = color_type = interlace = 0
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            w, h, bit_depth, color_type, _c, _f, interlace = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat or w == 0 or h == 0 or w * h > 64_000_000:
        return None
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        return None
    ch = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    if len(raw) < h * (w * ch + 1):
        return None
    px = _png_unfilter(raw, h, w, ch)
    if px is None:
        return None
    rgb = px.reshape(h, w, ch)[:, :, :3]
    return _image_feature(rgb, dim), {"width": w, "height": h}


def _decode_ppm(payload: bytes, dim: int):
    """P6 binary PPM: `P6 <w> <h> <maxval>` header then raw RGB."""
    if not payload.startswith(b"P6"):
        return None
    parts, pos = [], 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        tok = b""
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            tok += payload[pos : pos + 1]
            pos += 1
        parts.append(int(tok))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    rgb = raw.reshape(h, w, 3)
    return _image_feature(rgb, dim), {"width": w, "height": h}


def _decode_bmp(payload: bytes, dim: int):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows padded
    to 4 bytes) — the interchange subset."""
    if not payload.startswith(b"BM") or len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    bgr = rows[::-1] if flipped else rows
    rgb = bgr[:, :, ::-1]
    return _image_feature(rgb, dim), {"width": w, "height": h}


def _decode_wav(payload: bytes, dim: int):
    """PCM WAV via stdlib `wave`: duration, rate, RMS, zero-crossing
    rate, 12 coarse spectral-band energies."""
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            rate, n, width = wf.getframerate(), wf.getnframes(), wf.getsampwidth()
            raw = wf.readframes(n)
            channels = wf.getnchannels()
    except (wave.Error, EOFError):
        return None
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    if len(x) == 0:
        return None
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = [float(b.mean()) if len(b) else 0.0 for b in np.array_split(spec, 12)]
    scale = max(bands) or 1.0
    feat = [len(x) / rate / 60.0, rate / 48000.0, rms, zcr] + [b / scale for b in bands]
    duration_ms = int(round(1000 * len(x) / rate))
    return [float(v) for v in (feat + [0.0] * dim)[:dim]], {"duration_ms": duration_ms}


def _decode_jpeg(payload: bytes, dim: int):
    """Baseline JFIF via the pure numpy+stdlib codec (operators/jpeg.py):
    SOF0, 8-bit, 1–3 components, sampling factors to 2x2, restart
    markers. Progressive/arithmetic variants return None (→ PIL if
    present, else stub)."""
    from kwwhat_spark.operators.jpeg import decode_jpeg

    rgb = decode_jpeg(payload)
    if rgb is None:
        return None
    h, w = rgb.shape[:2]
    return _image_feature(rgb, dim), {"width": w, "height": h}


def _decode_pil(payload: bytes, dim: int):  # pragma: no cover - needs PIL
    if _PILImage is None:
        return None
    try:
        img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
    except Exception:  # noqa: BLE001 - any undecodable payload
        return None
    rgb = np.asarray(img, dtype=np.uint8)
    return _image_feature(rgb, dim), {"width": img.width, "height": img.height}


def _decode_gif(payload: bytes, dim: int):
    """GIF87a/89a via operators/gif.py (LZW, interlace, local/global
    color tables); first frame -> RGB features."""
    from kwwhat_spark.operators.gif import decode_gif

    rgb = decode_gif(payload)
    if rgb is None:
        return None
    return _image_feature(rgb, dim), {"width": rgb.shape[1], "height": rgb.shape[0]}


def _real_decode(payload: bytes, dim: int):
    """(feature, decoder_name) for recognized payloads, else None.
    Magic-sniffed, so a mislabeled mime_type cannot crash a 100-TB job."""
    if not payload:
        return None
    for fn, name in (
        (_decode_png, "png"),
        (_decode_jpeg, "jpeg"),
        (_decode_gif, "gif"),
        (_decode_ppm, "ppm"),
        (_decode_bmp, "bmp"),
        (_decode_wav, "wav"),
    ):
        # A payload can carry a valid 2-byte magic prefix and still be
        # garbage (truncated header, bogus offsets); at 100-TB scale such
        # rows WILL exist, and an uncaught ValueError/IndexError here
        # fails the Spark task instead of falling through to the stub.
        try:
            got = fn(payload, dim)
        except (ValueError, IndexError, struct.error, OverflowError, MemoryError):
            got = None
        if got is not None:
            return got[0], name
    got = _decode_pil(payload, dim)
    if got is not None:
        return got[0], "pil"
    return None


def extract_features(media: DataFrame, dim: int = FEATURE_DIM, decode: str = "auto") -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    decode='auto' (default) runs the real decoders and falls back to the
    digest stub per row; 'real' nulls the feature when nothing decodes
    (strict); 'stub' forces the fake (bit-stable across codec installs).

    mapInPandas keeps partitioning (no shuffle) and streams batches —
    at 100 TB the payload column never materializes on the driver and
    batch size is bounded by arrow.maxRecordsPerBatch.
    """
    if decode not in ("auto", "real", "stub"):
        raise ValueError(f"decode must be auto|real|stub, got {decode!r}")

    def one(b):
        payload = bytes(b) if b is not None else b""
        if decode != "stub":
            got = _real_decode(payload, dim)
            if got is not None:
                return got
            if decode == "real":
                return None, "undecodable"
        return _stub_decode_features(payload, dim), "stub"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [one(b) for b in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "decoder": [d for _, d in decoded],
                    "feature": [f for f, _ in decoded],
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def bmp_bytes(w: int, h: int, seed: int = 0) -> bytes:
    """Encode a deterministic 24-bit uncompressed BMP (test/demo payloads
    the REAL decoder accepts)."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)  # BGR, bottom-up
    pix = rows[::-1].tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def png_bytes(w: int, h: int, seed: int = 0) -> bytes:
    """Encode a deterministic non-interlaced RGB8 PNG, cycling the
    scanline filter type 0→4 per row so round-trip tests exercise every
    unfilter branch (incl. Paeth)."""
    import zlib

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ch, stride = 3, w * 3
    flat = rgb.reshape(h, stride).astype(np.int32)
    lines, prev = [], np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur, ftype = flat[y], y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 2:
            filt = (cur - prev) & 0xFF
        else:
            filt = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    pred = _paeth(a, b, int(prev[i - ch]) if i >= ch else 0)
                filt[i] = (int(cur[i]) - pred) & 0xFF
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def wav_bytes(freq_hz: float, ms: int, rate: int = 8000, amp: float = 0.5) -> bytes:
    """Encode a deterministic 16-bit mono PCM WAV sine (real payloads)."""
    import wave

    n = max(1, rate * ms // 1000)
    t = np.arange(n) / rate
    samples = (amp * np.sin(2 * np.pi * freq_hz * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL decodable payloads
    (24-bit BMP, RGB8 PNG, baseline JPEG — 4:4:4 and 4:2:0 — and GIF89a
    images incl. interlaced; PCM WAV audio; AVI-MJPEG video with real
    extractable frames) plus opaque video/garbage rows that exercise
    the digest-stub fallback."""
    import random

    from kwwhat_spark.operators.jpeg import jpeg_bytes

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        if modality == "image":
            w, h = 8 + (i % 8), 6 + (i % 5)
            codec = (i // 3) % 4  # rotate the four real image codecs
            if codec == 0:
                payload, mime = bmp_bytes(w, h, seed=seed + i), "image/bmp"
            elif codec == 1:
                payload, mime = png_bytes(w, h, seed=seed + i), "image/png"
            elif codec == 3:
                from kwwhat_spark.operators.gif import encode_gif

                rng_img = np.random.default_rng(seed + i)
                rgb = rng_img.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                payload = encode_gif(rgb, interlace=bool(i % 2))
                mime = "image/gif"
            else:
                sub = "420" if (i // 9) % 2 else "444"
                payload = jpeg_bytes(w, h, seed=seed + i, subsampling=sub)
                mime = "image/jpeg"
            width, height, duration = w, h, None
        elif modality == "audio":
            ms = 50 + 10 * (i % 20)
            payload = wav_bytes(200.0 + 20 * (i % 10), ms)
            width, height, duration = None, None, ms
        elif i % 6 == 2:  # REAL AVI-MJPEG container (decodable frames)
            from kwwhat_spark.operators.avi import encode_avi_mjpeg

            w, h = 16, 16
            n_frames = 2 + (i % 4)
            frames = [
                jpeg_bytes(w, h, seed=seed + 100 * i + j) for j in range(n_frames)
            ]
            us_per_frame = 500_000  # 2 fps keeps sampled indices varied
            payload = encode_avi_mjpeg(
                frames, width=w, height=h, us_per_frame=us_per_frame
            )
            width, height = w, h
            duration = n_frames * us_per_frame // 1000
            mime = "video/x-msvideo"
        else:  # opaque container the stub handles
            payload = bytes(rng.randrange(256) for _ in range(128 + (i % 64)))
            width, height, duration = 64, 48, 1000 * (i % 30)
        if modality == "audio":
            mime = "audio/wav"
        elif modality == "video" and i % 6 != 2:
            mime = "video/mp4"
        rows.append(
            (
                i,
                modality,
                mime,
                payload,
                width,
                height,
                duration,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through and rewrites metadata; the
    real implementation decodes + resamples in the same mapInPandas shape."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


# One row per sampled frame; payload is a stubbed frame image that the
# downstream extract_features / resize_stub operators accept unchanged.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("modality", StringType()),  # always "image"
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def frame_sample(
    media: DataFrame,
    *,
    interval_ms: int = 1000,
    max_frames: int = 32,
) -> DataFrame:
    """Sample frames from video rows at a fixed interval — the one-to-many
    half of the multimodal plumbing (decode and feature-extract are
    one-to-one). Non-video rows are dropped; each video row expands to
    min(duration_ms // interval_ms + 1, max_frames) image rows whose
    schema matches MEDIA_SCHEMA plus (frame_index, frame_ts_ms), so the
    output feeds extract_features / resize_stub directly.

    AVI-MJPEG payloads are REAL (operators/avi.py container parse; the
    sampled payload is the frame's actual JPEG, which decode_image /
    extract_features then pixel-decode through operators/jpeg.py): the
    frame at sample time t is the last frame whose presentation time is
    <= t (index = floor(t / us_per_frame), clamped), exactly what a
    seek-to-timestamp does. Containers this parser does not understand
    (mp4 etc. — pyav/ffmpeg absent here) keep the deterministic
    digest-stub payload, mirroring decode_image's unsupported-codec
    fallback. The Spark shape is identical either way: mapInPandas
    expansion is narrow (no shuffle), output batch size is bounded
    because each input row yields ≤ max_frames rows, and the payload
    column streams through Arrow without driver materialization.
    """
    if interval_ms <= 0:
        raise ValueError("interval_ms must be positive")

    from kwwhat_spark.operators.avi import decode_avi_mjpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["modality"] == "video"]
            if len(vids) == 0:
                continue
            out: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for row in vids.itertuples(index=False):
                src = bytes(row.payload or b"")
                avi = decode_avi_mjpeg(src)
                if avi is not None:
                    duration = avi["n_frames"] * avi["us_per_frame"] // 1000
                    width, height = avi["width"], avi["height"]
                else:
                    duration = int(row.duration_ms or 0)
                    width, height = row.width, row.height
                n_samples = min(duration // interval_ms + 1, max_frames)
                for j in range(n_samples):
                    ts = j * interval_ms
                    if avi is not None:
                        fidx = min(
                            ts * 1000 // avi["us_per_frame"], avi["n_frames"] - 1
                        )
                        payload = avi["frames"][fidx]
                        mime = "image/jpeg"
                    else:
                        payload = hashlib.sha256(
                            src + ts.to_bytes(8, "big")
                        ).digest()
                        mime = "image/x-stub-frame"
                    out["media_id"].append(row.media_id)
                    out["frame_index"].append(j)
                    out["frame_ts_ms"].append(ts)
                    out["modality"].append("image")
                    out["mime_type"].append(mime)
                    out["payload"].append(payload)
                    out["width"].append(width)
                    out["height"].append(height)
                    out["duration_ms"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
