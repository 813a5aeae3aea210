"""Real-decode tests for the multimodal operators: WAV through stdlib
`wave`, PPM/BMP through numpy, digest-stub fallback for unrecognized
payloads, and the PIL extension path wherever that package exists
(absent in this container — see BASELINE.md)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kwwhat_spark.operators.multimodal import (
    FEATURE_DIM,
    _decode_bmp,
    _decode_png,
    _decode_ppm,
    _decode_wav,
    _image_feature,
    _real_decode,
    bmp_bytes,
    png_bytes,
    wav_bytes,
)


def test_bmp_roundtrip_dimensions_and_stats():
    payload = bmp_bytes(10, 7, seed=3)
    got = _decode_bmp(payload, FEATURE_DIM)
    assert got is not None
    feat, meta = got
    assert meta == {"width": 10, "height": 7}
    assert feat[0] == pytest.approx(10 / 4096) and feat[1] == pytest.approx(7 / 4096)
    # uniform random channels: means near 0.5, stds near 1/sqrt(12)
    assert all(0.3 < m < 0.7 for m in feat[2:5])
    # histogram over 8 luma bins sums to 1
    assert sum(feat[8:16]) == pytest.approx(1.0, abs=1e-6)


def test_bmp_row_padding_exact():
    # width 3 -> 9-byte rows padded to 12: padding must not leak into pixels
    a = _decode_bmp(bmp_bytes(3, 2, seed=1), FEATURE_DIM)
    b = _decode_bmp(bmp_bytes(4, 2, seed=1), FEATURE_DIM)
    assert a is not None and b is not None and a[1] != b[1]


def test_ppm_p6_header_and_pixels():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[:, :, 0] = 255  # pure red
    payload = b"P6\n# comment\n2 2\n255\n" + rgb.tobytes()
    got = _decode_ppm(payload, FEATURE_DIM)
    assert got is not None
    feat, meta = got
    assert meta == {"width": 2, "height": 2}
    assert feat[2] == pytest.approx(1.0)  # mean R
    assert feat[3] == pytest.approx(0.0) and feat[4] == pytest.approx(0.0)


def test_png_roundtrip_every_filter_type():
    # png_bytes cycles filters 0..4 per row; 7 rows covers all of them,
    # so a pixel-exact round-trip proves the full unfilter path (Paeth
    # included). Compare against the feature computed straight from the
    # same RNG pixels.
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    got = _decode_png(png_bytes(9, 7, seed=11), FEATURE_DIM)
    assert got is not None
    feat, meta = got
    assert meta == {"width": 9, "height": 7}
    assert feat == pytest.approx(_image_feature(rgb, FEATURE_DIM))


def test_png_rejects_unsupported_variants():
    import struct as _s
    import zlib as _z

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        return _s.pack(">I", len(data)) + ctype + data + _s.pack(">I", _z.crc32(ctype + data))

    # paletted (color type 3) and interlaced variants -> None, not a crash
    pal = sig + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
    adam7 = sig + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    assert _decode_png(pal, FEATURE_DIM) is None
    assert _decode_png(adam7, FEATURE_DIM) is None
    # corrupted IDAT stream -> None
    bad = sig + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)) + chunk(
        b"IDAT", b"\x00not-zlib"
    ) + chunk(b"IEND", b"")
    assert _decode_png(bad, FEATURE_DIM) is None


def test_wav_sine_duration_and_rms():
    payload = wav_bytes(440.0, ms=250, rate=8000, amp=0.5)
    got = _decode_wav(payload, FEATURE_DIM)
    assert got is not None
    feat, meta = got
    assert meta["duration_ms"] == 250
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert feat[2] == pytest.approx(0.5 / math.sqrt(2), abs=0.01)
    assert feat[1] == pytest.approx(8000 / 48000)


def test_unrecognized_payload_falls_back_to_stub():
    assert _real_decode(b"\x00\x01garbage", FEATURE_DIM) is None
    assert _real_decode(b"", FEATURE_DIM) is None
    # truncated BMP header must not raise
    assert _real_decode(b"BM\x00\x00", FEATURE_DIM) is None


def test_malformed_magic_prefix_never_raises():
    # Payloads that carry a valid magic prefix but garbage bodies: at
    # 100-TB scale these rows exist, and an uncaught exception fails the
    # Spark task instead of routing to the stub (round-3 advisor item).
    cases = [
        b"P6",                                  # bare PPM magic
        b"P6\n",                                # header cut mid-token
        b"P6\n2 2\n255\n",                      # header fine, pixels missing
        b"P6\nxx yy\n255\n\x00" * 2,            # non-numeric dimensions
        b"BM" + b"\x00" * 60,                   # zeroed BMP header
        b"BM" + bytes(range(64)),               # bogus offsets/width
        bmp_bytes(4, 3, seed=0)[:40],           # truncated real BMP
        b"\x89PNG\r\n\x1a\n" + b"\xff" * 16,    # PNG sig, garbage chunks
        png_bytes(4, 3, seed=0)[:30],           # truncated real PNG
        b"RIFF\x00\x00\x00\x00WAVE",            # WAV container, no fmt
    ]
    for payload in cases:
        assert _real_decode(payload, FEATURE_DIM) is None, payload[:16]


def test_extract_features_modes(spark):
    from kwwhat_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=9)
    strict = {r["media_id"]: r for r in extract_features(media, decode="real").collect()}
    stub = {r["media_id"]: r for r in extract_features(media, decode="stub").collect()}
    for mid, r in strict.items():
        if r["modality"] == "video":  # opaque: strict mode nulls it
            assert r["decoder"] == "undecodable" and r["feature"] is None
        else:
            assert r["decoder"] in ("bmp", "png", "jpeg", "wav")
            assert r["feature"] != stub[mid]["feature"]
    assert all(r["decoder"] == "stub" for r in stub.values())
    with pytest.raises(ValueError, match="auto|real|stub"):
        extract_features(media, decode="nope")


def test_pil_extension_path():
    PIL = pytest.importorskip(
        "PIL.Image",
        reason="PIL not installed in this container (BASELINE.md); "
        "the pil decoder path runs wherever it is",
    )
    import io

    from kwwhat_spark.operators.multimodal import _decode_pil

    img = PIL.new("RGB", (5, 4), (255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    got = _decode_pil(buf.getvalue(), FEATURE_DIM)
    assert got is not None and got[1] == {"width": 5, "height": 4}


# ---------------------------------------------------------------------------
# Baseline JPEG (operators/jpeg.py): pure numpy+stdlib codec.
# ---------------------------------------------------------------------------


def _gradient_rgb(w, h):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    return np.clip(
        np.stack(
            [60 + 120 * xx / w, 200 - 100 * yy / h, 80 + 50 * (xx + yy) / (w + h)],
            axis=-1,
        ),
        0,
        255,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "w,h,sub,ri",
    [
        (16, 16, "444", 0),
        (17, 13, "444", 0),  # non-multiple-of-8 edges
        (32, 24, "420", 0),  # chroma subsampling + upsample
        (15, 9, "420", 0),  # odd dims under 2x2 sampling
        (40, 16, "444", 3),  # restart markers
        (33, 31, "420", 2),  # restart + subsampling together
    ],
)
def test_jpeg_roundtrip_reconstruction(w, h, sub, ri):
    from kwwhat_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rgb = _gradient_rgb(w, h)
    out = decode_jpeg(encode_jpeg(rgb, subsampling=sub, restart_interval=ri))
    assert out is not None and out.shape == (h, w, 3)
    # Smooth gradients survive Annex-K quantization nearly intact: the
    # reconstruction bound is tight enough that any block-order, zigzag,
    # predictor, or upsampling bug blows straight past it.
    err = np.abs(out.astype(float) - rgb.astype(float))
    assert err.mean() < 5.0 and err.max() < 32.0, (err.mean(), err.max())


def test_jpeg_feature_path_and_metadata():
    from kwwhat_spark.operators.jpeg import jpeg_bytes
    from kwwhat_spark.operators.multimodal import _decode_jpeg

    got = _decode_jpeg(jpeg_bytes(20, 14, seed=3), FEATURE_DIM)
    assert got is not None
    feat, meta = got
    assert meta == {"width": 20, "height": 14}
    assert len(feat) == FEATURE_DIM
    assert sum(feat[8:16]) == pytest.approx(1.0, abs=1e-6)
    assert _real_decode(jpeg_bytes(8, 8, seed=1), FEATURE_DIM)[1] == "jpeg"


def test_jpeg_rejects_garbage_truncation_progressive():
    from kwwhat_spark.operators.jpeg import decode_jpeg, jpeg_bytes

    assert decode_jpeg(b"\xff\xd8\xff\xe0garbagegarbage") is None
    assert decode_jpeg(b"not a jpeg at all") is None
    p = jpeg_bytes(20, 14, seed=3)
    assert decode_jpeg(p[: len(p) // 2]) is None  # truncated entropy data
    # Flip SOF0 to SOF2 (progressive): must decline, not misdecode.
    sof = p.find(b"\xff\xc0")
    assert sof > 0
    assert decode_jpeg(p[:sof] + b"\xff\xc2" + p[sof + 2 :]) is None


def test_jpeg_grayscale_single_component():
    from kwwhat_spark.operators.jpeg import _decode_jpeg_strict, decode_jpeg, encode_jpeg

    # Build a 1-component stream by encoding gray RGB, then verify the
    # decoder's luma-only path via a hand-trimmed SOF/SOS is unnecessary:
    # gray input through the 3-component path must stay gray.
    g = np.full((16, 16, 3), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(g))
    assert out is not None
    assert np.abs(out.astype(float) - 77).max() < 6
    spread = out.astype(float).max(axis=-1) - out.astype(float).min(axis=-1)
    assert spread.max() < 6  # no chroma bleed
    assert _decode_jpeg_strict is not None


def test_jpeg_fill_bytes_before_marker():
    # T.81 B.1.1.2 permits 0xFF fill bytes before any marker; they must
    # not desync the segment parse (ADVICE r6).
    from kwwhat_spark.operators.jpeg import decode_jpeg, jpeg_bytes

    p = jpeg_bytes(20, 14, seed=3)
    base = decode_jpeg(p)
    sof = p.find(b"\xff\xc0")
    padded = p[:sof] + b"\xff\xff\xff" + p[sof:]
    out = decode_jpeg(padded)
    assert out is not None and np.array_equal(out, base)


def test_jpeg_non_interleaved_declines():
    # A scan header naming fewer components than the frame (ns=1 on a
    # 3-component frame, i.e. non-interleaved multi-scan baseline) must
    # decline to PIL/stub rather than silently decode luma only
    # (ADVICE r6).
    from kwwhat_spark.operators.jpeg import decode_jpeg, jpeg_bytes

    p = jpeg_bytes(16, 16, seed=5)
    sos = p.find(b"\xff\xda")
    assert sos > 0
    seglen = int.from_bytes(p[sos + 2 : sos + 4], "big")
    assert p[sos + 4] == 3  # ns=3 in the well-formed stream
    # Rewrite SOS to name only the first component: len=8, ns=1,
    # first (cs,tt) pair, then the original Ss/Se/AhAl trailer.
    trailer = p[sos + 2 + seglen - 3 : sos + 2 + seglen]
    new_sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + p[sos + 5 : sos + 7] + trailer
    hacked = p[:sos] + new_sos + p[sos + 2 + seglen :]
    assert decode_jpeg(hacked) is None


@pytest.mark.parametrize(
    "w,h,sub",
    [
        (16, 16, "444"),
        (17, 13, "444"),  # partial edge blocks
        (32, 24, "420"),  # subsampled chroma
        (15, 9, "420"),  # odd dims under 2x2 sampling
        (23, 29, "444"),
    ],
)
def test_jpeg_progressive_bit_identical_to_baseline(w, h, sub):
    # The progressive file carries the SAME quantized coefficients as
    # the baseline file, so decode must be BIT-identical — this pins
    # every scan procedure (DC first/refine, AC first/refine with EOB
    # runs and two successive-approximation levels on luma) exactly.
    from kwwhat_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(w * 1000 + h)
    # Noise stresses dense-coefficient refinement; gradient stresses
    # long EOB runs. Test both contents.
    for rgb in (
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8),
        _gradient_rgb(w, h),
    ):
        base = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(rgb, subsampling=sub))
        assert prog is not None
        assert np.array_equal(base, prog)


def test_jpeg_progressive_through_feature_path():
    from kwwhat_spark.operators.jpeg import encode_jpeg_progressive
    from kwwhat_spark.operators.multimodal import _real_decode as rd

    rgb = _gradient_rgb(20, 14)
    got = rd(encode_jpeg_progressive(rgb), FEATURE_DIM)
    assert got is not None and got[1] == "jpeg"


def test_jpeg_progressive_truncation_semantics():
    from kwwhat_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rgb = _gradient_rgb(16, 16)
    p = encode_jpeg_progressive(rgb)
    # Cut before the first scan's entropy data completes: decline.
    first_sos = p.find(b"\xff\xda")
    assert decode_jpeg(p[: first_sos + 8]) is None
    # Cut mid-stream after some scans: a truncated progressive stream IS
    # a coarser image (the format's defining property) — render it at
    # the right dimensions, approximately the full picture.
    partial = decode_jpeg(p[: len(p) * 2 // 3])
    full = decode_jpeg(p)
    assert partial is not None and partial.shape == full.shape
    assert np.abs(partial.astype(float) - full.astype(float)).mean() < 16.0
    # A baseline stream mislabeled SOF2 has Ss=0,Se=63 — invalid
    # progressive scan header; must decline, not misdecode.
    b = encode_jpeg(rgb)
    sof = b.find(b"\xff\xc0")
    assert decode_jpeg(b[:sof] + b"\xff\xc2" + b[sof + 2 :]) is None
