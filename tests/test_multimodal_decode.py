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
    _decode_ppm,
    _decode_wav,
    _real_decode,
    bmp_bytes,
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


def test_extract_features_modes(spark):
    from kwwhat_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=9)
    strict = {r["media_id"]: r for r in extract_features(media, decode="real").collect()}
    stub = {r["media_id"]: r for r in extract_features(media, decode="stub").collect()}
    for mid, r in strict.items():
        if r["modality"] == "video":  # opaque: strict mode nulls it
            assert r["decoder"] == "undecodable" and r["feature"] is None
        else:
            assert r["decoder"] in ("bmp", "wav")
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
