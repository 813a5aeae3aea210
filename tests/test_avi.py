"""AVI/MJPEG container codec + real video frame sampling
(operators/avi.py, frame_sample real-path wiring)."""

from __future__ import annotations

from kwwhat_spark.operators.avi import decode_avi_mjpeg, encode_avi_mjpeg
from kwwhat_spark.operators.jpeg import decode_jpeg, jpeg_bytes


def _frames(n, w=16, h=16, seed=9):
    return [jpeg_bytes(w, h, seed=seed + j) for j in range(n)]


def test_avi_roundtrip_bit_exact():
    frames = _frames(5)
    payload = encode_avi_mjpeg(frames, width=16, height=16, us_per_frame=250_000)
    avi = decode_avi_mjpeg(payload)
    assert avi is not None
    assert avi["us_per_frame"] == 250_000
    assert avi["width"] == 16 and avi["height"] == 16
    assert avi["n_frames"] == 5
    assert avi["frames"] == frames  # container adds nothing, loses nothing
    # Every extracted frame pixel-decodes through the in-repo JPEG codec.
    for f in avi["frames"]:
        img = decode_jpeg(f)
        assert img is not None and img.shape == (16, 16, 3)


def test_avi_odd_sized_frames_word_aligned():
    # Force odd payload length to exercise the RIFF pad byte.
    frames = [b"\xff\xd8" + b"x" * 31 + b"\xff\xd9"]  # 35 bytes, odd
    payload = encode_avi_mjpeg(frames, width=4, height=4)
    avi = decode_avi_mjpeg(payload)
    assert avi is not None and avi["frames"] == frames


def test_avi_rejects_garbage_and_foreign_containers():
    assert decode_avi_mjpeg(b"") is None
    assert decode_avi_mjpeg(b"\x00" * 64) is None
    assert decode_avi_mjpeg(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None


def test_avi_truncation_keeps_parsed_frames():
    frames = _frames(4)
    payload = encode_avi_mjpeg(frames, width=16, height=16)
    # Cut inside the last movi chunk: the first frames survive.
    cut = payload[: len(payload) - len(frames[-1]) // 2 - 40]
    avi = decode_avi_mjpeg(cut)
    assert avi is not None
    assert 1 <= avi["n_frames"] < 4
    assert avi["frames"] == frames[: avi["n_frames"]]


def test_frame_sample_decodes_real_avi_and_stubs_opaque(spark):
    from kwwhat_spark.operators.avi import encode_avi_mjpeg
    from kwwhat_spark.operators.multimodal import MEDIA_SCHEMA, frame_sample

    frames = _frames(4)
    avi_payload = encode_avi_mjpeg(
        frames, width=16, height=16, us_per_frame=1_000_000
    )  # 1 fps: sample at 500ms intervals hits repeat-then-advance indices
    rows = [
        (1, "video", "video/x-msvideo", bytearray(avi_payload), 16, 16, 4000),
        (2, "video", "video/mp4", bytearray(b"\x01\x02" * 64), 64, 48, 1500),
        (3, "image", "image/bmp", bytearray(b"BM"), 4, 4, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = frame_sample(media, interval_ms=500, max_frames=8).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    # Real AVI: duration from the container (4 s), frame index =
    # floor(ts/us_per_frame): 0,0,1,1,2,2,3,3.
    avi_rows = sorted(by_media[1], key=lambda r: r.frame_index)
    assert len(avi_rows) == 8
    expect_idx = [min(r.frame_ts_ms * 1000 // 1_000_000, 3) for r in avi_rows]
    got_payloads = [bytes(r.payload) for r in avi_rows]
    assert got_payloads == [frames[i] for i in expect_idx]
    assert all(r.mime_type == "image/jpeg" for r in avi_rows)
    assert all(decode_jpeg(bytes(r.payload)).shape == (16, 16, 3) for r in avi_rows)
    # Opaque container: digest stub preserved (metadata-driven duration).
    stub_rows = by_media[2]
    assert len(stub_rows) == 4  # 1500 // 500 + 1
    assert all(r.mime_type == "image/x-stub-frame" for r in stub_rows)
    assert all(len(bytes(r.payload)) == 32 for r in stub_rows)
    # Non-video rows dropped.
    assert 3 not in by_media
