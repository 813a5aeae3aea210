"""GIF87a/89a codec (operators/gif.py): bit-exact round trips across
palette sizes, interlacing, dictionary resets, and malformed input."""

from __future__ import annotations

import numpy as np
import pytest

from kwwhat_spark.operators.gif import decode_gif, encode_gif


@pytest.mark.parametrize("w,h,ncolors", [(8, 6, 4), (16, 16, 2), (13, 9, 200)])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_bit_exact(w, h, ncolors, interlace):
    rng = np.random.default_rng(w * 1000 + h * 10 + ncolors + int(interlace))
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    rgb = palette[rng.integers(0, ncolors, size=(h, w))]
    payload = encode_gif(rgb, interlace=interlace)
    got = decode_gif(payload)
    assert got is not None and got.shape == (h, w, 3)
    assert np.array_equal(got, rgb)  # palette codec: lossless


def test_gif_large_image_exercises_dictionary_reset():
    # 256 colors x 120x120 random pixels drives the LZW dictionary past
    # 4096 entries -> encoder clear/reset path + decoder reset path.
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(120, 120, 3), dtype=np.uint8)
    # Quantize to exactly 256 palette colors.
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 256, size=(120, 120))]
    payload = encode_gif(img)
    got = decode_gif(payload)
    assert np.array_equal(got, img)


def test_gif_flat_image_single_color():
    rgb = np.full((5, 7, 3), 42, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(rgb)), rgb)


def test_gif_89a_extension_blocks_skipped():
    rgb = np.zeros((3, 3, 3), dtype=np.uint8)
    payload = bytearray(encode_gif(rgb))
    # Inject a graphic-control extension right before the image
    # descriptor (0x2C): 0x21 0xF9, 4-byte block, terminator.
    at = payload.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])  # transparency idx 1
    payload[at:at] = gce
    got = decode_gif(bytes(payload))
    assert got is not None and np.array_equal(got, rgb)


def test_gif_rejects_non_gif_and_corrupt():
    assert decode_gif(b"") is None
    assert decode_gif(b"NOTGIF" * 4) is None
    assert decode_gif(b"GIF88a" + b"\x00" * 20) is None
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = encode_gif(rgb)
    with pytest.raises((ValueError, IndexError)):
        decode_gif(payload[: len(payload) // 2])  # truncated mid-stream


@pytest.mark.full
def test_gif_feature_dispatch(spark):
    from kwwhat_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, n=48)
    feats = extract_features(media).collect()
    decoders = {r.decoder for r in feats}
    assert "gif" in decoders  # the rotation emits + decodes real GIFs
    gif_rows = [r for r in feats if r.decoder == "gif"]
    assert all(r.feature is not None for r in gif_rows)
