"""AVI (RIFF) container codec for MJPEG video — pure Python, no
external libraries.

This un-stubs the VIDEO leg of the multimodal pipeline the way round 7
un-stubbed JPEG images: an AVI-MJPEG file is a RIFF tree whose movi
chunks are complete baseline/progressive JPEG frames, so frame
extraction reuses operators/jpeg.py end-to-end (container parse here,
pixel decode there — both bit-exact and dependency-free).

Layout written/understood (the public RIFF/AVI structure):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        avih <MainAVIHeader: dwMicroSecPerFrame, ..., dwTotalFrames,
              ..., dwWidth, dwHeight>
        LIST 'strl'
          strh <'vids'/'MJPG', scale/rate, length>
          strf <BITMAPINFOHEADER, biCompression='MJPG'>
      LIST 'movi'
        00dc <jpeg bytes> (word-aligned)
      idx1 <chunk index>

Scale note: these functions are per-row payload transforms consumed by
Arrow-batched mapInPandas stages (operators/multimodal.py) — the
container never touches the driver; a 100 TB video corpus streams
through executors like any other binary column.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list_chunk(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes],
    *,
    width: int,
    height: int,
    us_per_frame: int = 40_000,
) -> bytes:
    """Wrap JPEG frame payloads into a minimal standards-shaped
    AVI-MJPEG file (avih + vids/MJPG strl, movi 00dc chunks, idx1)."""
    if not frames:
        raise ValueError("at least one frame required")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,
        max_bytes * 1_000_000 // max(us_per_frame, 1),
        0,                      # padding granularity
        0x10,                   # AVIF_HASINDEX
        n, 0, 1, max_bytes,
        width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I", 0, 0, 0, us_per_frame, 1_000_000, 0, n, max_bytes, 0xFFFFFFFF, 0
        )
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list_chunk(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list_chunk(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_entries = []
    idx_entries = []
    offset = 4  # relative to the start of the 'movi' list type
    for f in frames:
        movi_entries.append(_chunk(b"00dc", f))
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(f)))
        offset += 8 + len(f) + (len(f) % 2)
    movi = _list_chunk(b"movi", b"".join(movi_entries))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, start: int, end: int):
    """(fourcc, payload_start, payload_len) per chunk; stops silently at
    truncation. A truncated LIST still yields (clamped) so a cut file
    keeps every complete frame parsed so far — truncated LEAF chunks
    (frames, headers) are dropped, mirroring the JPEG decoder's
    keep-complete-scans semantics."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload_start = pos + 8
        if payload_start + size > end:
            if fourcc == b"LIST":
                yield fourcc, payload_start, end - payload_start
            return
        yield fourcc, payload_start, size
        pos = payload_start + size + (size % 2)


def decode_avi_mjpeg(payload: bytes):
    """Parse an AVI-MJPEG payload into
    {us_per_frame, width, height, n_frames, frames: [jpeg bytes]} —
    or None when the payload is not a parseable AVI with an MJPG video
    stream (callers fall back to the digest stub, like unsupported
    image codecs fall back in decode_image)."""
    if (
        not isinstance(payload, (bytes, bytearray))
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    buf = bytes(payload)
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)
    us_per_frame = width = height = None
    is_mjpg = False
    frames: list[bytes] = []
    for fourcc, p, size in _iter_chunks(buf, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = buf[p : p + 4]
        if list_type == b"hdrl":
            for f2, p2, s2 in _iter_chunks(buf, p + 4, p + size):
                if f2 == b"avih" and s2 >= 40:
                    vals = struct.unpack_from("<10I", buf, p2)
                    us_per_frame, width, height = vals[0], vals[8], vals[9]
                elif f2 == b"LIST" and buf[p2 : p2 + 4] == b"strl":
                    for f3, p3, s3 in _iter_chunks(buf, p2 + 4, p2 + s2):
                        if f3 == b"strh" and s3 >= 8:
                            if (
                                buf[p3 : p3 + 4] == b"vids"
                                and buf[p3 + 4 : p3 + 8] == b"MJPG"
                            ):
                                is_mjpg = True
        elif list_type == b"movi":
            for f2, p2, s2 in _iter_chunks(buf, p + 4, p + size):
                if f2 in (b"00dc", b"00db"):
                    frames.append(buf[p2 : p2 + s2])
    if not is_mjpg or not frames or not us_per_frame:
        return None
    return {
        "us_per_frame": int(us_per_frame),
        "width": int(width or 0),
        "height": int(height or 0),
        "n_frames": len(frames),
        "frames": frames,
    }
