"""GIF87a/89a codec — pure Python/numpy, no external libraries.

Completes the web-scraped-image codec set (BMP/PPM/PNG/JPEG already
in-repo): GIF is the remaining format a crawl corpus carries in bulk.
Implements the full still-image feature surface — global and local
color tables, interlaced row ordering (4-pass), LZW decompression with
dynamic code widths and dictionary reset, 89a extension blocks
(graphic control incl. transparency index), and a matching encoder
(palette build + LZW compress) so round-trip tests pin the decoder
bit-exactly without fixtures.

Reference: the public GIF89a specification (CompuServe, 1990) and
ISO/IEC-style LZW as used there (LSB-first variable-width codes,
clear/end codes, 4096-entry dictionary cap).

Scale note: like the other codecs this is a per-row payload transform
consumed by Arrow-batched mapInPandas stages — errors must surface as
None/ValueError (the multimodal dispatcher catches and falls through),
never crash a task.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------
def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    """GIF LZW: LSB-first variable-width codes, dictionary reset on
    CLEAR, stop at END or when max_pixels indices are produced."""
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width = reset()
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("bad first LZW code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("LZW code out of range")
            out += entry
            if len(out) >= max_pixels:
                return bytes(out[:max_pixels])
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """First frame of a GIF87a/89a as an HxWx3 uint8 RGB array, or
    None for non-GIF payloads. Raises ValueError on structurally
    corrupt GIFs (callers catch, matching the other codecs)."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        return None
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:
                flags = payload[pos + 1]
                if flags & 1:
                    transparent = payload[pos + 4]
            while True:  # skip sub-blocks
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or w * h > 64_000_000:
            raise ValueError("bad GIF image descriptor")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code_size = payload[pos]
        pos += 1
        if not (2 <= min_code_size <= 11):
            raise ValueError("bad LZW minimum code size")
        data = bytearray()
        while True:
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            data += payload[pos : pos + size]
            pos += size
        idx = np.frombuffer(
            _lzw_decode(min_code_size, bytes(data), w * h), np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF index outside color table")
        grid = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder the 4 passes
            ordered = np.empty_like(grid)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    ordered[r] = grid[src]
                    src += 1
            grid = ordered
        # Transparency renders as its palette color (feature extraction
        # has no alpha channel; this is the compositing-on-bg=index
        # convention the other in-repo decoders use for missing alpha).
        return ct[grid].copy()
    return None


# ---------------------------------------------------------------------------
# Encoder (tests / synthetic payloads)
# ---------------------------------------------------------------------------
def encode_gif(rgb: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode an HxWx3 uint8 array with <=256 distinct colors as GIF89a
    (global color table, single frame, optional interlacing)."""
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif requires <=256 distinct colors")
    ct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    ct_size = 1 << ct_bits
    table = np.zeros((ct_size, 3), np.uint8)
    table[: len(colors)] = colors
    grid = idx.reshape(h, w).astype(np.uint8)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        grid = grid[rows]
    min_code_size = max(2, ct_bits)
    lzw = _lzw_encode(min_code_size, grid.tobytes())
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
