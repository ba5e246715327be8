"""Minimal pure-stdlib PNG codec (RFC 2083) for real image decode in the
multimodal pipeline without native imaging libraries.

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace — the overwhelming majority of real-world PNGs a
curation pipeline meets; anything else raises ``ValueError`` so the
caller's stub fallback stays honest. All five scanline filters (None,
Sub, Up, Average, Paeth) are implemented per the spec. Decoded output is
8-bit grayscale (integer ITU-R 601 luma ``(299r + 587g + 114b) // 1000``)
so every downstream statistic (aHash, resize digests) is bit-reproducible
on any engine.

The encoder (grayscale, filter 0) exists to build deterministic test
fixtures; production payloads arrive already encoded.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG payload to ``(width, height, grayscale_rows)`` where
    ``grayscale_rows`` is ``width*height`` bytes row-major."""
    if not is_png(payload):
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            try:
                width, height, bit_depth, color_type, comp, filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
            except struct.error as exc:  # truncated IHDR
                raise ValueError(f"corrupt PNG IHDR: {exc}") from exc
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # corrupt/truncated IDAT must not kill the task
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")

    prev = bytearray(stride)
    out = bytearray(width * height)
    for y in range(height):
        start = y * (stride + 1)
        ftype = raw[start]
        line = bytearray(raw[start + 1 : start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up_left = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        prev = line
        row_off = y * width
        if color_type == 0:
            out[row_off : row_off + width] = line
        elif color_type == 4:
            out[row_off : row_off + width] = line[0::2]
        else:  # RGB / RGBA → integer luma
            for x in range(width):
                j = x * ch
                out[row_off + x] = (
                    299 * line[j] + 587 * line[j + 1] + 114 * line[j + 2]
                ) // 1000
    return width, height, bytes(out)


def resize_gray(
    pixels: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int
) -> bytes:
    """Integer box-filter (area-average) downsample/upsample of a
    grayscale image — deterministic across platforms (pure integer
    arithmetic, floor division)."""
    if dst_w <= 0 or dst_h <= 0:
        raise ValueError("target geometry must be positive")
    out = bytearray(dst_w * dst_h)
    for y in range(dst_h):
        y0, y1 = (y * src_h) // dst_h, ((y + 1) * src_h) // dst_h
        y1 = max(y1, y0 + 1)
        for x in range(dst_w):
            x0, x1 = (x * src_w) // dst_w, ((x + 1) * src_w) // dst_w
            x1 = max(x1, x0 + 1)
            acc = 0
            for yy in range(y0, y1):
                row = yy * src_w
                for xx in range(x0, x1):
                    acc += pixels[row + xx]
            out[y * dst_w + x] = acc // ((y1 - y0) * (x1 - x0))
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_gray(
    pixels: bytes, width: int, height: int, filters=None
) -> bytes:
    """Encode ``width*height`` grayscale bytes as a PNG (color type 0) —
    fixture builder. ``filters`` is an optional sequence of scanline
    filter types cycled per row (default: filter 0 everywhere); pass
    ``[0, 1, 2, 3, 4]`` to exercise every decode filter through a
    round-trip."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match geometry")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = pixels[y * width : (y + 1) * width]
        f = filters[y % len(filters)] if filters else 0
        raw.append(f)
        for i in range(width):
            left = line[i - 1] if i >= 1 else 0
            if f == 0:
                v = line[i]
            elif f == 1:  # Sub
                v = line[i] - left
            elif f == 2:  # Up
                v = line[i] - prev[i]
            elif f == 3:  # Average
                v = line[i] - ((left + prev[i]) >> 1)
            elif f == 4:  # Paeth
                up_left = prev[i - 1] if i >= 1 else 0
                v = line[i] - _paeth(left, prev[i], up_left)
            else:
                raise ValueError(f"unknown PNG filter {f}")
            raw.append(v & 0xFF)
        prev = line
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )
