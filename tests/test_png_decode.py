"""Real PNG decode path: pure-stdlib codec + wiring into the multimodal
Arrow-batched operators (image_ahash / resize_images / decode_image_gray).

Golden constants were computed once from the deterministic fixture and
committed — a codec change that alters decoded pixels fails loudly.
"""

import hashlib
import struct
import zlib

import pytest

from onetl_spark.llm import png
from onetl_spark.llm.multimodal import ahash_bits, decode_image_gray


W, H = 48, 32
GOLDEN_AHASH = 40523788187940
GOLDEN_RESIZE8_MD5 = "f004afa63d37970f3fbda2f600c5af34"
GOLDEN_RESIZE64_MD5 = "3843bfd24b9a93ce6fd32032055db195"


def fixture_pixels() -> bytes:
    px = bytearray(W * H)
    for y in range(H):
        for x in range(W):
            v = (x * 5 + y * 3) % 256
            if 10 <= x < 22 and 8 <= y < 20:
                v = 240
            px[y * W + x] = v
    return bytes(px)


def fixture_png() -> bytes:
    return png.encode_png_gray(fixture_pixels(), W, H)


def test_roundtrip_gray():
    payload = fixture_png()
    assert png.is_png(payload)
    w, h, out = png.decode_png_gray(payload)
    assert (w, h) == (W, H)
    assert out == fixture_pixels()


def _png_from_raw(raw: bytes, width: int, height: int, color_type: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )


def _forward_filter(pixels: bytes, width: int, height: int, ch: int, ftypes):
    """Apply per-row forward filtering (the encoder side of the spec) so
    decode must invert every filter type."""
    stride = width * ch
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = ftypes[y % len(ftypes)]
        out.append(f)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            up_left = prev[i - ch] if i >= ch else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - left
            elif f == 2:
                v = line[i] - up
            elif f == 3:
                v = line[i] - ((left + up) >> 1)
            else:
                v = line[i] - png._paeth(left, up, up_left)
            out.append(v & 0xFF)
        prev = line
    return bytes(out)


def test_all_five_filters_unfilter_correctly():
    pixels = fixture_pixels()
    raw = _forward_filter(pixels, W, H, 1, ftypes=[0, 1, 2, 3, 4])
    payload = _png_from_raw(raw, W, H, color_type=0)
    w, h, out = png.decode_png_gray(payload)
    assert (w, h) == (W, H)
    assert out == pixels


def test_encoder_filters_roundtrip():
    """encode_png_gray(filters=[0..4]) must produce a payload whose
    decode returns the original pixels, and the encoder's forward
    filtering must agree with the test-local reference implementation."""
    pixels = fixture_pixels()
    payload = png.encode_png_gray(pixels, W, H, filters=[0, 1, 2, 3, 4])
    assert png.decode_png_gray(payload) == (W, H, pixels)
    # same as the independent forward-filter helper
    ref = _png_from_raw(_forward_filter(pixels, W, H, 1, ftypes=[0, 1, 2, 3, 4]), W, H, 0)
    assert png.decode_png_gray(ref) == png.decode_png_gray(payload)
    # default stays filter-0 (golden hashes elsewhere depend on it)
    assert png.encode_png_gray(pixels, W, H) == png.encode_png_gray(pixels, W, H, filters=[0])


def test_rgb_and_rgba_luma():
    # 3x2 RGB: known colors → integer ITU-R 601 luma
    colors = [
        (255, 0, 0),
        (0, 255, 0),
        (0, 0, 255),
        (255, 255, 255),
        (0, 0, 0),
        (100, 150, 200),
    ]
    want = bytes((299 * r + 587 * g + 114 * b) // 1000 for r, g, b in colors)
    rgb = b"".join(bytes(c) for c in colors)
    raw = _forward_filter(rgb, 3, 2, 3, ftypes=[0, 4])
    w, h, out = png.decode_png_gray(_png_from_raw(raw, 3, 2, color_type=2))
    assert (w, h, out) == (3, 2, want)
    # RGBA ignores alpha
    rgba = b"".join(bytes(c) + b"\x80" for c in colors)
    raw = _forward_filter(rgba, 3, 2, 4, ftypes=[2, 1])
    w, h, out = png.decode_png_gray(_png_from_raw(raw, 3, 2, color_type=6))
    assert (w, h, out) == (3, 2, want)


def test_unsupported_variants_raise():
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = png.PNG_MAGIC + png._chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError, match="bit depth"):
        png.decode_png_gray(bad)
    with pytest.raises(ValueError, match="signature"):
        png.decode_png_gray(b"GIF89a....")
    # JPEG-signatured garbage now reaches the real JPEG decoder and
    # fails as corrupt (ValueError — the fallback-able class)
    with pytest.raises(ValueError):
        decode_image_gray(b"\xff\xd8\xff\xe0 fake jpeg")
    # a format no present codec handles still gates on Pillow
    with pytest.raises(NotImplementedError):
        decode_image_gray(b"GIF89a....")


def test_corrupt_payloads_raise_valueerror_not_zlib_error():
    """A corrupt/truncated IDAT or IHDR must surface as ValueError — the
    exception the multimodal fallbacks catch — never a raw zlib.error /
    struct.error that would kill a whole Spark task (ADVICE r6)."""
    # valid signature + IHDR, garbage (non-zlib) IDAT bytes
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    corrupt_idat = (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", b"\x00not-deflate-data")
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        png.decode_png_gray(corrupt_idat)
    # truncated zlib stream
    good = fixture_png()
    truncated = good[: len(good) // 2]
    with pytest.raises(ValueError):
        png.decode_png_gray(truncated)
    # truncated IHDR payload
    short_ihdr = png.PNG_MAGIC + png._chunk(b"IHDR", b"\x00\x01\x02")
    with pytest.raises(ValueError, match="IHDR"):
        png.decode_png_gray(short_ihdr)


def test_corrupt_png_takes_byte_fallback_in_operators(spark):
    """resize_images / image_ahash on a PNG-signatured but corrupt
    payload must take the documented byte-path fallback, not crash."""
    import pandas as pd

    from onetl_spark.llm.multimodal import image_ahash, resize_images

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    corrupt = (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", b"\x00garbage")
        + png._chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [corrupt]})
    )
    ahash = image_ahash(df).collect()
    assert ahash[0]["ahash"] == ahash_bits(corrupt)  # raw-byte fallback
    resized = resize_images(df, 8, 8).collect()
    assert resized[0]["resized_digest"] == hashlib.md5(corrupt + b":8x8").hexdigest()


def test_golden_ahash_and_resize():
    w, h, pixels = decode_image_gray(fixture_png())
    assert ahash_bits(pixels) == GOLDEN_AHASH
    assert (
        hashlib.md5(png.resize_gray(pixels, w, h, 8, 8)).hexdigest()
        == GOLDEN_RESIZE8_MD5
    )
    assert (
        hashlib.md5(png.resize_gray(pixels, w, h, 64, 64)).hexdigest()
        == GOLDEN_RESIZE64_MD5
    )
    # resize is a true area average: constant image stays constant
    flat = bytes([77]) * (10 * 10)
    assert set(png.resize_gray(flat, 10, 10, 3, 7)) == {77}


def test_compression_invariance_of_ahash():
    """Same pixels, different PNG byte streams (filter choices) → same
    perceptual hash — the property raw-byte hashing cannot give."""
    pixels = fixture_pixels()
    v1 = fixture_png()  # filter 0 everywhere
    v2 = _png_from_raw(
        _forward_filter(pixels, W, H, 1, ftypes=[4, 3, 2, 1]), W, H, 0
    )
    assert v1 != v2
    h1 = ahash_bits(png.decode_png_gray(v1)[2])
    h2 = ahash_bits(png.decode_png_gray(v2)[2])
    assert h1 == h2 == GOLDEN_AHASH


def test_spark_operators_take_real_png_payloads(spark):
    """Mixed batch of PNG and text payloads through the Arrow-batched
    operators: PNG rows get real-decode results, text rows keep the
    deterministic stand-in path."""
    from onetl_spark.llm.multimodal import image_ahash, resize_images

    payload = fixture_png()
    text = b"not an image at all"
    df = spark.createDataFrame(
        [(1, payload, ("image/png", len(payload))), (2, text, ("text/plain", len(text)))],
        "doc_id long, payload binary, meta struct<mime:string,n_bytes:long>",
    )
    hashes = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert hashes[1] == GOLDEN_AHASH
    assert hashes[2] == ahash_bits(text)

    digests = {
        r["doc_id"]: r["resized_digest"]
        for r in resize_images(df, width=8, height=8).collect()
    }
    assert digests[1] == GOLDEN_RESIZE8_MD5
    assert digests[2] == hashlib.md5(text + b":8x8").hexdigest()
