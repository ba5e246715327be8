"""Baseline JPEG codec (onetl_spark/llm/jpeg.py) + wiring into the
multimodal Arrow-batched operators — the second real codec behind the
gate, mirroring test_png_decode.py.

JPEG is lossy, so round-trips assert bounded pixel error; determinism is
golden-pinned on the DECODED bytes (a codec change that alters any
decode stage fails loudly).
"""

import hashlib
import statistics

import pytest

from onetl_spark.llm import jpeg, png
from onetl_spark.llm.multimodal import ahash_bits, decode_image_gray


W, H = 48, 32
GOLDEN_DECODE_MD5_Q75 = "9feaf6f4ca092ff18cdcda4836c0b385"


def fixture_pixels() -> bytes:
    px = bytearray(W * H)
    for y in range(H):
        for x in range(W):
            v = (x * 5 + y * 3) % 256
            if 10 <= x < 22 and 8 <= y < 20:
                v = 240
            px[y * W + x] = v
    return bytes(px)


def fixture_jpeg(**kw) -> bytes:
    return jpeg.encode_jpeg_gray(fixture_pixels(), W, H, **kw)


def test_roundtrip_bounded_error_and_golden():
    payload = fixture_jpeg(quality=75)
    assert jpeg.is_jpeg(payload)
    w, h, out = jpeg.decode_jpeg_gray(payload)
    assert (w, h) == (W, H)
    ref = fixture_pixels()
    err = [abs(a - b) for a, b in zip(out, ref)]
    # smooth-gradient fixture with one hard edge: mean error small,
    # worst pixel bounded by DCT ringing at the edge
    assert statistics.mean(err) < 4 and max(err) < 40
    assert hashlib.md5(out).hexdigest() == GOLDEN_DECODE_MD5_Q75


def test_quality_monotonicity():
    ref = fixture_pixels()
    errs = []
    for q in (95, 75, 50):
        _, _, out = jpeg.decode_jpeg_gray(fixture_jpeg(quality=q))
        errs.append(statistics.mean(abs(a - b) for a, b in zip(out, ref)))
    assert errs[0] < errs[1] < errs[2]  # lower quality -> more error
    assert errs[0] < 1.0  # q95 is near-lossless on this fixture


def test_restart_markers_resync_bit_identically():
    base = jpeg.decode_jpeg_gray(fixture_jpeg(quality=75))[2]
    with_rst = fixture_jpeg(quality=75, restart_interval=3)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert jpeg.decode_jpeg_gray(with_rst)[2] == base


def test_three_component_interleave_stays_in_sync():
    """The decoder must entropy-decode Cb/Cr blocks it discards; any
    bitstream desync would corrupt every later Y block."""
    base = jpeg.decode_jpeg_gray(fixture_jpeg(quality=75))[2]
    p3 = fixture_jpeg(quality=75, components=3)
    assert jpeg.decode_jpeg_gray(p3)[2] == base
    p3r = fixture_jpeg(quality=75, components=3, restart_interval=2)
    assert jpeg.decode_jpeg_gray(p3r)[2] == base


def test_non_multiple_of_8_geometry():
    px = bytes((i * 17) % 256 for i in range(13 * 9))
    w, h, out = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(px, 13, 9, quality=90))
    assert (w, h) == (13, 9) and len(out) == 13 * 9


def test_unsupported_and_corrupt_variants_raise_valueerror():
    good = fixture_jpeg(quality=75)
    # progressive (SOF2) flagged as unsupported, not mis-decoded
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_jpeg_gray(bytes(prog))
    # 12-bit precision rejected
    deep = bytearray(good)
    deep[i + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        jpeg.decode_jpeg_gray(bytes(deep))
    # bad signature
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg_gray(b"not a jpeg")
    # truncated entropy stream must not hang or crash with IndexError
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(good[: len(good) // 3])
    # encoder validation
    with pytest.raises(ValueError, match="geometry"):
        jpeg.encode_jpeg_gray(b"\x00" * 10, 4, 4)
    with pytest.raises(ValueError, match="quality"):
        jpeg.encode_jpeg_gray(b"\x00" * 16, 4, 4, quality=0)
    # SOS referencing a component id absent from SOF must raise
    # ValueError, not StopIteration (ADVICE r7: byte-path fallbacks
    # catch only ValueError, so anything else kills the Spark task)
    bad_sos = bytearray(good)
    j = bad_sos.find(b"\xff\xda")
    bad_sos[j + 5] = 0x7F  # scan component selector -> unknown id
    with pytest.raises(ValueError, match="unknown component"):
        jpeg.decode_jpeg_gray(bytes(bad_sos))


def test_decode_image_gray_routes_jpeg():
    w, h, out = decode_image_gray(fixture_jpeg(quality=75))
    assert (w, h) == (W, H)
    assert hashlib.md5(out).hexdigest() == GOLDEN_DECODE_MD5_Q75


def test_compression_invariance_of_ahash_across_codecs():
    """The SAME image encoded as PNG (lossless) and as q95 JPEG must
    produce near-identical perceptual hashes — the cross-codec dedup
    property the multimodal pipeline exists for."""
    ref = fixture_pixels()
    h_png = ahash_bits(png.decode_png_gray(png.encode_png_gray(ref, W, H))[2])
    h_jpg = ahash_bits(jpeg.decode_jpeg_gray(fixture_jpeg(quality=95))[2])
    hamming = bin(h_png ^ h_jpg).count("1")
    assert hamming <= 2  # q95 noise may flip at most a couple of bits


def test_spark_operators_take_real_jpeg_payloads(spark):
    import pandas as pd

    from onetl_spark.llm.multimodal import image_ahash, resize_images

    good = fixture_jpeg(quality=75)
    decoded = jpeg.decode_jpeg_gray(good)[2]
    corrupt = b"\xff\xd8\xff\xe0 garbage jpeg bytes"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [good, corrupt]})
    )
    got = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] == ahash_bits(decoded)  # real decode path
    assert got[2] == ahash_bits(corrupt)  # corrupt -> byte fallback

    resized = {r["doc_id"]: r["resized_digest"] for r in resize_images(df, 8, 8).collect()}
    assert resized[1] == hashlib.md5(
        png.resize_gray(decoded, W, H, 8, 8)
    ).hexdigest()
    assert resized[2] == hashlib.md5(corrupt + b":8x8").hexdigest()
