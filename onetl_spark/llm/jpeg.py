"""Pure-stdlib baseline JPEG (JFIF) codec — the second REAL image codec
behind the multimodal gate (pattern: :mod:`onetl_spark.llm.png`).

Decoder: baseline sequential DCT (SOF0) only — huffman entropy decode
(canonical tables from DHT), DC prediction, AC run-length, dequantize,
inverse zigzag, separable float IDCT, level shift, chroma ignored for
the grayscale output but fully entropy-decoded so the bitstream stays
in sync across interleaved MCUs. Restart markers honored. Progressive
(SOF2), arithmetic coding, 12-bit precision, and hierarchical variants
raise ``ValueError`` so callers take their documented byte-path
fallback (same contract as unsupported PNG variants).

Encoder: single-component grayscale baseline with the ITU T.81 Annex K
example luminance quantization/huffman tables — a fixture builder that
exercises every decoder stage (like ``encode_png_gray``). JPEG is
lossy: round-trips are near, not exact; tests golden-pin the decoded
bytes instead.

Reference parity note: the reference ships image handling via external
native libs; this repo keeps the Spark-side plumbing identical (Arrow-
batched ``mapInPandas``) and swaps the codec for a dependency-free one.
"""

from __future__ import annotations

import math
import struct

__all__ = ["is_jpeg", "decode_jpeg_gray", "encode_jpeg_gray"]


def is_jpeg(payload: bytes) -> bool:
    """SOI marker check (``FF D8 FF``)."""
    return len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff"


#: zigzag order: index i of the scan -> (row, col) flat index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: ITU T.81 Annex K.1 example luminance quantization table (zigzag order
#: applied at use; stored here in natural row-major order)
K1_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.3.3.1: luminance DC huffman spec (BITS counts, then values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))

#: Annex K.3.3.2: luminance AC huffman spec
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_huffman_decode(bits: list[int], vals: list[int]) -> dict:
    """Canonical huffman: (length, code) -> value (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], vals: list[int]) -> dict:
    """value -> (code, length) for the encoder."""
    return {v: (c, l) for (l, c), v in _build_huffman_decode(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1-bits past the end (T.81 F.2.2.5 allows the
                # final EOB code to be completed by padding)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resets
                    break
                else:  # EOI / next segment: pad
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker and resync to a byte boundary."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        # skip any pad FFs, then the marker byte
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to the signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


#: precomputed IDCT cosines: c[u][x] = cn(u) * cos((2x+1) u pi / 16)
_IDCT_C = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _idct_2d(coef: list[float]) -> list[int]:
    """Separable 8×8 inverse DCT + level shift + clamp (T.81 A.3.3)."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            tmp[y * 8 + x] = sum(row[u] * _IDCT_C[u][x] for u in range(8)) / 2
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            v = sum(col[v_] * _IDCT_C[v_][y] for v_ in range(8)) / 2
            p = int(round(v)) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, grayscale_rows)``;
    the luma (Y) plane IS the grayscale output (ITU-R 601 luma is what
    JPEG stores). Raises ``ValueError`` on non-baseline variants or
    corrupt data — callers fall back to the byte path (truncated
    segments surface as ValueError, never IndexError/struct.error,
    so one malformed payload cannot kill a whole Spark task)."""
    try:
        return _decode_jpeg_gray(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt JPEG structure: {exc!r}") from exc


def _decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (bad SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, components) with component dicts
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # no payload
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    zz = list(seg[p : p + 64]); p += 64
                else:
                    zz = list(struct.unpack(f">64H", seg[p : p + 128])); p += 128
                nat = [0] * 64
                for i, z in enumerate(ZIGZAG):
                    nat[z] = zz[i]
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman_decode(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG variant (SOF{marker - 0xC0}: progressive/"
                "arithmetic/hierarchical)"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in frame[2] if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(
                        f"JPEG SOS references unknown component id {cs}"
                    )
                scan.append((comp, tt >> 4, tt & 0xF))
            data_pos = pos + seglen
            return _decode_scan(
                payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(
    payload, data_pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # output plane only for the FIRST scan component (Y); others are
    # entropy-decoded to keep sync but their pixels are discarded
    y_comp = scan[0][0]
    yw, yh = mcux * 8 * y_comp["h"], mcuy * 8 * y_comp["v"]
    plane = bytearray(yw * yh)

    reader = _BitReader(payload, data_pos)
    pred = {id(c): 0 for c, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                for key in pred:
                    pred[key] = 0
            for comp, td, ta in scan:
                if comp["tq"] not in qt:
                    raise ValueError("JPEG references missing quant table")
                q = qt[comp["tq"]]
                dc_tab = huff_dc.get(td)
                ac_tab = huff_ac.get(ta)
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG references missing huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = [0.0] * 64
                        t = reader.decode_huffman(dc_tab)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[id(comp)] += diff
                        coef[0] = pred[id(comp)] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            z = ZIGZAG[k]
                            coef[z] = _extend(reader.read_bits(s), s) * q[z]
                            k += 1
                        if comp is y_comp:
                            px = _idct_2d(coef)
                            ox = (mx * comp["h"] + bx) * 8
                            oy = (my * comp["v"] + by) * 8
                            for yy in range(8):
                                row = oy + yy
                                plane[row * yw + ox : row * yw + ox + 8] = bytes(
                                    px[yy * 8 : yy * 8 + 8]
                                )
            mcu_count += 1
    # crop the padded plane to the true geometry (Y is full resolution)
    out = bytearray(w * h)
    for y in range(h):
        out[y * w : (y + 1) * w] = plane[y * yw : y * yw + w]
    return w, h, bytes(out)


# ---------------------------------------------------------------- encoder

_FDCT_C = _IDCT_C  # same cosine basis


def _fdct_2d(block: list[int]) -> list[float]:
    """Forward 8×8 DCT of level-shifted samples (T.81 A.3.3)."""
    tmp = [0.0] * 64
    for y in range(8):
        row = [block[y * 8 + x] - 128 for x in range(8)]
        for u in range(8):
            tmp[y * 8 + u] = sum(row[x] * _FDCT_C[u][x] for x in range(8)) / 2
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            out[v * 8 + u] = sum(col[y] * _FDCT_C[v][y] for y in range(8)) / 2
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.buf <<= 8 - self.nbits
            self.buf |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(category, low-bits code) for a signed coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _encode_block(bw, block, q, dc_enc, ac_enc, pred: int) -> int:
    """FDCT + quantize + huffman one 8×8 block; returns the new DC
    predictor."""
    coef = _fdct_2d(block)
    quant = [int(round(coef[i] / q[i])) for i in range(64)]
    zz = [quant[ZIGZAG[i]] for i in range(64)]
    diff = zz[0] - pred
    t, code = _magnitude(diff)
    bw.write(*dc_enc[t])
    if t:
        bw.write(code, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_enc[0xF0])  # ZRL
            run -= 16
        s, code = _magnitude(zz[k])
        bw.write(*ac_enc[(run << 4) | s])
        bw.write(code, s)
        run = 0
    if last_nz < 63:
        bw.write(*ac_enc[0x00])  # EOB
    return zz[0]


def encode_jpeg_gray(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 75,
    restart_interval: int = 0,
    components: int = 1,
) -> bytes:
    """Encode grayscale bytes as a baseline JPEG with the Annex K
    example tables (quality scales the quant table the libjpeg way).
    Fixture builder for the decoder — exercises huffman, DC prediction,
    run-length AC, ZRL, EOB, and byte stuffing. ``restart_interval``
    emits DRI + RSTn markers every N MCUs (decoder resync path);
    ``components=3`` writes an interleaved Y/Cb/Cr scan (1×1×1
    sampling, neutral chroma) — the multi-component MCU structure the
    decoder must entropy-skip to stay in sync."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match geometry")
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    if components not in (1, 3):
        raise ValueError("components must be 1 or 3")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = [max(1, min(255, (v * scale + 50) // 100)) for v in K1_LUMA_QT]

    dc_enc = _build_huffman_encode(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = _build_huffman_encode(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    preds = [0] * components
    neutral = [128] * 64
    mcu_count = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                preds = [0] * components
            block = [
                pixels[min(by + y, height - 1) * width + min(bx + x, width - 1)]
                for y in range(8)
                for x in range(8)
            ]
            preds[0] = _encode_block(bw, block, q, dc_enc, ac_enc, preds[0])
            for c in range(1, components):  # neutral chroma, same tables
                preds[c] = _encode_block(bw, neutral, q, dc_enc, ac_enc, preds[c])
            mcu_count += 1
    bw.flush()

    zz_q = bytes(q[ZIGZAG[i]] for i in range(64))
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * components, 8, height, width, components)
    for c in range(components):
        out += bytes([c + 1, 0x11, 0])  # 1x1 sampling, qt 0
    for tc, bits, vals in ((0, DC_LUMA_BITS, DC_LUMA_VALS), (1, AC_LUMA_BITS, AC_LUMA_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * components, components)
    for c in range(components):
        out += bytes([c + 1, 0x00])
    out += bytes([0, 63, 0])
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
