"""Pure-stdlib WAV (RIFF/PCM) codec — the third real codec behind the
multimodal gate (pattern: :mod:`onetl_spark.llm.png`, ``jpeg``).

Decoder: canonical RIFF chunk walk (fmt/data plus any skippable chunks,
word-aligned), integer-PCM only — 16-bit signed little-endian and 8-bit
unsigned, mono or multi-channel with an integer floor-average downmix.
Compressed/float formats (IEEE float, ADPCM, extensible, µ-law) raise
``ValueError`` so callers take their documented byte-path fallback —
the same contract as unsupported PNG/JPEG variants.

Encoder: PCM16 fixture builder (mono/stereo) that exercises chunk
alignment, multi-channel interleave, and the odd-length pad byte.
"""

from __future__ import annotations

import struct

__all__ = ["is_wav", "decode_wav_pcm", "encode_wav_pcm16"]


def is_wav(payload: bytes) -> bool:
    """RIFF/WAVE signature check."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_wav_pcm(payload: bytes) -> "tuple[int, int, list[int]]":
    """Decode an integer-PCM WAV to ``(sample_rate, n_channels,
    mono_samples)`` — multi-channel audio is downmixed by integer floor
    average (deterministic on any platform; no float resampling). 8-bit
    unsigned samples are centered to signed (−128..127) so both widths
    share the "deviation from silence" convention. Raises ``ValueError``
    for compressed/float formats and corrupt structures — never a raw
    struct.error (one bad payload must not kill a Spark task)."""
    try:
        return _decode(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt WAV structure: {exc!r}") from exc


def _decode(payload: bytes) -> "tuple[int, int, list[int]]":
    if not is_wav(payload):
        raise ValueError("not a WAV payload (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            audio_format, channels, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise ValueError(
                    f"unsupported WAV format {audio_format} (PCM only — "
                    "float/ADPCM/extensible take the byte fallback)"
                )
            if bits not in (8, 16):
                raise ValueError(f"unsupported WAV bit depth {bits}")
            if channels < 1:
                raise ValueError("WAV with zero channels")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    channels, rate, bits = fmt
    if bits == 16:
        n = len(data) // (2 * channels)
        frames = struct.unpack(f"<{n * channels}h", data[: n * channels * 2])
    else:
        n = len(data) // channels
        frames = [b - 128 for b in data[: n * channels]]
    if channels == 1:
        mono = list(frames)
    else:
        mono = [
            sum(frames[i * channels : (i + 1) * channels]) // channels
            for i in range(n)
        ]
    return rate, channels, mono


def encode_wav_pcm16(
    samples: "list[int]",
    sample_rate: int = 8000,
    channels: int = 1,
) -> bytes:
    """Encode signed 16-bit samples as a canonical RIFF/WAVE file.
    With ``channels > 1`` the mono input is duplicated into every
    channel (interleaved), which the decoder's floor-average downmix
    inverts exactly — a lossless round-trip fixture."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    inter = [s for s in samples for _ in range(channels)]
    data = struct.pack(f"<{len(inter)}h", *inter)
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    chunks = b"WAVE"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"  # pad byte keeps the RIFF size word-aligned
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
