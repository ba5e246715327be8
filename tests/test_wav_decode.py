"""WAV (RIFF/PCM) codec + wiring into audio_frame_energy — the third
real codec behind the multimodal gate, mirroring test_png_decode.py."""

import struct

import pytest

from onetl_spark.llm import wav


def fixture_samples(n: int = 200) -> list:
    # a deterministic "chirp": grows in amplitude, crosses zero often
    return [((i * 37) % 200 - 100) * (1 + i // 50) for i in range(n)]


def test_roundtrip_mono_exact():
    s = fixture_samples()
    payload = wav.encode_wav_pcm16(s, sample_rate=8000)
    assert wav.is_wav(payload)
    rate, ch, out = wav.decode_wav_pcm(payload)
    assert (rate, ch) == (8000, 1)
    assert out == s


def test_stereo_downmix_inverts_duplication():
    s = fixture_samples(64)
    payload = wav.encode_wav_pcm16(s, sample_rate=44100, channels=2)
    rate, ch, out = wav.decode_wav_pcm(payload)
    assert (rate, ch) == (44100, 2)
    assert out == s  # duplicate-interleave + floor-average == identity


def test_true_stereo_floor_average():
    # hand-build an interleaved stereo file: L=[10, -7], R=[20, -8]
    data = struct.pack("<4h", 10, 20, -7, -8)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _, _, out = wav.decode_wav_pcm(payload)
    assert out == [15, (-7 + -8) // 2]  # floor: -8, not -7.5 rounded


def test_pcm8_centering_and_extra_chunks():
    # 8-bit unsigned samples 0,128,255 -> -128, 0, 127; LIST chunk skipped
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body += b"data" + struct.pack("<I", 3) + bytes([0, 128, 255]) + b"\x00"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, out = wav.decode_wav_pcm(payload)
    assert out == [-128, 0, 127]


def test_unsupported_and_corrupt_raise_valueerror():
    s = fixture_samples(16)
    good = wav.encode_wav_pcm16(s)
    # IEEE-float format tag rejected (fallback class)
    f = bytearray(good)
    i = f.find(b"fmt ") + 8
    f[i:i + 2] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="PCM only"):
        wav.decode_wav_pcm(bytes(f))
    # 24-bit depth rejected
    d = bytearray(good)
    d[i + 14:i + 16] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="bit depth"):
        wav.decode_wav_pcm(bytes(d))
    with pytest.raises(ValueError, match="signature"):
        wav.decode_wav_pcm(b"not audio at all")
    # truncated chunk walk must not raise struct.error
    with pytest.raises(ValueError):
        wav.decode_wav_pcm(good[:20])
    with pytest.raises(ValueError, match="range"):
        wav.encode_wav_pcm16([99999])


def test_audio_frame_energy_decodes_real_wav(spark):
    import pandas as pd

    from onetl_spark.llm.multimodal import audio_frame_energy

    s = fixture_samples(100)
    good = wav.encode_wav_pcm16(s, channels=2)  # stereo -> downmixed
    not_audio = b"just some document text bytes"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [good, not_audio]})
    )
    out = {r["doc_id"]: r for r in audio_frame_energy(df, frame=16, hop=8).collect()}
    # real decode: stats over the DECODED samples, not the file bytes
    assert out[1]["n_samples"] == 100
    assert out[1]["sum_sq"] == sum(v * v for v in s)
    assert out[1]["peak_dev"] == max(abs(v) for v in s)
    # byte fallback unchanged for non-audio payloads
    dev = [b - 128 for b in not_audio]
    assert out[2]["n_samples"] == len(not_audio)
    assert out[2]["sum_sq"] == sum(v * v for v in dev)
