"""r9 WAV decode widening (VERDICT r8 ask #7): IEEE float PCM (32/64),
G.711 A-law / μ-law, 24-bit integer PCM — all sample-exact against
independent in-test math, plus the feature path no longer falling back
to byte profiles on float WAV."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aces_spark.datapipe.multimodal import DecodeNotAvailable, decode_wav


def _wav(fmt_code, bits, channels, rate, data):
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# independent G.711 expanders (scalar, branch-per-segment — a different
# shape from the module's table builder)
def _ulaw_ref(b: int) -> int:
    u = (~b) & 0xFF
    seg = (u & 0x70) >> 4
    t = (((u & 0x0F) << 3) + 0x84) << seg
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_ref(b: int) -> int:
    a = b ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_float32_exact_passthrough_including_overrange():
    vals = [0.0, 0.5, -0.25, 1.0, -1.0, 1.5, -2.0]  # over-range preserved
    payload = _wav(3, 32, 1, 48000, struct.pack(f"<{len(vals)}f", *vals))
    x, rate = decode_wav(payload)
    assert rate == 48000 and x.shape == (len(vals), 1)
    assert np.array_equal(x[:, 0], np.array(vals, dtype=np.float32).astype(np.float64))


def test_float64_exact_stereo():
    vals = [0.1, -0.2, 0.3, -0.4]  # interleaved L R L R
    payload = _wav(3, 64, 2, 96000, struct.pack("<4d", *vals))
    x, rate = decode_wav(payload)
    assert rate == 96000 and x.shape == (2, 2)
    assert x[0, 0] == 0.1 and x[0, 1] == -0.2
    assert x[1, 0] == 0.3 and x[1, 1] == -0.4


def test_24bit_int_exact_sign_extension():
    def pack24(v):
        return (v & 0xFFFFFF).to_bytes(3, "little")

    samples = [0, 1, -1, (1 << 23) - 1, -(1 << 23), 4242424, -4242424]
    data = b"".join(pack24(v) for v in samples)
    x, rate = decode_wav(_wav(1, 24, 1, 44100, data))
    assert rate == 44100 and x.shape == (len(samples), 1)
    assert np.array_equal(x[:, 0], np.array(samples, dtype=np.float64) / (1 << 23))


@pytest.mark.parametrize("fmt_code,ref", [(7, _ulaw_ref), (6, _alaw_ref)])
def test_g711_all_256_codes_exact(fmt_code, ref):
    data = bytes(range(256))
    x, rate = decode_wav(_wav(fmt_code, 8, 1, 8000, data))
    assert rate == 8000 and x.shape == (256, 1)
    expect = np.array([ref(b) for b in range(256)], dtype=np.float64) / 32768.0
    assert np.array_equal(x[:, 0], expect)


def test_g711_known_values():
    # μ-law 0xFF and 0x7F are both zero (positive/negative silence);
    # 0x80 is positive full-scale +32124, 0x00 its negative mirror
    x, _ = decode_wav(_wav(7, 8, 1, 8000, bytes([0xFF, 0x7F, 0x80, 0x00])))
    assert x[0, 0] == 0.0 and x[1, 0] == 0.0
    assert x[2, 0] == 32124 / 32768.0
    assert x[3, 0] == -32124 / 32768.0
    # A-law 0x55 (XOR-to-0) is the smallest negative step -8/32768;
    # 0xD5 its positive mirror
    y, _ = decode_wav(_wav(6, 8, 1, 8000, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    assert y[0, 0] == -8 / 32768.0
    assert y[1, 0] == 8 / 32768.0


def test_unsupported_variants_still_raise():
    with pytest.raises(DecodeNotAvailable):
        decode_wav(_wav(3, 16, 1, 8000, b"\x00" * 8))  # 16-bit float
    with pytest.raises(DecodeNotAvailable):
        decode_wav(_wav(6, 16, 1, 8000, b"\x00" * 8))  # 16-bit a-law
    with pytest.raises(DecodeNotAvailable):
        decode_wav(_wav(2, 8, 1, 8000, b"\x00" * 8))  # ADPCM
    with pytest.raises(DecodeNotAvailable):
        decode_wav(_wav(1, 32, 1, 8000, b"\x00" * 8))  # 32-bit int PCM


def test_feature_path_decodes_float_wav(spark):
    # before r9 a float WAV fell back to the byte profile; now the
    # audio feature (8 dims led by n_frames/rate/channels) comes out
    from aces_spark.datapipe.multimodal import extract_features

    vals = [0.5, -0.5] * 8
    wav = _wav(3, 32, 2, 16000, struct.pack(f"<{len(vals)}f", *vals))
    media = spark.createDataFrame(
        [(1, wav, "audio", None)],
        "media_id long, payload binary, media_type string, "
        "meta struct<width:int,height:int,duration_ms:long,codec:string>",
    )
    row = extract_features(media).collect()[0]
    f = row["feature"]
    assert f[0] == 8.0 and f[1] == 16000.0 and f[2] == 2.0
