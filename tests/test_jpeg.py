"""Baseline JPEG decode (datapipe/multimodal.py:decode_jpeg) — pinned
fixture bytes + exact uint8 golden, spec-derived roundtrips against the
independent test-local reference encoder (tests/jpeg_ref.py — shares no
code with the decoder), unsupported-profile / corrupt-stream contracts,
and the distributed feature path picking JPEG payloads up.

VERDICT r7 ask #2.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from aces_spark.datapipe.multimodal import (
    DecodeNotAvailable,
    decode_image,
    decode_jpeg,
)
from jpeg_ref import encode_jpeg

# 16x16 smooth RGB gradient, quant=4, 4:2:0 subsampling, restart every
# MCU — generated once by tests/jpeg_ref.py and checked in byte-for-byte
FIXTURE_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb004300040404040404040404"
    "04040404040404040404040404040404040404040404040404040404040404040404"
    "040404040404040404040404040404040404040404ffc000110800100010030122000"
    "21100031100ffc400160000000300000000000000000000000000050607ffc4001710"
    "0000040000000000000000000000000000042131ffc400150100020000000000000000"
    "0000000000000507ffc4001d110000000a00000000000000000000000000030506223"
    "2415162a1ffdd00040001ffda000c03010002110311003f001a2a6d94188a9b6509a9"
    "536ca0c454db28022cde8240b12313d445cc0fffd9"
)
GOLDEN_MD5 = "82f380dce75287813466b1c5df2ed73f"


def _src_rgb():
    yy, xx = np.mgrid[0:16, 0:16]
    return np.stack([40 + 6 * xx, 210 - 5 * yy, 60 + 3 * xx + 4 * yy], axis=2).astype(
        np.uint8
    )


def test_pinned_fixture_exact_golden():
    payload = bytes.fromhex(FIXTURE_HEX)
    out = decode_jpeg(payload)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    assert hashlib.md5(out.tobytes()).hexdigest() == GOLDEN_MD5
    # spot pixels pinned exactly (readable failure if the md5 trips)
    assert out[0, 0].tolist() == [42, 208, 66]
    assert out[15, 15].tolist() == [127, 138, 160]
    assert out[7, 8].tolist() == [89, 175, 110]
    # lossy-but-faithful: within quantization error of the source
    assert np.abs(out.astype(int) - _src_rgb().astype(int)).max() <= 6


def test_solid_gray_analytic_exact():
    # constant block: F(0,0) = 8*(v-128); quant 16 -> DC=1 for v=130;
    # decode: 16/8 + 128 = 130 exactly — the DC path with hand math
    img = np.full((8, 8), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=16))
    assert out.shape == (8, 8, 3)
    assert np.unique(out).tolist() == [130]


def test_greyscale_gradient_roundtrip():
    yy, xx = np.mgrid[0:32, 0:48]
    img = ((yy * 2 + xx * 3) % 200 + 20).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=2))
    assert out.shape == (32, 48, 3)
    # greyscale replicates into 3 identical channels
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_color_444_and_420_roundtrip():
    yy, xx = np.mgrid[0:32, 0:48]
    rgb = np.stack(
        [np.clip(100 + yy * 2, 0, 255), np.clip(50 + xx, 0, 255), np.full_like(xx, 90)],
        axis=2,
    ).astype(np.uint8)
    out444 = decode_jpeg(encode_jpeg(rgb, quant=2))
    assert np.abs(out444.astype(int) - rgb.astype(int)).max() <= 3
    out420 = decode_jpeg(encode_jpeg(rgb, quant=2, subsample=True))
    assert out420.shape == rgb.shape
    assert np.abs(out420.astype(int) - rgb.astype(int)).max() <= 4


def test_restart_markers_equal_no_restart():
    yy, xx = np.mgrid[0:32, 0:48]
    img = ((yy * 2 + xx * 3) % 200 + 20).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quant=2))
    b = decode_jpeg(encode_jpeg(img, quant=2, restart_interval=2))
    assert np.array_equal(a, b)


def test_odd_dimensions_cropped_exactly():
    yy, xx = np.mgrid[0:19, 0:21]
    img = ((yy * 3 + xx * 2) % 230).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=2))
    assert out.shape == (19, 21, 3)


def test_nonuniform_quant_table():
    # a real (non-flat) table exercises per-coefficient dequantization
    q = np.arange(1, 65, dtype=np.int32)
    yy, xx = np.mgrid[0:16, 0:16]
    img = ((yy * 5 + xx * 7) % 220 + 10).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=q))
    assert out.shape == (16, 16, 3)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 40


def test_unsupported_profiles_raise_decode_not_available():
    payload = bytearray(bytes.fromhex(FIXTURE_HEX))
    # arithmetic-coded: patch SOF0 -> SOF9 (progressive SOF2 is now
    # SUPPORTED, r9 — see the progressive section below)
    i = bytes(payload).find(b"\xff\xc0")
    arith = payload.copy()
    arith[i + 1] = 0xC9
    with pytest.raises(DecodeNotAvailable):
        decode_jpeg(bytes(arith))
    # 16-bit quant table: set DQT precision nibble
    j = bytes(payload).find(b"\xff\xdb")
    deep = payload.copy()
    deep[j + 4] = 0x10
    with pytest.raises(DecodeNotAvailable):
        decode_jpeg(bytes(deep))
    # not a JPEG at all
    with pytest.raises(DecodeNotAvailable):
        decode_jpeg(b"GIF89a strip")
    with pytest.raises(DecodeNotAvailable):
        decode_jpeg(None)


def test_five_component_raises_decode_not_available():
    # 4-component (Adobe CMYK) is SUPPORTED since r10; a 5-component SOF
    # stays honestly unavailable. Hand-patch the SOF component count.
    payload = bytearray(bytes.fromhex(FIXTURE_HEX))
    i = bytes(payload).find(b"\xff\xc0")
    # SOF layout: FF C0 len(2) prec h(2) w(2) ncomp
    payload[i + 9] = 5
    payload[i + 3] = payload[i + 3] + 6  # keep segment length consistent
    with pytest.raises(DecodeNotAvailable):
        decode_jpeg(bytes(payload))


def test_truncated_stream_raises_value_error():
    payload = bytes.fromhex(FIXTURE_HEX)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) - 30])
    with pytest.raises(ValueError):
        decode_jpeg(payload[:40])


def test_decode_image_dispatches_jpeg():
    payload = bytes.fromhex(FIXTURE_HEX)
    out = decode_image(payload)
    assert hashlib.md5(out.tobytes()).hexdigest() == GOLDEN_MD5


def test_feature_path_picks_up_jpeg(spark):
    from aces_spark.datapipe.multimodal import encode_rgb, extract_features

    jpeg = bytes.fromhex(FIXTURE_HEX)
    ppm = encode_rgb(_src_rgb())
    rows = [
        (1, jpeg, "image", None),
        (2, ppm, "image", None),
        (3, b"not media", "image", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, meta struct<width:int,height:int,duration_ms:long,codec:string>"
    )
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == 3
    # decoded JPEG and PPM of the same scene produce CLOSE pixel features
    f1, f2 = feats[1]["feature"], feats[2]["feature"]
    assert f1 is not None and f2 is not None
    assert abs(f1[0] - f2[0]) < 4  # mean channel intensity within quant error


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash) + Hamming near-pair miner
# ---------------------------------------------------------------------------

import random as _random

from aces_spark.datapipe.multimodal import (
    encode_rgb,
    perceptual_hashes,
    phash64,
    phash_near_pairs,
)


def _structured_rgb(seed=3, n=128):
    rng = np.random.RandomState(seed)
    base = np.kron((rng.rand(16, 16) * 255).astype(np.uint8), np.ones((n // 16, n // 16), dtype=np.uint8))
    return np.stack([base, np.roll(base, 3, 0), np.roll(base, 5, 1)], axis=2)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariances_and_discrimination():
    img = _structured_rgb(3)
    h0 = phash64(img)
    # re-encode through lossy JPEG (4:2:0): perceptually identical
    h_jpeg = phash64(decode_jpeg(encode_jpeg(img, quant=8, subsample=True)))
    assert _ham(h0, h_jpeg) <= 4
    # brightness shift: DCT AC coefficients unchanged
    h_bright = phash64(np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8))
    assert _ham(h0, h_bright) <= 4
    # downscale 2x: pHash normalizes size away
    h_small = phash64(img[::2, ::2])
    assert _ham(h0, h_small) <= 10
    # a different image is FAR
    assert _ham(h0, phash64(_structured_rgb(9))) >= 20


def test_perceptual_hashes_null_for_undecodable(spark):
    img = _structured_rgb(5)
    rows = [
        (1, bytearray(encode_rgb(img))),
        (2, bytearray(encode_jpeg(img, quant=8))),
        (3, bytearray(b"corrupt payload")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["phash"] for r in perceptual_hashes(media).collect()}
    assert got[3] is None and got[4] is None
    assert got[1] is not None and got[2] is not None
    # PPM and its lossless-ish JPEG re-encode collide within threshold
    assert _ham(got[1] & ((1 << 64) - 1), got[2] & ((1 << 64) - 1)) <= 4


def test_phash_near_pairs_brute_force_differential(spark):
    # planted hash families: the block-rotation pigeonhole must find the
    # EXACT distance ball a brute-force python scan finds
    rng = _random.Random(77)
    rows = []
    for fam in range(40):
        base = rng.getrandbits(63)
        for m in range(rng.randint(1, 4)):
            h = base
            for _ in range(rng.randint(0, 6)):
                h ^= 1 << rng.randrange(60)
            rows.append((fam * 100 + m, h))
    hashes = {i: h for i, h in rows}
    want = set()
    ids = sorted(hashes)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 10:
                want.add((a, b, d))
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in phash_near_pairs(df, k=10).collect()
    }
    assert got == want and want


def test_phash_near_pairs_validation(spark):
    df = spark.createDataFrame([(1, 0)], "media_id long, phash long")
    with pytest.raises(ValueError):
        phash_near_pairs(df, k=64)
    with pytest.raises(ValueError):
        phash_near_pairs(df, k=-1)


# ---------------------------------------------------------------- progressive
# (r9, VERDICT r8 ask #3) SOF2 spectral selection + successive
# approximation over the same huffman/IDCT core. The reference encoder
# (tests/jpeg_ref.py:encode_jpeg_progressive — cjpeg's
# jpeg_simple_progression script, shares no code with the decoder)
# emits the SAME quantized coefficients as its baseline sibling, so a
# progressive decode must equal the baseline decode EXACTLY.

# 16x16 smooth RGB gradient, quant=4, 4:2:0, restart every unit —
# generated once by encode_jpeg_progressive and checked in byte-for-byte.
# Its golden md5 EQUALS the baseline fixture's: same image, same
# quantization, losslessly re-represented across 10 progressive scans.
PROG_FIXTURE_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb004300040404040404040404"
    "04040404040404040404040404040404040404040404040404040404040404040404"
    "040404040404040404040404040404040404040404ffc20011080010001003012200"
    "021100031100ffdd00040001ffc40016000000030000000000000000000000000004"
    "0506ffda000c030100020003000000011a629a310098ffc400151000020000000000"
    "0000000000000000000002ffda0008010100010502563fffd0563fffd1563fffd256"
    "3fffc40017100000040000000000000000000000000000042131ffda000801030001"
    "3f01265d907fffc40017100000040000000000000000000000000000020561ffda00"
    "08010200013f012a7b0fffc40014100001000000000000000000000000000000ffda"
    "0008010100063f023fffd03fffd13fffd23fffc40014100001000000000000000000"
    "000000000000ffda0008010100013f213fffd03fffd13fffd23fffda000c03010002"
    "00030000001003ffc4001610000003000000000000000000000000000041a1ffda00"
    "08010300013f104a21ffc4001610000003000000000000000000000000000001f0ff"
    "da0008010200013f104c87ffc4001610000003000000000000000000000000000021"
    "31ffda0008010100013f1044c7ffd044c7ffd144c7ffd244c7ffd9"
)


def test_progressive_pinned_fixture_exact_golden():
    out = decode_jpeg(bytes.fromhex(PROG_FIXTURE_HEX))
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    assert hashlib.md5(out.tobytes()).hexdigest() == GOLDEN_MD5
    assert out[0, 0].tolist() == [42, 208, 66]
    assert out[15, 15].tolist() == [127, 138, 160]
    assert out[7, 8].tolist() == [89, 175, 110]


def test_progressive_equals_baseline_444_420_grey():
    from jpeg_ref import encode_jpeg_progressive

    yy, xx = np.mgrid[0:16, 0:16]
    rgb = np.stack(
        [40 + 6 * xx, 210 - 5 * yy, 60 + 3 * xx + 4 * yy], axis=2
    ).astype(np.uint8)
    for kw in ({}, {"subsample": True}):
        base = decode_jpeg(encode_jpeg(rgb, quant=4, **kw))
        prog = decode_jpeg(encode_jpeg_progressive(rgb, quant=4, **kw))
        assert np.array_equal(base, prog), kw
    g = ((yy * 2 + xx * 3) % 200 + 20).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quant=2)),
        decode_jpeg(encode_jpeg_progressive(g, quant=2)),
    )


def test_progressive_equals_baseline_randomized():
    # sizes/sampling/quant/restart sweep — EOB runs, ZRL-in-refinement,
    # correction bits, multi-segment restarts all hit across the grid
    from jpeg_ref import encode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(7)
    for _ in range(8):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        grey = bool(rng.integers(0, 2))
        sub = (not grey) and bool(rng.integers(0, 2))
        quant = int(rng.integers(1, 30))
        ri = int(rng.choice([0, 1, 2, 5]))
        shape = (h, w) if grey else (h, w, 3)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(
            encode_jpeg(img, quant=quant, subsample=sub, restart_interval=ri)
        )
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quant=quant, subsample=sub, restart_interval=ri
            )
        )
        assert np.array_equal(base, prog), (h, w, grey, sub, quant, ri)


def test_progressive_flat_image_pure_eob_runs():
    # a flat image makes every AC scan one giant EOB run
    from jpeg_ref import encode_jpeg_progressive

    img = np.full((24, 40), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img, quant=16))
    assert np.unique(out).tolist() == [130]


def test_progressive_custom_scripts():
    from jpeg_ref import encode_jpeg, encode_jpeg_progressive

    yy, xx = np.mgrid[0:24, 0:24]
    g = ((yy * 7 + xx * 5) % 240).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g, quant=3))
    # single full-band AC pass, no successive approximation
    simple = [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
    assert np.array_equal(
        base, decode_jpeg(encode_jpeg_progressive(g, quant=3, script=simple))
    )
    # three spectral slices + a 2-level refinement ladder (DC refine
    # goes Al 2→1→0 one bit per scan)
    deep = [
        ([0], 0, 0, 0, 2),
        ([0], 1, 2, 0, 1),
        ([0], 3, 20, 0, 1),
        ([0], 21, 63, 0, 1),
        ([0], 0, 0, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    assert np.array_equal(
        base, decode_jpeg(encode_jpeg_progressive(g, quant=3, script=deep))
    )


def test_progressive_corrupt_streams_raise_value_error():
    from jpeg_ref import encode_jpeg_progressive

    yy, xx = np.mgrid[0:16, 0:16]
    g = ((yy + xx) % 200).astype(np.uint8)
    payload = bytearray(encode_jpeg_progressive(g, quant=4))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload[: len(payload) // 2]) )
    # a progressive DC scan claiming Se=63 is malformed
    i = bytes(payload).find(b"\xff\xda")
    bad = payload.copy()
    bad[i + 2 + 2 + 3] = 63  # Se byte of the first (DC) scan header
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_cmyk_direct_transform0():
    # r10: Adobe-inverted CMYK, transform 0 (direct). Flat 8x8 blocks →
    # DCT exact at quant=1 → the composite R = C'*K'/255 must be exact.
    from aces_spark.datapipe.multimodal import decode_jpeg
    from tests.jpeg_ref import encode_jpeg

    img = np.zeros((8, 8, 4), dtype=np.uint8)
    img[:, :, 0] = 200  # C' (inverted: high = little cyan ink)
    img[:, :, 1] = 100
    img[:, :, 2] = 50
    img[:, :, 3] = 230  # K'
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (8, 8, 3)
    want = [round(200 * 230 / 255), round(100 * 230 / 255), round(50 * 230 / 255)]
    assert out[0, 0].tolist() == want
    assert np.all(out == np.array(want, dtype=np.uint8))


def test_cmyk_ycck_transform2():
    from aces_spark.datapipe.multimodal import decode_jpeg
    from tests.jpeg_ref import encode_jpeg

    rng = np.random.RandomState(5)
    # blockwise-flat 16x16 so the DCT stays near-exact; moderate values
    img = np.repeat(
        np.repeat(rng.randint(40, 216, size=(2, 2, 4)), 8, axis=0), 8, axis=1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=1, adobe_transform=2))
    # reference: YCCK roundtrip loses ≤1/ulp through the matrices; the
    # composite against the direct-transform decode must agree within 2
    direct = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - direct.astype(int)).max() <= 2


def test_cmyk_unknown_transform_raises():
    from aces_spark.datapipe import multimodal as mm
    from tests.jpeg_ref import encode_jpeg

    img = np.full((8, 8, 4), 128, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quant=1))
    i = data.find(b"Adobe")
    data[i + 11] = 7  # bogus transform
    with pytest.raises(mm.DecodeNotAvailable, match="transform 7"):
        mm.decode_jpeg(bytes(data))
