"""Golden tests for the MP4/ISO-BMFF container metadata parser
(datapipe.multimodal.mp4_metadata) on hand-built fixtures — box walk,
64-bit largesize, version-1 headers, and the JVM gate behavior of
video_metadata."""

from __future__ import annotations

import struct

import pytest

from aces_spark.datapipe.multimodal import mp4_metadata, video_metadata


def box(fourcc: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def mvhd_v0(timescale: int, duration: int) -> bytes:
    return box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )


def mvhd_v1(timescale: int, duration: int) -> bytes:
    return box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", timescale)
        + struct.pack(">Q", duration)
        + b"\x00" * 80,
    )


def tkhd_v0(width: int, height: int) -> bytes:
    body = (
        b"\x00\x00\x00\x00"
        + b"\x00" * 20  # creation, modification, track_id, reserved, duration
        + b"\x00" * 8  # reserved
        + b"\x00" * 8  # layer, alt, volume, reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    return box(b"tkhd", body)


def trak(handler: bytes, codec: bytes, tkhd: bytes = b"") -> bytes:
    stsd = box(
        b"stsd",
        b"\x00\x00\x00\x00" + struct.pack(">I", 1) + box(codec, b"\x00" * 8),
    )
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + handler + b"\x00" * 12)
    mdhd = box(b"mdhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 1000, 5000))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", tkhd + mdia)


def mp4_bytes(mvhd: bytes, *traks: bytes, largesize_moov: bool = False) -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    moov = box(b"moov", mvhd + b"".join(traks), largesize=largesize_moov)
    return ftyp + box(b"mdat", b"\x00" * 32) + moov


def test_mp4_metadata_golden_v0():
    payload = mp4_bytes(
        mvhd_v0(600, 3000),  # 5.0 s
        trak(b"vide", b"avc1", tkhd_v0(640, 360)),
        trak(b"soun", b"mp4a"),
    )
    got = mp4_metadata(payload)
    assert got == {
        "brand": "isom",
        "timescale": 600,
        "duration_ms": 5000,
        "n_tracks": 2,
        "video_codec": "avc1",
        "audio_codec": "mp4a",
        "width": 640,
        "height": 360,
    }


def test_mp4_metadata_v1_and_largesize():
    payload = mp4_bytes(
        mvhd_v1(90000, 90000 * 7),
        trak(b"vide", b"hvc1", tkhd_v0(1920, 1080)),
        largesize_moov=True,
    )
    got = mp4_metadata(payload)
    assert got["duration_ms"] == 7000 and got["timescale"] == 90000
    assert got["video_codec"] == "hvc1" and (got["width"], got["height"]) == (1920, 1080)
    assert got["audio_codec"] is None and got["n_tracks"] == 1


def test_mp4_metadata_rejects_non_bmff_and_malformed():
    assert mp4_metadata(b"") is None
    assert mp4_metadata(b"\xff\xfb\x90\x00" * 8) is None  # MPEG audio sync
    assert mp4_metadata(b"RIFF" + b"\x00" * 28) is None
    # ftyp but no moov
    ftyp_only = box(b"ftyp", b"isom" + struct.pack(">I", 512))
    assert mp4_metadata(ftyp_only) is None
    # truncated moov: box size runs past the buffer -> walker stops, None
    good = mp4_bytes(mvhd_v0(600, 600), trak(b"vide", b"avc1"))
    assert mp4_metadata(good[: len(good) - 40]) is None
    # zero timescale is invalid
    assert mp4_metadata(mp4_bytes(mvhd_v0(0, 600))) is None


def test_video_metadata_gate_and_parse(spark):
    payload = mp4_bytes(
        mvhd_v0(1000, 2500), trak(b"vide", b"av01", tkhd_v0(320, 240))
    )
    rows = [
        (1, bytearray(payload)),
        (2, bytearray(b"just some text, definitely not a container")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in video_metadata(df).collect()}
    # gate admits ONLY the ftyp payload; text and null rows never cross
    assert set(got) == {1}
    r = got[1]
    assert (r["brand"], r["container_duration_ms"], r["n_tracks"]) == ("isom", 2500, 1)
    assert (r["video_codec"], r["width"], r["height"]) == ("av01", 320, 240)


def test_video_metadata_gate_pass_parse_fail_yields_nulls(spark):
    # claims ftyp but the moov is garbage -> row survives with null fields
    bogus = box(b"ftyp", b"isom" + struct.pack(">I", 0)) + b"\x00\x01\x02"
    df = spark.createDataFrame([(7, bytearray(bogus))], "media_id long, payload binary")
    got = video_metadata(df).collect()
    assert len(got) == 1 and got[0]["media_id"] == 7
    assert got[0]["brand"] is None and got[0]["container_duration_ms"] is None
