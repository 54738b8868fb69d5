"""MPEG audio frame-header metadata tests (r10 — VERDICT r9 ask #7).

Fixtures are hand-assembled frame headers (independent of the parser's
tables): sync/version/layer/bitrate-index/samplerate-index bits packed
per ISO 11172-3, with durations computed from first principles.
"""

from __future__ import annotations

import numpy as np

from aces_spark.datapipe.multimodal import audio_metadata, mp3_metadata


def _frames_cbr_v1l3(n, kbps_idx=9, pad=0):
    # MPEG1 Layer III, 44100 Hz, stereo, 128 kbps (index 9), no CRC
    header = bytes([0xFF, 0xFB, (kbps_idx << 4) | (pad << 1), 0x00])
    frame_len = 144 * 128000 // 44100 + pad  # 417
    return (header + b"\x00" * (frame_len - 4)) * n


def test_cbr_mpeg1_layer3():
    data = _frames_cbr_v1l3(10)
    meta = mp3_metadata(data)
    assert meta is not None
    assert meta["version"] == "1" and meta["layer"] == 3
    assert meta["bitrate_kbps"] == 128
    assert meta["sample_rate"] == 44100
    assert meta["channel_mode"] == "stereo"
    assert meta["vbr"] is False and meta["n_frames"] is None
    # 4170 audio bytes at 128 kbps: 4170*8/128000 s = 260.625 ms → 261
    assert meta["duration_ms"] == 261


def test_id3v2_and_id3v1_are_skipped():
    body = _frames_cbr_v1l3(10)
    id3v2 = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 100]) + b"\x00" * 100
    id3v1 = b"TAG" + b"\x00" * 125
    meta = mp3_metadata(id3v2 + body + id3v1)
    assert meta is not None
    assert meta["bitrate_kbps"] == 128
    assert meta["duration_ms"] == 261  # tags excluded from audio bytes


def test_xing_vbr_header():
    # single MPEG1 L3 stereo frame; Xing at 4 + 32 side-info bytes
    frame = bytearray(_frames_cbr_v1l3(1))
    at = 36
    frame[at : at + 4] = b"Xing"
    frame[at + 4 : at + 8] = (1).to_bytes(4, "big")  # FRAMES flag
    frame[at + 8 : at + 12] = (100).to_bytes(4, "big")
    meta = mp3_metadata(bytes(frame))
    assert meta["vbr"] is True and meta["n_frames"] == 100
    # 100 frames × 1152 samples / 44100 Hz = 2612.2 ms → 2612
    assert meta["duration_ms"] == 2612
    # average bitrate recomputed from bytes/duration: 417*8/2.612 ≈ 1.3
    assert meta["bitrate_kbps"] == 1


def test_info_tag_is_cbr():
    frame = bytearray(_frames_cbr_v1l3(1))
    frame[36:40] = b"Info"
    frame[40:44] = (1).to_bytes(4, "big")
    frame[44:48] = (10).to_bytes(4, "big")
    meta = mp3_metadata(bytes(frame))
    assert meta["vbr"] is False and meta["n_frames"] == 10


def test_vbri_header():
    frame = bytearray(_frames_cbr_v1l3(1))
    at = 36
    frame[at : at + 4] = b"VBRI"
    frame[at + 14 : at + 18] = (50).to_bytes(4, "big")
    meta = mp3_metadata(bytes(frame))
    assert meta["vbr"] is True and meta["n_frames"] == 50
    # 50 × 1152 / 44100 = 1306.1 ms → 1306
    assert meta["duration_ms"] == 1306


def test_mpeg2_mono_layer3():
    # MPEG2 (version bits 10) L3, 22050 Hz, mono, 64 kbps (index 8)
    header = bytes([0xFF, 0xF3, 0x80, 0xC0])
    frame_len = 72 * 64000 // 22050  # 208
    data = (header + b"\x00" * (frame_len - 4)) * 5
    meta = mp3_metadata(data)
    assert meta["version"] == "2" and meta["layer"] == 3
    assert meta["sample_rate"] == 22050 and meta["channel_mode"] == "mono"
    assert meta["bitrate_kbps"] == 64
    # 1040 bytes * 8 / 64000 = 130 ms
    assert meta["duration_ms"] == 130


def test_layer1_frame_length_rule():
    # MPEG1 Layer I, 48000 Hz, 224 kbps (index 7): slots of 4 bytes
    header = bytes([0xFF, 0xFF, 0x74, 0x00])
    frame_len = (12 * 224000 // 48000) * 4  # 224
    data = (header + b"\x00" * (frame_len - 4)) * 3
    meta = mp3_metadata(data)
    assert meta["layer"] == 1 and meta["sample_rate"] == 48000
    assert meta["bitrate_kbps"] == 224
    # 3 × 384 samples / 48000 = 24 ms; CBR estimate 672*8/224000 = 24 ms
    assert meta["duration_ms"] == 24


def test_false_sync_rejected():
    # 0xFF followed by a reserved version/layer combination, then noise
    assert mp3_metadata(b"\xff\xe9" + b"\x00" * 100) is None
    assert mp3_metadata(b"plain text payload") is None
    assert mp3_metadata(b"") is None
    assert mp3_metadata(None) is None


def test_sync_after_garbage_found():
    data = b"\x00garbage!" + _frames_cbr_v1l3(4)
    meta = mp3_metadata(data)
    assert meta is not None and meta["bitrate_kbps"] == 128


def test_audio_metadata_gate_and_parse(spark):
    mp3 = _frames_cbr_v1l3(10)
    rows = [
        (1, bytearray(mp3)),
        (2, bytearray(b"just some text payload")),
        (3, bytearray(b"ID3" + bytes(7) + b"no audio after the tag")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_metadata(media).collect()}
    # gate: row 2 (text) and row 4 (null) never reach Python
    assert set(got) == {1, 3}
    assert got[1]["bitrate_kbps"] == 128 and got[1]["duration_ms"] == 261
    assert got[1]["mpeg_version"] == "1" and got[1]["vbr"] is False
    # row 3 passes the ID3 gate but has no frame sync → null fields
    assert got[3]["bitrate_kbps"] is None and got[3]["duration_ms"] is None
