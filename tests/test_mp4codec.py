"""MP4/ISO-BMFF header sniff tests (VERDICT r10 #3): fixtures are built by
the module's own minimal box writer from the public 14496-12 layout, so the
sniffer is checked against the spec, not against itself."""

from __future__ import annotations

import random
import struct
import time

import pytest

from vectrekker_spark.functions.mp4codec import (
    _MAX_BOXES,
    build_mp4,
    is_mp4,
    sniff_mp4_meta,
)


def test_basic_video_mp4():
    enc = build_mp4(
        brand="mp42", timescale=1000, duration=7500,
        tracks=[dict(handler="vide", width=1280, height=720, codec="avc1")],
    )
    assert is_mp4(enc)
    m = sniff_mp4_meta(enc)
    assert m["format"] == "mp4"
    assert m["brand"] == "mp42"
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["codec"] == "avc1"
    assert m["n_tracks"] == 1
    assert m["duration_sec"] == pytest.approx(7.5)
    # sample-table-only fields are NULL, never fabricated
    assert m["fps"] is None and m["n_frames"] is None and m["colorspace"] is None


def test_version1_boxes_and_largesize():
    enc = build_mp4(
        timescale=90000, duration=90000 * 3, mvhd_version=1,
        largesize_moov=True,
        tracks=[dict(handler="vide", width=1920, height=1080,
                     codec="hev1", tkhd_version=1)],
    )
    m = sniff_mp4_meta(enc)
    assert m["duration_sec"] == pytest.approx(3.0)
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["codec"] == "hev1"


def test_multi_track_audio_first_picks_video():
    enc = build_mp4(
        tracks=[
            dict(handler="soun", width=0, height=0, codec="mp4a"),
            dict(handler="vide", width=640, height=360, codec="av01"),
            dict(handler="vide", width=320, height=180, codec="avc1"),
        ],
    )
    m = sniff_mp4_meta(enc)
    assert m["n_tracks"] == 3
    # FIRST video track wins, audio fourcc never leaks into codec
    assert (m["width"], m["height"], m["codec"]) == (640, 360, "av01")


def test_no_moov_still_reports_brand():
    enc = build_mp4()
    moov_at = enc.index(b"moov") - 4
    headless = enc[:moov_at]
    m = sniff_mp4_meta(headless)
    assert m is not None and m["brand"] == "isom"
    assert m["duration_sec"] is None and m["n_tracks"] == 0


def test_hostile_values_bounded():
    # zero timescale: no division, duration stays NULL
    enc = build_mp4(timescale=0, duration=100)
    assert sniff_mp4_meta(enc)["duration_sec"] is None
    # absurd 16.16 dimensions (top bit set) must not reach Int32 columns
    enc = bytearray(build_mp4(tracks=[dict(handler="vide", width=0x9000,
                                           height=0x9000, codec="avc1")]))
    m = sniff_mp4_meta(bytes(enc))
    assert m["width"] is None or m["width"] <= 0x7FFFFFFF
    # a box claiming to be larger than the payload classifies to None:
    # a walk silently stopped at corruption must not present a partial
    # inventory row as complete (ADVICE r11)
    enc = bytearray(build_mp4())
    struct.pack_into(">I", enc, enc.index(b"moov") - 4, 1 << 30)
    assert sniff_mp4_meta(bytes(enc)) is None


def test_stts_sample_table_exact_fps_and_frames():
    # 300 frames at 1001/30000 s each (NTSC 29.97): stts + mdhd → exact
    enc = build_mp4(tracks=[dict(
        handler="vide", width=1280, height=720, codec="avc1",
        media_timescale=30000, stts=[(300, 1001)],
    )])
    m = sniff_mp4_meta(enc)
    assert m["n_frames"] == 300
    assert m["fps"] == pytest.approx(30000 / 1001, abs=1e-6)

    # variable frame durations: fps is the exact average over total ticks
    enc = build_mp4(tracks=[dict(
        handler="vide", width=640, height=360, codec="av01",
        media_timescale=1000, stts=[(100, 40), (50, 20)],  # 4.0s + 1.0s
    )])
    m = sniff_mp4_meta(enc)
    assert m["n_frames"] == 150
    assert m["fps"] == pytest.approx(150 / 5.0)

    # empty stts: zero samples → NULLs, not a zero-division crash
    enc = build_mp4(tracks=[dict(
        handler="vide", width=64, height=64, codec="avc1",
        media_timescale=1000, stts=[],
    )])
    m = sniff_mp4_meta(enc)
    assert m["n_frames"] is None and m["fps"] is None


def test_stsz_fallback_and_no_mdhd_no_fps():
    # stsz-only track: n_frames from the sample count, fps stays NULL
    enc = build_mp4(tracks=[dict(
        handler="vide", width=320, height=240, codec="vp09", stsz_count=48,
    )])
    m = sniff_mp4_meta(enc)
    assert m["n_frames"] == 48 and m["fps"] is None


def test_truncated_sample_table_is_none_not_partial():
    # stts claiming more entries than its box holds: the whole payload
    # classifies to None (partial sample counts must not masquerade as
    # complete — the _iter_boxes rule applied to leaf tables)
    enc = bytearray(build_mp4(tracks=[dict(
        handler="vide", width=64, height=64, codec="avc1",
        media_timescale=1000, stts=[(10, 40)],
    )]))
    at = bytes(enc).index(b"stts") + 8  # entry_count field
    struct.pack_into(">I", enc, at, 1000)
    assert sniff_mp4_meta(bytes(enc)) is None
    # hostile giant-but-consistent count is budget-classified, not O(claim)
    struct.pack_into(">I", enc, at, 0xFFFFFFFF)
    assert sniff_mp4_meta(bytes(enc)) is None


def test_sample_table_fuzz_never_raises():
    enc = build_mp4(tracks=[dict(
        handler="vide", width=64, height=64, codec="avc1",
        media_timescale=30000, stts=[(24, 1001), (6, 2002)], stsz_count=30,
    )])
    assert sniff_mp4_meta(enc)["n_frames"] == 30  # stts wins over stsz
    for cut in range(0, len(enc)):
        sniff_mp4_meta(enc[:cut])
    for i in range(len(enc)):
        m = bytearray(enc)
        m[i] ^= 0xFF
        sniff_mp4_meta(bytes(m))


def test_corrupt_mid_moov_is_none_not_partial():
    # two video tracks; corrupt the SECOND trak's size field. The old walk
    # stopped silently -> a row with n_tracks=1 masquerading as complete;
    # the contract now classifies the payload to None (ADVICE r11).
    enc = build_mp4(tracks=[
        dict(handler="vide", width=640, height=360, codec="avc1"),
        dict(handler="vide", width=320, height=180, codec="hev1"),
    ])
    assert sniff_mp4_meta(enc)["n_tracks"] == 2
    second = enc.index(b"trak", enc.index(b"trak") + 4)
    bad = bytearray(enc)
    struct.pack_into(">I", bad, second - 4, 1 << 30)  # overruns moov bound
    assert sniff_mp4_meta(bytes(bad)) is None
    struct.pack_into(">I", bad, second - 4, 3)  # < header size
    assert sniff_mp4_meta(bytes(bad)) is None


def test_prefix_read_of_streaming_layout_still_classifies():
    # header-only reads of real files (ftyp+moov up front, huge mdat
    # truncated) must still produce a complete row: _find stops at moov
    # before the oversized trailing mdat is ever visited
    enc = build_mp4() + struct.pack(">I", 1 << 30) + b"mdat" + b"\x00" * 64
    m = sniff_mp4_meta(enc)
    assert m is not None and m["n_tracks"] == 1 and m["width"] == 640


def test_never_raises_and_walk_is_bounded():
    rng = random.Random(5)
    for _ in range(300):
        sniff_mp4_meta(bytes(rng.randrange(256) for _ in range(rng.randrange(64))))
    enc = build_mp4()
    for cut in range(0, len(enc)):
        sniff_mp4_meta(enc[:cut])
    for i in range(len(enc)):
        m = bytearray(enc)
        m[i] ^= 0xFF
        sniff_mp4_meta(bytes(m))
    # box-count bomb: millions of 8-byte free boxes inside moov
    bomb = (
        build_mp4()[: 8 + 16]  # keep ftyp
        + struct.pack(">I", 8 + 8 * 500_000) + b"moov"
        + (struct.pack(">I", 8) + b"free") * 500_000
    )
    t0 = time.time()
    sniff_mp4_meta(bomb)
    assert time.time() - t0 < 1.0  # _MAX_BOXES cap, not O(payload)
    assert _MAX_BOXES < 500_000


def test_video_meta_operator_unifies_y4m_and_mp4(spark):
    import numpy as np

    from vectrekker_spark.functions.videocodec import encode_y4m
    from vectrekker_spark.operators.multimodal import video_meta

    y4m = encode_y4m([np.zeros((4, 6, 3), dtype=np.uint8)] * 2, fps=(25, 1))
    mp4 = build_mp4(
        brand="isom", timescale=600, duration=1200,
        tracks=[dict(handler="vide", width=320, height=240, codec="avc1")],
    )
    df = spark.createDataFrame(
        [(1, y4m), (2, mp4), (3, b"not video"), (4, None)],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in video_meta(df).collect()}
    assert rows[1].vid_format == "y4m" and rows[1].vid_codec == "rawvideo"
    assert rows[1].vid_frames == 2 and rows[1].vid_tracks == 1
    assert rows[2].vid_format == "mp4" and rows[2].vid_brand == "isom"
    assert (rows[2].vid_width, rows[2].vid_height) == (320, 240)
    assert rows[2].vid_duration == pytest.approx(2.0)
    assert rows[2].vid_fps is None and rows[2].vid_frames is None
    assert rows[3].vid_format is None
    assert rows[4].vid_format is None


def test_budget_exhaustion_classifies_not_truncates():
    """Review r11: hitting _MAX_BOXES mid-moov must classify the payload
    to None — a partial n_tracks (or a missed video trak's dims) reported
    as a complete row is the Y4M silent-truncation defect again."""
    import struct as _s

    from vectrekker_spark.functions.mp4codec import _MAX_BOXES

    filler = (_s.pack(">I", 8) + b"free") * (_MAX_BOXES + 10)
    body = build_mp4(tracks=[dict(handler="vide", width=640, height=360,
                                  codec="avc1")])
    # rebuild: ftyp + moov(mvhd + filler + trak) so the trak sits PAST the
    # budget — a silent-truncation bug would report n_tracks=0 "complete"
    ftyp_end = 16
    moov_at = body.index(b"moov") - 4
    moov_len = _s.unpack(">I", body[moov_at : moov_at + 4])[0]
    moov_payload = body[moov_at + 8 : moov_at + moov_len]
    mvhd_len = _s.unpack(">I", moov_payload[:4])[0]
    new_payload = moov_payload[:mvhd_len] + filler + moov_payload[mvhd_len:]
    bomb = (
        body[:ftyp_end]
        + _s.pack(">I", 8 + len(new_payload)) + b"moov" + new_payload
    )
    assert sniff_mp4_meta(bomb) is None

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
