"""Y4M micro-parser tests (r10): REAL video frame extraction with no
media library, completing the multimodal triad (images: PNG/PPM/JPEG,
audio: WAV, video: Y4M). The writer is the fixture builder (encode_png /
encode_jpeg idiom); classification behavior mirrors the other sniffers."""

from __future__ import annotations

import numpy as np
import pytest

from vectrekker_spark.functions import videocodec as vc


def _frames(n=5, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [(yy * 8 + t * 10) % 256, (xx * 8) % 256, ((yy + xx) * 4 + t * 5) % 256],
            axis=2,
        ).astype(np.uint8)
        for t in range(n)
    ]


@pytest.mark.parametrize("cs,tol", [("444", 2), ("422", 5), ("420jpeg", 8)])
def test_roundtrip_all_colorspaces(cs, tol):
    frames = _frames()
    enc = vc.encode_y4m(frames, fps=(30, 1), colorspace=cs)
    assert vc.y4m_frame_count(enc) == 5
    for t, want in enumerate(frames):
        got = vc.decode_y4m_frame(enc, t)
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= tol


def test_mono_roundtrips_exactly():
    yy, xx = np.mgrid[0:24, 0:32]
    g = [((yy * 5 + t * 3) % 256).astype(np.uint8) for t in range(3)]
    enc = vc.encode_y4m(g, fps=(10, 1))
    assert vc.sniff_video_meta(enc)["colorspace"] == "mono"
    for t in range(3):
        got = vc.decode_y4m_frame(enc, t)
        assert got.shape == (24, 32, 1)
        assert np.array_equal(got[:, :, 0], g[t])  # Y plane is lossless


def test_sniff_meta_and_duration():
    enc = vc.encode_y4m(_frames(6), fps=(30, 1), colorspace="420jpeg")
    meta = vc.sniff_video_meta(enc)
    assert meta == {
        "format": "y4m",
        "width": 32,
        "height": 24,
        "fps": 30.0,
        "colorspace": "420jpeg",
        "n_frames": 6,
        "duration_sec": 0.2,
    }


def test_truncated_final_frame_ends_stream():
    enc = vc.encode_y4m(_frames(5))
    assert vc.y4m_frame_count(enc[:-200]) == 4
    with pytest.raises(ValueError, match="out of range"):
        vc.decode_y4m_frame(enc[:-200], 4)


def test_classification_contract():
    assert vc.sniff_video_meta(b"") is None
    assert vc.sniff_video_meta(b"random bytes") is None
    assert vc.sniff_video_meta(b"YUV4MPEG2 garbage\n") is None  # no W/H
    with pytest.raises(ValueError):
        vc.parse_y4m_header(b"YUV4MPEG2 W10 H10" + b" " * 5000)  # no newline
    # marker desync mid-stream raises (iter) but sniffs to None
    enc = bytearray(vc.encode_y4m(_frames(2)))
    i = enc.index(b"FRAME", 20)
    enc[i : i + 5] = b"FRAMX"
    with pytest.raises(ValueError, match="desync"):
        list(vc.iter_y4m_frames(bytes(enc)))
    assert vc.sniff_video_meta(bytes(enc)) is None


def test_fuzz_sniff_never_raises():
    rng = np.random.RandomState(3)
    base = vc.encode_y4m(_frames(2))
    for n in range(0, len(base), 11):
        vc.sniff_video_meta(base[:n])
    for i in range(0, len(base), 11):
        m = bytearray(base)
        m[i] ^= 0xFF
        vc.sniff_video_meta(bytes(m))
    for n in (0, 1, 8, 64):
        vc.sniff_video_meta(b"YUV4MPEG2" + bytes(rng.randint(0, 256, n, dtype=np.uint8).tolist()))


def test_bomb_bound_before_allocation():
    hdr = b"YUV4MPEG2 W99999 H99999 F25:1 C444\n"
    with pytest.raises(ValueError, match="micro-parser bound"):
        vc.parse_y4m_header(hdr)
    assert vc.sniff_video_meta(hdr) is None


def test_odd_dims_constraints():
    yy, xx = np.mgrid[0:9, 0:7]
    odd = [np.stack([yy * 20, xx * 30, yy + xx], axis=2).astype(np.uint8)]
    # 4:4:4 accepts odd dims; subsampled colorspaces refuse them
    enc = vc.encode_y4m(odd, colorspace="444")
    assert vc.decode_y4m_frame(enc, 0).shape == (9, 7, 3)
    with pytest.raises(ValueError, match="even"):
        vc.encode_y4m(odd, colorspace="420jpeg")


def test_video_frame_features_real_and_fallback(spark):
    from vectrekker_spark.operators.multimodal import video_frame_features

    frames = _frames(6)
    payloads = [
        (1, vc.encode_y4m(frames, fps=(30, 1), colorspace="420jpeg")),
        (2, b"\x00" * 4096),  # undecodable: byte-window fallback
        (3, None),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    rows = video_frame_features(df, every_n=2).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    # Y4M: frames 0, 2, 4 decoded for real
    vid = sorted(by_id[1], key=lambda r: r.frame_no)
    assert [r.frame_no for r in vid] == [0, 2, 4]
    assert all(r.decoded for r in vid)
    for r in vid:
        assert abs(sum(r.features) - 1.0) < 1e-9
    # the decoded histogram matches a direct decode of the same frame
    arr = vc.decode_y4m_frame(payloads[0][1], 2)
    lum = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    hist = np.bincount(
        np.minimum(lum.astype(np.int64) * 16 // 256, 15).ravel(), minlength=16
    ).astype(float)
    want = (hist / hist.sum()).tolist()
    got = next(r.features for r in vid if r.frame_no == 2)
    assert [round(x, 9) for x in got] == [round(x, 9) for x in want]
    # fallback: 4 byte-windows, every 2nd sampled, decoded=false
    fb = sorted(by_id[2], key=lambda r: r.frame_no)
    assert [r.frame_no for r in fb] == [0, 2] and not any(r.decoded for r in fb)
    assert 3 not in by_id  # NULL payload emits no rows


def test_video_meta_operator(spark):
    from vectrekker_spark.operators.multimodal import video_meta

    enc = vc.encode_y4m(_frames(4), fps=(20, 1), colorspace="444")
    df = spark.createDataFrame(
        [(1, enc), (2, b"junk"), (3, None)], "media_id long, content binary"
    )
    rows = {r.media_id: r for r in video_meta(df).collect()}
    r = rows[1]
    assert (r.vid_format, r.vid_width, r.vid_height) == ("y4m", 32, 24)
    assert (r.vid_fps, r.vid_colorspace, r.vid_frames, r.vid_duration) == (
        20.0, "444", 4, 0.2,
    )
    assert rows[2].vid_format is None and rows[3].vid_format is None
    with pytest.raises(ValueError, match="rename"):
        video_meta(df.withColumn("vid_fps", df.media_id))


def test_non_8bit_colorspaces_rejected_not_misparsed():
    """r10 review finding: prefix-matching colorspaces accepted C420p10/
    C444alpha and misparsed wide samples / extra planes as 8-bit pixels —
    fabricated features. Exact-set matching classifies them instead."""
    for cs in ("420p10", "422p10", "444p10", "444alpha", "420p12"):
        hdr = f"YUV4MPEG2 W4 H4 F25:1 C{cs}\n".encode() + b"FRAME\n" + b"\x00" * 64
        with pytest.raises(ValueError, match="unsupported y4m colorspace"):
            vc.parse_y4m_header(hdr)
        assert vc.sniff_video_meta(hdr) is None


def test_midstream_desync_classifies_whole_payload(spark):
    """r10 review finding: a Y4M with valid leading frames then a
    corrupted FRAME marker must NOT emit decoded=true rows for the early
    frames AND byte-fallback rows for the same payload — one payload,
    one classification."""
    from vectrekker_spark.operators.multimodal import video_frame_features

    enc = bytearray(vc.encode_y4m(_frames(4), colorspace="444"))
    # corrupt the THIRD frame marker (frames 0-1 decode fine up to there)
    i = enc.index(b"FRAME", enc.index(b"FRAME", enc.index(b"FRAME") + 5) + 5)
    enc[i : i + 5] = b"FRAMX"
    df = spark.createDataFrame(
        [(1, bytes(enc))], "media_id long, content binary"
    )
    rows = video_frame_features(df, every_n=1).collect()
    assert rows, "fallback rows expected"
    assert not any(r.decoded for r in rows), "no decoded rows may survive"
    frame_nos = [r.frame_no for r in rows]
    assert len(frame_nos) == len(set(frame_nos)), "no duplicate keys"


def test_y4m_bound_is_working_set_aware():
    from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

    assert vc.MAX_Y4M_FRAME_BYTES * 8 == MAX_DECODED_BYTES
    # W5592 H4000 C444 passed the old MAX_DECODED_BYTES bound but needs
    # ~1 GiB of decode intermediates; the working-set bound refuses it
    hdr = b"YUV4MPEG2 W5592 H4000 F25:1 C444\n"
    with pytest.raises(ValueError, match="micro-parser bound"):
        vc.parse_y4m_header(hdr)


def test_frame_walk_bound_raises_not_silently_clips(monkeypatch):
    """Advice r10: hitting _MAX_FRAMES must raise like the parser's other
    bounds — a silently clipped n_frames is indistinguishable from a
    complete inventory value. sniff_video_meta classifies it to None;
    a stream AT the bound still sniffs completely."""
    import vectrekker_spark.functions.videocodec as vc

    frames = [np.zeros((2, 2, 3), dtype=np.uint8)] * 4
    enc = vc.encode_y4m(frames)
    monkeypatch.setattr(vc, "_MAX_FRAMES", 3)
    with pytest.raises(ValueError, match="frame-count walk bound"):
        list(vc.iter_y4m_frames(enc))
    assert vc.sniff_video_meta(enc) is None  # classified, not clipped
    monkeypatch.setattr(vc, "_MAX_FRAMES", 4)
    m = vc.sniff_video_meta(enc)
    assert m is not None and m["n_frames"] == 4


# --- WebM / Matroska (EBML) sniff -------------------------------------------


def _esz(n):
    """EBML size vint (up to 2 bytes is plenty for fixtures)."""
    return bytes([0x80 | n]) if n < 0x7F else bytes([0x40 | (n >> 8), n & 0xFF])


def _el(eid, payload):
    return eid + _esz(len(payload)) + payload


def _u(n, width=None):
    width = width or max(1, (n.bit_length() + 7) // 8)
    return n.to_bytes(width, "big")


def _webm_bytes(duration_ms=2500.0, tscale=1_000_000, unknown_segment=False,
                doctype=b"webm"):
    import struct

    ebml_hdr = _el(b"\x1a\x45\xdf\xa3", _el(b"\x42\x82", doctype))
    info = _el(
        b"\x15\x49\xa9\x66",
        _el(b"\x2a\xd7\xb1", _u(tscale))
        + _el(b"\x44\x89", struct.pack(">f", duration_ms)),
    )
    video_track = _el(
        b"\xae",
        _el(b"\x83", _u(1))
        + _el(b"\x86", b"V_VP9")
        + _el(b"\x23\xe3\x83", _u(40_000_000))  # 25 fps
        + _el(b"\xe0", _el(b"\xb0", _u(320)) + _el(b"\xba", _u(240))),
    )
    audio_track = _el(
        b"\xae",
        _el(b"\x83", _u(2))
        + _el(b"\x86", b"A_OPUS")
        + _el(b"\xe1", _el(b"\xb5", struct.pack(">f", 48000.0))
              + _el(b"\x9f", _u(2))),
    )
    tracks = _el(b"\x16\x54\xae\x6b", video_track + audio_track)
    cluster = _el(b"\x1f\x43\xb6\x75", b"\xcc" * 500)  # media data: skipped
    seg_payload = info + tracks + cluster
    if unknown_segment:
        # unknown-size Segment (RFC 8794 §6.2): live-capture shape
        segment = b"\x18\x53\x80\x67" + b"\xff" + seg_payload
    else:
        segment = _el(b"\x18\x53\x80\x67", seg_payload)
    return ebml_hdr + segment


def test_sniff_webm_full_inventory():
    from vectrekker_spark.functions.webmcodec import sniff_webm_meta

    m = sniff_webm_meta(_webm_bytes())
    assert m["format"] == "webm" and m["brand"] == "webm"
    assert m["width"] == 320 and m["height"] == 240
    assert m["fps"] == 25.0 and m["codec"] == "V_VP9"
    assert m["n_tracks"] == 2
    assert m["duration_sec"] == pytest.approx(2.5)
    assert m["n_frames"] is None  # counting frames means reading Clusters


def test_sniff_webm_unknown_size_segment_and_matroska_doctype():
    from vectrekker_spark.functions.webmcodec import sniff_webm_meta

    m = sniff_webm_meta(_webm_bytes(unknown_segment=True))
    assert m["width"] == 320 and m["duration_sec"] == pytest.approx(2.5)
    m2 = sniff_webm_meta(_webm_bytes(doctype=b"matroska"))
    assert m2["format"] == "matroska" and m2["codec"] == "V_VP9"


def test_sniff_webm_hostile_never_raises():
    import random

    from vectrekker_spark.functions.webmcodec import sniff_webm_meta

    base = _webm_bytes()
    for cut in range(len(base)):
        r = sniff_webm_meta(base[:cut])
        assert r is None or isinstance(r, dict)
    rng = random.Random(31)
    for _ in range(500):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = sniff_webm_meta(bytes(b))
        assert r is None or isinstance(r, dict)
    assert sniff_webm_meta(b"") is None and sniff_webm_meta(None) is None


def test_video_meta_inventory_includes_webm(spark):
    from vectrekker_spark.operators.multimodal import video_meta

    df = spark.createDataFrame(
        [(1, _webm_bytes()), (2, b"\x1a\x45\xdf\xa3junk"), (3, None)],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in video_meta(df).collect()}
    assert rows[1].vid_format == "webm" and rows[1].vid_codec == "V_VP9"
    assert rows[1].vid_width == 320 and rows[1].vid_fps == 25.0
    assert rows[1].vid_tracks == 2
    # EBML magic + garbage: the header element never parses → 'ebml' shell
    # with NULL fields (classified, not invented)
    assert rows[2].vid_format in (None, "ebml")
    assert rows[3].vid_format is None


def test_webm_audio_only_routes_to_audio_meta():
    """.weba-shaped (audio-only) EBML payloads produce an audio inventory
    row; muxed audio+video files do NOT (no double counting)."""
    import struct

    from vectrekker_spark.functions.audiocodec import sniff_audio_meta
    from vectrekker_spark.functions.webmcodec import sniff_webm_audio_meta

    def esz(n):
        return bytes([0x80 | n]) if n < 0x7F else bytes(
            [0x40 | (n >> 8), n & 0xFF])

    def el(eid, payload):
        return eid + esz(len(payload)) + payload

    def u(n):
        return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")

    info = el(b"\x15\x49\xa9\x66",
              el(b"\x2a\xd7\xb1", u(1_000_000))
              + el(b"\x44\x89", struct.pack(">f", 3500.0)))
    atrack = el(b"\xae", el(b"\x83", u(2)) + el(b"\x86", b"A_OPUS")
                + el(b"\xe1", el(b"\xb5", struct.pack(">f", 48000.0))
                     + el(b"\x9f", u(1))))
    weba = (el(b"\x1a\x45\xdf\xa3", el(b"\x42\x82", b"webm"))
            + el(b"\x18\x53\x80\x67",
                 info + el(b"\x16\x54\xae\x6b", atrack)))
    m = sniff_webm_audio_meta(weba)
    assert m["format"] == "webm-audio" and m["sample_rate"] == 48000
    assert m["n_channels"] == 1 and m["duration_sec"] == pytest.approx(3.5)
    assert m["bits"] is None  # lossy: never faked
    assert sniff_audio_meta(weba)["format"] == "webm-audio"
    # muxed A+V: audio inventory refuses, video inventory owns it
    assert sniff_webm_audio_meta(_webm_bytes()) is None
    assert sniff_audio_meta(_webm_bytes()) is None

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
