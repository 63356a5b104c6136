"""WebM / Matroska (EBML) header sniff — the r13 companion to
functions/mp4codec.py, built from the public Matroska/EBML specification
(RFC 8794 for EBML framing, the matroska.org element registry for IDs).

Header cost only: DocType, per-track codec IDs, video dimensions, audio
rate/channels, and the Segment-Info duration come from the element tree's
metadata branches; Cluster payloads (the media data, ~all of the file) are
skipped via their declared sizes, never read. Same scope rationale as
MP3/lossy-VP8 (SURVEY §2.7): VP8/VP9/Opus PAYLOAD decode needs constant
tables that can't be verifiably re-derived, so inventory stops at the
container — which is exactly what a corpus survey needs.

Hostile-input discipline (the mp4 _iter_boxes rule): every vint length is
bounds-checked, walks are budgeted, unknown-size elements (legal for
Segment in live captures, RFC 8794 §6.2) terminate the sibling walk
instead of trusting a length, and malformed input classifies to None —
never raises, fuzz-tested under truncation and byte flips.
"""

from __future__ import annotations

import struct

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_MAX_ELEMENTS = 4096  # walk budget across all levels

# element IDs (marker bit retained, per EBML convention)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_DOCTYPE = 0x4282

_UNKNOWN = object()  # sentinel: element declared with unknown size


def _vint(b: bytes, i: int, mask_marker: bool):
    """(value, n_bytes) for the EBML variable-length int at i, or None.
    With mask_marker (size fields) the marker bit is cleared and the
    all-ones value means 'unknown size' → (_UNKNOWN, n)."""
    if i >= len(b) or b[i] == 0:
        return None
    n = 8 - b[i].bit_length() + 1
    if i + n > len(b):
        return None
    v = int.from_bytes(b[i : i + n], "big")
    if not mask_marker:
        return v, n
    marker = 1 << (7 * n)
    v -= marker
    if v == marker - 1:  # all value bits set
        return _UNKNOWN, n
    return v, n


def _iter_elements(b: bytes, start: int, end: int, budget: list[int]):
    """Yield (element_id, data_start, data_end) across [start, end). An
    unknown-size element extends to the parent's end and MUST be the last
    sibling (RFC 8794 §6.2) — yielded as such, then the walk stops. A
    malformed header classifies by ending the walk (sniff semantics: keep
    what parsed)."""
    i = start
    while i < end:
        if budget[0] <= 0:
            return
        budget[0] -= 1
        h = _vint(b, i, mask_marker=False)
        if h is None:
            return
        eid, idn = h
        s = _vint(b, i + idn, mask_marker=True)
        if s is None:
            return
        size, sn = s
        data = i + idn + sn
        if size is _UNKNOWN:
            yield eid, data, end
            return
        if data + size > end:
            return
        yield eid, data, data + size
        i = data + size


def _find_all(b, start, end, budget):
    return list(_iter_elements(b, start, end, budget))


def _uint(b: bytes, s: int, e: int) -> int | None:
    return int.from_bytes(b[s:e], "big") if 0 < e - s <= 8 else None


def _float(b: bytes, s: int, e: int) -> float | None:
    if e - s == 4:
        return struct.unpack(">f", b[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", b[s:e])[0]
    return None


def _checked_dim(v) -> int | None:
    return int(v) if v is not None and 0 < v <= 0x7FFFFFFF else None


def is_webm(content: bytes) -> bool:
    return len(content) >= 4 and content[:4] == _EBML_MAGIC


def sniff_webm_meta(content: bytes) -> dict | None:
    """video_meta-schema inventory row for an EBML/Matroska/WebM payload:
    format 'webm'|'matroska' (DocType; 'ebml' if absent), dims + fps
    (1e9 / the first video track's DefaultDuration — NULL when the track
    doesn't declare one, never an estimate) + codec from the first video
    track, duration from Segment>Info (Duration × TimestampScale),
    n_tracks counted over TrackEntry elements. n_frames is always NULL
    (counting them means walking every Cluster — not header cost).
    Returns None for non-EBML payloads; never raises."""
    try:
        b = content or b""
        if not is_webm(b):
            return None
        budget = [_MAX_ELEMENTS]
        doctype = None
        duration = None
        tscale = 1_000_000  # EBML default: 1 ms
        n_tracks = 0
        width = height = codec = fps = None
        aud_rate = aud_ch = None
        for eid, s, e in _find_all(b, 0, len(b), budget):
            if eid == int.from_bytes(_EBML_MAGIC, "big"):
                for hid, hs, he in _iter_elements(b, s, e, budget):
                    if hid == _DOCTYPE:
                        doctype = (
                            b[hs:he].split(b"\x00")[0].decode("ascii", "replace")
                            or None
                        )
            elif eid == _SEGMENT:
                for sid, ss, se in _iter_elements(b, s, e, budget):
                    if sid == _INFO:
                        raw_dur = None
                        for iid, is_, ie in _iter_elements(b, ss, se, budget):
                            if iid == _TIMESTAMP_SCALE:
                                tscale = _uint(b, is_, ie) or tscale
                            elif iid == _DURATION:
                                raw_dur = _float(b, is_, ie)
                        if raw_dur is not None and raw_dur >= 0:
                            duration = round(raw_dur * tscale / 1e9, 6)
                    elif sid == _TRACKS:
                        for tid, ts, te in _iter_elements(b, ss, se, budget):
                            if tid != _TRACK_ENTRY:
                                continue
                            n_tracks += 1
                            ttype = None
                            tcodec = ddur = None
                            vdims = adims = None
                            for fid, fs, fe in _iter_elements(
                                b, ts, te, budget
                            ):
                                if fid == _TRACK_TYPE:
                                    ttype = _uint(b, fs, fe)
                                elif fid == _CODEC_ID:
                                    tcodec = (
                                        b[fs:fe]
                                        .split(b"\x00")[0]
                                        .decode("ascii", "replace")
                                    )
                                elif fid == _DEFAULT_DURATION:
                                    ddur = _uint(b, fs, fe)
                                elif fid == _VIDEO:
                                    w = h = None
                                    for vid, vs, ve in _iter_elements(
                                        b, fs, fe, budget
                                    ):
                                        if vid == _PIXEL_WIDTH:
                                            w = _uint(b, vs, ve)
                                        elif vid == _PIXEL_HEIGHT:
                                            h = _uint(b, vs, ve)
                                    vdims = (w, h)
                                elif fid == _AUDIO:
                                    r = c = None
                                    for aid, as_, ae in _iter_elements(
                                        b, fs, fe, budget
                                    ):
                                        if aid == _SAMPLING_FREQ:
                                            r = _float(b, as_, ae)
                                        elif aid == _CHANNELS:
                                            c = _uint(b, as_, ae)
                                    adims = (r, c)
                            if ttype == 1 and width is None and vdims:
                                width = _checked_dim(vdims[0])
                                height = _checked_dim(vdims[1])
                                codec = tcodec or codec
                                if ddur and 0 < ddur <= 10**10:
                                    fps = round(1e9 / ddur, 6)
                            elif ttype == 2 and aud_rate is None and adims:
                                aud_rate, aud_ch = adims
                                if codec is None and width is None:
                                    codec = tcodec
        return {
            "format": {"webm": "webm", "matroska": "matroska"}.get(
                doctype, doctype or "ebml"
            ),
            "width": width,
            "height": height,
            "fps": fps,
            "colorspace": None,
            "n_frames": None,
            "duration_sec": duration,
            "codec": codec,
            "n_tracks": n_tracks,
            "brand": doctype,
            # carried for sniff_webm_audio_meta (not part of the video
            # schema): the first audio track's parameters + video presence
            "_audio_rate": aud_rate,
            "_audio_channels": aud_ch,
            "_has_video": width is not None,
        }
    except Exception:
        return None


def sniff_webm_audio_meta(content: bytes) -> dict | None:
    """audio_meta-schema row for an AUDIO-ONLY WebM/Matroska payload
    (.weba / .mka — Opus/Vorbis in an EBML container is how browsers
    record audio). Muxed audio+video files return None here: they belong
    to the video inventory, and double-counting a payload in both
    inventories would corrupt corpus stats. format 'webm-audio'; bits is
    NULL (lossy codecs have no fixed width — the MP3 rule)."""
    m = sniff_webm_meta(content)
    if m is None or m["_has_video"] or m["_audio_rate"] is None:
        return None
    rate = m["_audio_rate"]
    if not 0 < rate <= 0x7FFFFFFF:
        return None
    return {
        "format": "webm-audio",
        "format_tag": None,
        "n_channels": m["_audio_channels"],
        "sample_rate": int(rate),
        "bits": None,
        "data_bytes": None,
        "duration_sec": m["duration_sec"],
    }
