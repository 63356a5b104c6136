"""Pure-numpy YUV4MPEG2 (.y4m) micro-parser for the multimodal video
path — the video counterpart of functions/audiocodec.py (WAV) and
functions/imagecodec.py / jpegcodec.py (images), built from the public
yuv4mpeg stream layout only (no ffmpeg in this container).

Y4M is the canonical UNCOMPRESSED video interchange format (what ffmpeg
and every codec test suite pipe): a plain-text stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> C<colorspace> ...\\n``) followed by
frames, each a ``FRAME...\\n`` marker plus raw planar YCbCr data. That
makes REAL frame extraction possible with zero dependencies: parse the
header, seek to frame N (fixed frame size — O(1) after the header walk),
reshape planes, upsample chroma, convert to RGB.

Scope: colorspaces C420 (any siting variant: 420jpeg/420mpeg2/420paldv —
siting differences are below feature granularity and are ignored), C422,
C444 and Cmono, 8-bit. Frame-level parameter changes (the spec allows
``FRAME`` headers to carry parameters) are tolerated but ignored.
Interlaced streams decode as stored (no deinterlacing). The YCbCr→RGB
transform is the same full-range JFIF matrix the JPEG decoder uses —
video-range (16-235) streams will show slightly compressed contrast,
which is below corpus-feature granularity (documented, not hidden).
Compressed containers are out of DECODE scope (a real pipeline decodes
those with ffmpeg upstream; this parser makes the codec-test-suite /
raw-dump corpus case work end-to-end) — but MP4/ISO-BMFF files DO get a
header-cost inventory row via functions/mp4codec.sniff_mp4_meta (r11),
unified with this parser's output in operators/multimodal.video_meta.

Bomb-bound discipline matches the image codecs: per-frame decoded size is
checked against the header BEFORE allocation; malformed input raises
ValueError (a classification outcome), never MemoryError.
"""

from __future__ import annotations

import numpy as np

from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

Y4M_MAGIC = b"YUV4MPEG2"

# a stream header or frame header line is a handful of short parameters;
# a "header" that runs for a megabyte without its newline is hostile
_MAX_HEADER_LINE = 4096

# frame-count walks are O(n_frames) header probes; bound them so a
# crafted stream of millions of zero-data frames can't spin the sniffer
_MAX_FRAMES = 1_000_000

# The frame decode holds ~4 float32 copies of the image (Y, upsampled
# Cb/Cr, the RGB stack) ≈ 16 bytes of working memory per output byte —
# the jpegcodec.MAX_JPEG_PIXEL_BYTES lesson applied here: bound the
# OUTPUT at MAX_DECODED_BYTES/8 so a bound-passing header can't OOM an
# executor through the intermediates (review finding r10).
MAX_Y4M_FRAME_BYTES = MAX_DECODED_BYTES >> 3


def is_y4m(content: bytes) -> bool:
    return bool(content) and content[: len(Y4M_MAGIC)] == Y4M_MAGIC


# the EXACT 8-bit 3-plane (or mono) colorspaces this parser understands.
# Never prefix-match: C420p10/C444p10/C444alpha etc. are wider samples or
# extra planes — prefix acceptance would misparse their bytes as 8-bit
# pixels and fabricate features (review finding r10), the exact
# "never reinterpret" failure the audio parser's contract forbids.
_COLORSPACES_420 = {"420", "420jpeg", "420mpeg2", "420paldv"}
_COLORSPACES = _COLORSPACES_420 | {"422", "444", "mono"}


def _chroma_geometry(colorspace: str, w: int, h: int) -> tuple[int, int]:
    """(chroma_w, chroma_h) per colorspace; (0, 0) for mono. Subsampled
    dimensions require even source dimensions (the spec's constraint —
    an odd-width 420 stream has no well-defined chroma plane)."""
    if colorspace not in _COLORSPACES:
        raise ValueError(f"unsupported y4m colorspace C{colorspace}")
    if colorspace in _COLORSPACES_420:
        if w % 2 or h % 2:
            raise ValueError("4:2:0 y4m requires even width and height")
        return w // 2, h // 2
    if colorspace == "422":
        if w % 2:
            raise ValueError("4:2:2 y4m requires even width")
        return w // 2, h
    if colorspace == "444":
        return w, h
    return 0, 0  # mono


def parse_y4m_header(content: bytes) -> tuple[dict, int]:
    """Parse the stream header. Returns (params, offset_past_newline).

    params: width, height, fps (float; 0.0 when F is absent/degenerate),
    fps_num/fps_den, colorspace (default '420jpeg' per the spec's common
    practice), interlace (char or '').
    """
    if not is_y4m(content):
        raise ValueError("not a YUV4MPEG2 stream: bad magic")
    nl = content.find(b"\n", 0, _MAX_HEADER_LINE)
    if nl < 0:
        raise ValueError("y4m stream header missing its newline")
    fields = content[len(Y4M_MAGIC) : nl].split(b" ")
    params: dict = {
        "width": None,
        "height": None,
        "fps_num": 0,
        "fps_den": 1,
        "colorspace": "420jpeg",
        "interlace": "",
    }
    for f in fields:
        if not f:
            continue
        tag, val = f[:1], f[1:]
        try:
            if tag == b"W":
                params["width"] = int(val)
            elif tag == b"H":
                params["height"] = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                params["fps_num"], params["fps_den"] = int(num), int(den)
            elif tag == b"C":
                params["colorspace"] = val.decode("ascii")
            elif tag == b"I":
                params["interlace"] = val.decode("ascii")
            # A (aspect) and X (metadata) are tolerated and ignored
        except (ValueError, UnicodeDecodeError) as e:
            raise ValueError(f"bad y4m header field {f!r}") from e
    w, h = params["width"], params["height"]
    if not w or not h or w < 0 or h < 0:
        raise ValueError("y4m header missing or invalid W/H")
    if h * w * 3 > MAX_Y4M_FRAME_BYTES:
        raise ValueError(
            f"y4m frame size {h}x{w} exceeds the "
            f"{MAX_Y4M_FRAME_BYTES >> 20} MB micro-parser bound "
            "(sized for the float32 working-set multiplier)"
        )
    # validates the colorspace and the even-dimension constraints early
    _chroma_geometry(params["colorspace"], w, h)
    params["fps"] = (
        params["fps_num"] / params["fps_den"] if params["fps_den"] else 0.0
    )
    return params, nl + 1


def _frame_bytes(params: dict) -> int:
    w, h = params["width"], params["height"]
    cw, ch = _chroma_geometry(params["colorspace"], w, h)
    return w * h + 2 * cw * ch


def iter_y4m_frames(content: bytes):
    """Yield (frame_index, data_offset) for each complete frame. Walks
    only the FRAME marker lines — O(n_frames) header probes, no pixel
    reads. Raises ValueError on a malformed marker; a final frame whose
    data is truncated is NOT yielded (classify-don't-crash: trailing
    garbage ends the stream). A stream with more frames than the
    _MAX_FRAMES walk bound raises like the parser's other bounds —
    silently stopping would report a truncated n_frames/duration as if it
    were complete (advice finding r10)."""
    params, pos = parse_y4m_header(content)
    fsize = _frame_bytes(params)
    n = len(content)
    i = 0
    while pos < n:
        if i >= _MAX_FRAMES:
            raise ValueError(
                "y4m stream exceeds the frame-count walk bound"
            )
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m frame marker desync")
        nl = content.find(b"\n", pos, pos + _MAX_HEADER_LINE)
        if nl < 0:
            raise ValueError("y4m frame header missing its newline")
        data_off = nl + 1
        if data_off + fsize > n:
            return  # truncated final frame: stream ends here
        yield i, data_off
        pos = data_off + fsize
        i += 1


def y4m_frame_count(content: bytes) -> int:
    return sum(1 for _ in iter_y4m_frames(content))


def decode_y4m_frame_at(content: bytes, params: dict, data_off: int) -> np.ndarray:
    """Decode ONE frame whose planar data starts at ``data_off`` (an
    offset produced by iter_y4m_frames under the same ``params``) — O(1),
    no re-walk: the per-frame path for samplers iterating many frames of
    one stream. float32 intermediates (see MAX_Y4M_FRAME_BYTES)."""
    w, h = params["width"], params["height"]
    cw, ch = _chroma_geometry(params["colorspace"], w, h)
    if data_off + w * h + 2 * cw * ch > len(content):
        raise ValueError("y4m frame data out of bounds")
    y = np.frombuffer(content, dtype=np.uint8, count=w * h, offset=data_off)
    y = y.reshape(h, w).astype(np.float32)
    if cw == 0:
        return y.astype(np.uint8)[:, :, None]
    cb = np.frombuffer(
        content, dtype=np.uint8, count=cw * ch, offset=data_off + w * h
    ).reshape(ch, cw).astype(np.float32)
    cr = np.frombuffer(
        content, dtype=np.uint8, count=cw * ch, offset=data_off + w * h + cw * ch
    ).reshape(ch, cw).astype(np.float32)
    cb = np.repeat(np.repeat(cb, h // ch, axis=0), w // cw, axis=1) - np.float32(128.0)
    cr = np.repeat(np.repeat(cr, h // ch, axis=0), w // cw, axis=1) - np.float32(128.0)
    rgb = np.stack(
        [
            y + np.float32(1.402) * cr,
            y - np.float32(0.344136) * cb - np.float32(0.714136) * cr,
            y + np.float32(1.772) * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_y4m_frame(content: bytes, frame_no: int) -> np.ndarray:
    """Decode frame ``frame_no`` to an (H, W, 3) uint8 RGB array
    ((H, W, 1) for Cmono). Chroma upsamples by sample replication;
    RGB via the full-range JFIF matrix (see the module docstring's
    video-range caveat). This convenience form walks the frame markers
    from the top — samplers decoding MANY frames of one stream should
    iterate iter_y4m_frames and call decode_y4m_frame_at per offset
    (O(1) per frame instead of O(frame_no))."""
    params, _ = parse_y4m_header(content)
    for i, data_off in iter_y4m_frames(content):
        if i == frame_no:
            return decode_y4m_frame_at(content, params, data_off)
    raise ValueError(f"y4m frame {frame_no} out of range")


def sniff_video_meta(content: bytes) -> dict | None:
    """(format, width, height, fps, colorspace, n_frames, duration_sec)
    from the stream + frame headers alone — no pixel reads (the frame
    walk seeks over fixed-size frame data). None for non-Y4M or malformed
    streams; never raises on arbitrary bytes (fuzz-tested), the
    sniff_image_meta / sniff_wav_meta contract."""
    try:
        params, _ = parse_y4m_header(content)
        n = y4m_frame_count(content)
    except Exception:
        return None
    fps = params["fps"]
    return {
        "format": "y4m",
        "width": params["width"],
        "height": params["height"],
        "fps": round(fps, 6),
        "colorspace": params["colorspace"],
        "n_frames": n,
        "duration_sec": round(n / fps, 6) if fps > 0 else None,
    }


def encode_y4m(
    frames: "list[np.ndarray]",
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "444",
) -> bytes:
    """Minimal Y4M writer — the test-fixture counterpart of the parser
    (the encode_png / encode_jpeg idiom). RGB (H, W, 3) frames convert
    via the same JFIF matrix the decoder inverts; (H, W, 1)/(H, W) frames
    write Cmono. 4:2:0 subsampling is box-average like encode_jpeg."""
    if not frames:
        raise ValueError("encode_y4m requires at least one frame")
    from vectrekker_spark.functions.jpegcodec import _rgb_to_ycbcr

    first = np.asarray(frames[0])
    if first.ndim == 2:
        first = first[:, :, None]
    h, w = first.shape[:2]
    mono = first.shape[2] == 1
    cs = "mono" if mono else colorspace
    _chroma_geometry(cs, w, h)  # validate up front
    out = bytearray(
        Y4M_MAGIC + f" W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n".encode()
    )
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.ndim == 2:
            fr = fr[:, :, None]
        if fr.shape[:2] != (h, w) or (fr.shape[2] == 1) != mono:
            raise ValueError("all y4m frames must share one geometry")
        out += b"FRAME\n"
        if mono:
            out += fr[:, :, 0].tobytes()
            continue
        y, cb, cr = _rgb_to_ycbcr(fr)
        if cs.startswith("420"):
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        elif cs.startswith("422"):
            cb = cb.reshape(h, w // 2, 2).mean(axis=2)
            cr = cr.reshape(h, w // 2, 2).mean(axis=2)
        for plane in (y, cb, cr):
            out += np.clip(np.round(plane), 0, 255).astype(np.uint8).tobytes()
    return bytes(out)
