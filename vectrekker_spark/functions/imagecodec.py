"""Pure-numpy image micro-decoders (PNG + binary PPM) for the multimodal
path.

The container ships no media library (PIL/ffmpeg absent), but stubbing the
decode entirely left the multimodal feature extraction exercising only the
byte-histogram stand-in (r7 verdict #7). These decoders are built from the
PUBLIC format specs alone — PNG (RFC 2083: chunk layout, zlib-compressed
scanlines, the five per-scanline filters) and Netpbm P6 — using only
stdlib zlib + numpy, so `extract_features` can run a REAL
decode→pixels→features pipeline end-to-end in any environment.

Scope (deliberately a micro-decoder, not a PIL replacement): 8-bit,
non-interlaced PNG in grayscale / gray+alpha / RGB / RGBA, and binary PPM
(P6, maxval 255); baseline sequential JPEG lives in the sibling
functions/jpegcodec.py and is routed through decode_image_array. Anything
else raises ValueError and callers fall back to the byte-histogram
stand-in. Real pipelines on a cluster with PIL installed never reach this
code — `decode_image` prefers the library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type → samples per pixel (spec §4.1.1)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Upper bound on DECODED size (scanlines incl. filter bytes). Decoding is
# bounded by this, never by what the compressed stream claims: a crafted
# ~1000:1 decompression-bomb IDAT must fail as a ValueError the callers
# classify, not as a MemoryError/OOM that kills the executor. 64 MB is far
# above any corpus-filtering feature fixture; a real pipeline decoding
# billboard-size assets uses PIL with its own limits.
MAX_DECODED_BYTES = 64 << 20


def is_png(content: bytes) -> bool:
    return bool(content) and content[:8] == PNG_MAGIC


def is_ppm(content: bytes) -> bool:
    return bool(content) and content[:2] == b"P6"


def decode_png(content: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to an (H, W, C) uint8 array."""
    if not is_png(content):
        raise ValueError("not a PNG: bad signature")
    pos, width, height, channels = 8, None, None, None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if width == 0 or height == 0:
                # the spec requires nonzero dimensions; a 0×N image would
                # also produce an empty pixel set whose feature histogram
                # divides by zero downstream
                raise ValueError("PNG with zero width or height")
            channels = _CHANNELS[color]
            if height * (width * channels + 1) > MAX_DECODED_BYTES:
                raise ValueError(
                    f"PNG decoded size {height}x{width}x{channels} exceeds "
                    f"the {MAX_DECODED_BYTES >> 20} MB micro-decoder bound"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    stride = width * channels
    expected = height * (stride + 1)
    # max_length bounds the ALLOCATION: a decompression bomb stops at
    # expected+1 bytes and fails the length check below as a plain
    # ValueError instead of exhausting executor memory
    raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG scanline data has wrong length")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        out[y] = _unfilter(f, line, prev, channels)
        prev = out[y]
    return out.reshape(height, width, channels)


def _unfilter(f: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse one PNG scanline filter (spec §6). `line` is filtered bytes,
    `prev` the RECONSTRUCTED previous scanline, `bpp` bytes per pixel.
    Filters 1/3/4 have a within-row dependency on the just-reconstructed
    left neighbor, so those run a per-byte loop; 0/2 vectorize."""
    if f == 0:  # None
        return line
    if f == 2:  # Up
        return (line.astype(np.int32) + prev).astype(np.uint8)
    rec = line.astype(np.int32)
    pv = prev.astype(np.int32)
    if f == 1:  # Sub
        for i in range(bpp, len(rec)):
            rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
    elif f == 3:  # Average
        for i in range(len(rec)):
            a = rec[i - bpp] if i >= bpp else 0
            rec[i] = (rec[i] + (a + pv[i]) // 2) & 0xFF
    elif f == 4:  # Paeth
        for i in range(len(rec)):
            a = rec[i - bpp] if i >= bpp else 0
            c = pv[i - bpp] if i >= bpp else 0
            b = pv[i]
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            rec[i] = (rec[i] + pred) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {f}")
    return rec.astype(np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) — the test-fixture
    counterpart of decode_png, so round-trip tests need no media library."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if h == 0 or w == 0:
        raise ValueError("PNG requires nonzero dimensions")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _ppm_header(
    content: bytes, n_tokens: int = 3, limit: int | None = None
) -> tuple[list[int], int]:
    """The ONE Netpbm header tokenizer (decode_ppm and sniff_image_meta
    both call it — two hand-rolled copies of the grammar would drift):
    ``n_tokens`` whitespace-separated integer tokens after the P6 magic,
    '#' comments running to end-of-line. Returns (tokens, offset just past
    the final token); raises ValueError on truncation or a non-digit
    token. ``limit`` bounds the scanned prefix for header sniffing."""
    data = content if limit is None else content[:limit]
    pos, tokens = 2, []
    while len(tokens) < n_tokens:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tok = data[start:pos]
        if not tok.isdigit():
            raise ValueError("non-numeric PPM header token")
        tokens.append(int(tok))
    return tokens, pos


def decode_ppm(content: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval ≤255) to an (H, W, 3) uint8 array.
    Header: P6 <w> <h> <maxval>; pixel data follows ONE whitespace."""
    if not is_ppm(content):
        raise ValueError("not a binary PPM: bad magic")
    tokens, pos = _ppm_header(content, 3)
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    if maxval <= 0:
        raise ValueError("PPM maxval must be positive")
    if w == 0 or h == 0:
        raise ValueError("PPM with zero width or height")
    need = w * h * 3
    if need + 1 > MAX_DECODED_BYTES:
        raise ValueError(
            f"PPM {h}x{w} exceeds the {MAX_DECODED_BYTES >> 20} MB "
            "micro-decoder bound"
        )
    data = content[pos : pos + need]
    if len(data) != need:
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if maxval == 255:
        return arr.copy()
    # Netpbm samples are fractions of maxval: rescale to [0,255] (rounded)
    # — without this a maxval-15 image's luminance collapses into bin 0
    return ((arr.astype(np.uint32) * 255 + maxval // 2) // maxval).clip(
        0, 255
    ).astype(np.uint8)


def decode_image_array(content: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 pixels for payloads the micro-decoders understand
    (PNG/PPM here, baseline + progressive JPEG via functions/jpegcodec.py,
    GIF via functions/gifcodec.py, uncompressed BMP via bmpcodec.py,
    lossless WebP via webpcodec.py); None for anything else — incl. lossy
    WebP, which stays sniff-only — (caller falls back to byte-level
    features). zlib.error (corrupt IDAT) and struct.error (truncated
    header) are classification outcomes here, same as ValueError — a
    malformed payload in a 100 TB corpus must fall back, never crash the
    batch."""
    try:
        if is_png(content):
            return decode_png(content)
        if is_ppm(content):
            return decode_ppm(content)
        from vectrekker_spark.functions import (  # noqa: PLC0415
            bmpcodec,
            gifcodec,
            jpegcodec,
            webpcodec,
        )

        if jpegcodec.is_jpeg(content):
            return jpegcodec.decode_jpeg(content)
        if gifcodec.is_gif(content):
            return gifcodec.decode_gif(content)
        if bmpcodec.is_bmp(content):
            return bmpcodec.decode_bmp(content)
        if webpcodec.is_webp(content):
            return webpcodec.decode_webp(content)
    except (ValueError, zlib.error, struct.error):
        return None
    return None


# ---------------------------------------------------------------------------
# Header sniffing — format + dimensions WITHOUT decoding. Pure struct reads
# of the public container specs, so a 100 TB mixed-media corpus can be
# inventoried (format mix, resolution distribution, aspect-ratio filters)
# at header cost instead of decode cost — and as the cheap first look
# even for the formats the micro-decoders CAN now pixel-decode.

# JPEG start-of-frame markers carrying dimensions (ITU T.81 §B.2.2):
# every SOFn except DHT (C4), JPG (C8), DAC (CC).
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
}
# markers with NO length field (T.81 §B.1.1.3): TEM, RSTn, SOI, EOI
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8), 0xD8, 0xD9}


# Marker-walk bound: headers (APPn/EXIF/SOF) precede the entropy-coded
# scan, and APPn segments cap at 64 KB each — 1 MB of prefix covers any
# sane header run, and it bounds the worst-case fill-byte walk (a hostile
# b'\xff\xd8' + gigabytes of 0xFF must not turn the header-cost inventory
# pass into an O(payload) one).
_JPEG_SCAN_LIMIT = 1 << 20


def _sniff_jpeg(b: bytes) -> dict | None:
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
        return None
    b = b[:_JPEG_SCAN_LIMIT]
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None  # marker desync: corrupt stream
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            # SOF payload: precision(1) height(2) width(2) (§B.2.2)
            if i + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return {"format": "jpeg", "width": w, "height": h}
        i += 2 + seg_len
    return None


def _checked(fmt: str, w: int, h: int) -> dict | None:
    """Reject dimensions no real image has and no int32 consumer can hold:
    a hostile PNG header carries up to 2^32-1 and a PPM digit token is
    unbounded — letting those through crashed the image_meta kernel's
    Int32 columns instead of yielding the contractual NULL. Stills carry
    the animation defaults (n_frames 1, is_animated False); the GIF/WebP
    branches override them."""
    if 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF:
        return {"format": fmt, "width": w, "height": h,
                "n_frames": 1, "is_animated": False}
    return None


def _png_actl_frames(b: bytes) -> int | None:
    """APNG frame count: the acTL chunk's num_frames field. The spec
    places acTL before IDAT, so the chunk walk is short and bounded; a
    plain PNG (no acTL) returns None and keeps the still defaults."""
    i = 8
    for _ in range(64):
        if i + 8 > len(b):
            return None
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        if typ == b"acTL":
            if i + 12 > len(b):
                return None
            n = int.from_bytes(b[i + 8 : i + 12], "big")
            return n if 0 < n <= 0x7FFFFFFF else None
        if typ in (b"IDAT", b"IEND"):
            return None
        i += 12 + ln
    return None


_MAX_GIF_BLOCKS = 1 << 20  # sub-block walk budget (hostile streams)


def _gif_frame_count(b: bytes) -> tuple[int | None, bool | None]:
    """(n_frames, is_animated) via the GIF89a block walk — image
    descriptors counted, extension/image sub-block chains SKIPPED by
    their length bytes (no LZW decode). Exact when the walk reaches the
    trailer (0x3B); a truncated/malformed stream reports (None, True) if
    ≥2 frames were already seen, else (None, None) — counts are exact or
    NULL, never a guess."""
    n_frames = 0
    i = 13  # header(6) + logical screen descriptor(7)
    if len(b) < 13:
        return None, None
    if b[10] & 0x80:  # global color table present
        i += 3 * (2 << (b[10] & 0x07))
    budget = _MAX_GIF_BLOCKS

    def skip_subblocks(j: int) -> int | None:
        nonlocal budget
        while j < len(b):
            if budget <= 0:
                return None
            budget -= 1
            size = b[j]
            if size == 0:
                return j + 1
            j += 1 + size
        return None

    while i < len(b) and budget > 0:
        budget -= 1
        block = b[i]
        if block == 0x3B:  # trailer: clean end — counts are exact
            return n_frames, n_frames > 1
        if block == 0x21:  # extension: label + sub-block chain
            nxt = skip_subblocks(i + 2)
        elif block == 0x2C:  # image descriptor
            if i + 10 > len(b):
                break
            j = i + 10
            if b[i + 9] & 0x80:  # local color table
                j += 3 * (2 << (b[i + 9] & 0x07))
            n_frames += 1
            nxt = skip_subblocks(j + 1)  # +1: LZW min-code byte
        else:
            break  # unknown block type: malformed
        if nxt is None:
            break
        i = nxt
    return (None, True) if n_frames >= 2 else (None, None)


_MAX_RIFF_CHUNKS = 1 << 16


def _webp_anmf_count(b: bytes) -> tuple[int | None, bool | None]:
    """(n_frames, is_animated) for a VP8X WebP: the RIFF chunk walk counts
    ANMF chunks (RFC 9649 §5.3 — payloads skipped by declared size). The
    VP8X animation flag alone decides is_animated; the count is exact
    only when the walk covers the whole declared RIFF payload."""
    animated = bool(b[20] & 0x02)
    if not animated:
        return 1, False
    riff_end = min(len(b), 8 + int.from_bytes(b[4:8], "little"))
    i, n = 12, 0
    for _ in range(_MAX_RIFF_CHUNKS):
        if i + 8 > riff_end:
            return (n, True) if i == riff_end else (None, True)
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if b[i : i + 4] == b"ANMF":
            n += 1
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None, True


def sniff_image_meta(content: bytes) -> dict | None:
    """(format, width, height, n_frames, is_animated) from container
    headers alone — no decode, bounded reads (the JPEG marker walk caps
    at 1 MB of prefix; GIF/WebP animation counts walk block/chunk
    LENGTHS, never pixel data). Returns
    None for anything unrecognized, truncated before its dimension fields,
    or carrying out-of-range dimensions; never raises on arbitrary bytes
    (fuzz-tested)."""
    b = content or b""
    try:
        if b.startswith(PNG_MAGIC) and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])  # RFC 2083 §4.1.1
            m = _checked("png", w, h)
            if m is not None:
                n = _png_actl_frames(b)  # APNG acTL, if any
                if n is not None:
                    m["n_frames"], m["is_animated"] = n, n > 1
            return m
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])  # GIF89a spec §18
            m = _checked("gif", w, h)
            if m is not None:
                m["n_frames"], m["is_animated"] = _gif_frame_count(b)
            return m
        if b[:2] == b"BM" and len(b) >= 22:
            # the DIB header size discriminates the two layouts: 12 =
            # BITMAPCOREHEADER (16-bit dims, ends at offset 22), else
            # BITMAPINFOHEADER-family (32-bit signed dims; negative
            # height = top-down row order)
            dib = struct.unpack("<I", b[14:18])[0]
            if dib == 12:
                w, h = struct.unpack("<HH", b[18:22])
            elif len(b) >= 26:
                w, h = struct.unpack("<ii", b[18:26])
            else:
                return None
            return _checked("bmp", w, abs(h))
        if b[:2] == b"P6":
            (w, h), _ = _ppm_header(b, 2, limit=4096)
            return _checked("ppm", w, h)
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
            # r11: WebP is a major share of any modern web scrape; the
            # three container flavors carry dims differently (RFC 9649)
            fourcc = b[12:16]
            if fourcc == b"VP8 ":
                # lossy: 3-byte frame tag, 3-byte sync 9D 01 2A, then
                # 14-bit width/height in little-endian u16s
                if b[23:26] != b"\x9d\x01\x2a":
                    return None
                w = struct.unpack("<H", b[26:28])[0] & 0x3FFF
                h = struct.unpack("<H", b[28:30])[0] & 0x3FFF
                return _checked("webp", w, h)
            if fourcc == b"VP8L":
                if b[20] != 0x2F:  # lossless signature byte
                    return None
                bits = struct.unpack("<I", b[21:25])[0]
                return _checked(
                    "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
                )
            if fourcc == b"VP8X":
                # extended: 24-bit little-endian canvas dims minus one
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                m = _checked("webp", w, h)
                if m is not None:
                    m["n_frames"], m["is_animated"] = _webp_anmf_count(b)
                return m
            return None
        m = _sniff_jpeg(b)
        return _checked("jpeg", m["width"], m["height"]) if m else None
    except Exception:
        return None
