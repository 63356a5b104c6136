"""Pure-numpy BMP micro-codec (decode + fixture encoder) — with GIF done
(r11), BMP was the last image format the inventory sniffer could size but
the feature path couldn't pixel-decode. Built from the PUBLIC Windows
bitmap layout only: BITMAPFILEHEADER (14 bytes, 'BM' + pixel-data offset),
BITMAPINFOHEADER (40+ bytes: dims, bpp, compression), color table for
paletted depths, rows padded to 4-byte boundaries, bottom-up unless the
height is negative.

Scope (micro-decoder):
- DECODE: uncompressed BI_RGB at 8 bpp (palette), 24 bpp (BGR) and
  32 bpp (BGRX — the fourth byte is ignored, INCLUDING any V4/V5 alpha
  a header larger than 40 bytes might define: features want pixels, the
  GIF-transparency rule), bottom-up and top-down. RLE compression and
  1/4/16 bpp raise ValueError and the caller falls back to the header
  sniff (they are a rounding error of real corpora; RLE BMPs are nearly
  extinct on the web).
- ENCODE (`encode_bmp`): the fixture counterpart — 24-bit BGR or 8-bit
  paletted, optional top-down — an independent forward implementation of
  the row/padding/direction rules the decoder must invert.

Bomb discipline matches the sibling codecs: dimensions are bounded BEFORE
allocation, declared offsets/sizes are never trusted past the payload,
and malformed input raises ValueError (a classification outcome for
decode_image_array), never MemoryError/IndexError.
"""

from __future__ import annotations

import struct

import numpy as np

from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

# index bytes + RGB expansion ≈ 4 working bytes per output byte
MAX_BMP_PIXEL_BYTES = MAX_DECODED_BYTES >> 2


def is_bmp(content: bytes) -> bool:
    return len(content) >= 2 and content[:2] == b"BM"


def decode_bmp(content: bytes) -> np.ndarray:
    """Decode an uncompressed BI_RGB BMP to an (H, W, 3) uint8 RGB array."""
    if not is_bmp(content):
        raise ValueError("not a BMP")
    if len(content) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack("<I", content[10:14])[0]
    hdr_size = struct.unpack("<I", content[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header (OS/2) variant unsupported")
    w, h_raw = struct.unpack("<ii", content[18:26])
    planes, bpp = struct.unpack("<HH", content[26:30])
    compression = struct.unpack("<I", content[30:34])[0]
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bit depth {bpp} unsupported (8/24/32 only)")
    if w * h * 3 > MAX_BMP_PIXEL_BYTES:
        raise ValueError(
            f"BMP decoded size {h}x{w} exceeds the "
            f"{MAX_BMP_PIXEL_BYTES >> 20} MB micro-decoder bound"
        )

    palette = None
    if bpp == 8:
        n_colors = struct.unpack("<I", content[46:50])[0] or 256
        if n_colors > 256:
            raise ValueError("BMP palette size out of range")
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(content):
            raise ValueError("truncated BMP color table")
        raw = np.frombuffer(content, np.uint8, 4 * n_colors, pal_off).reshape(-1, 4)
        palette = raw[:, [2, 1, 0]].copy()  # BGRX -> RGB

    stride = ((w * bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    need = stride * h
    # lower bound too: an offset pointing back INTO the headers/palette
    # would decode header bytes as pixels and present garbage as
    # decoded=true (review finding r11 — 'never trust declared offsets'
    # must hold in both directions)
    min_off = 14 + hdr_size + (4 * len(palette) if palette is not None else 0)
    if data_off < min_off or data_off + need > len(content):
        raise ValueError("BMP pixel-data offset out of range")
    rows = np.frombuffer(content, np.uint8, need, data_off).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w].astype(np.int32)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index outside the color table")
        return palette[idx]
    ch = bpp // 8
    px = rows[:, : w * ch].reshape(h, w, ch)
    return px[:, :, [2, 1, 0]].copy()  # BGR(X) -> RGB


def encode_bmp(
    arr: np.ndarray,
    palette: np.ndarray | None = None,
    top_down: bool = False,
) -> bytes:
    """Minimal BMP writer: pass (H, W, 3) RGB for 24-bit, or (H, W)
    indices + an (N, 3) palette for 8-bit."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if palette is not None:
        if arr.ndim != 2:
            raise ValueError("paletted encode takes (H, W) indices")
        h, w = arr.shape
        bpp = 8
        n_colors = len(palette)
        if int(arr.max(initial=0)) >= n_colors:
            raise ValueError("index outside the palette")
    else:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("24-bit encode takes (H, W, 3) RGB")
        h, w = arr.shape[:2]
        bpp = 24
        n_colors = 0

    stride = ((w * bpp // 8) + 3) & ~3
    data_off = 14 + 40 + 4 * n_colors
    img_size = stride * h
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", data_off + img_size, 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, 0, img_size, 2835, 2835,
        n_colors, 0,
    )
    if palette is not None:
        pal = np.zeros((n_colors, 4), np.uint8)
        pal[:, [2, 1, 0]] = np.asarray(palette, np.uint8)
        out += pal.tobytes()
        body = arr
    else:
        body = arr[:, :, [2, 1, 0]]  # RGB -> BGR
        body = body.reshape(h, w * 3)
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : body.shape[1]] = body
    if not top_down:
        rows = rows[::-1]
    out += rows.tobytes()
    return bytes(out)
