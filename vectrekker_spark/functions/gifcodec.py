"""Pure-Python GIF micro-codec (decode + fixture encoder) for the
multimodal path — closes the last sniff-only image format worth pixels
(VERDICT r10 #8). Built from the PUBLIC GIF89a specification only
(header/logical-screen/color-table layout, image descriptor, the GIF
variant of LZW with LSB-first packing, growing code width 3..12 bits,
CLEAR/END codes, 4096-entry dictionary cap, and the 8/8/4/2 interlace
row schedule).

Scope (micro-decoder, not giflib):
- DECODE: the FIRST image frame of GIF87a/GIF89a to (H, W, 3) uint8 RGB
  via the global or local color table; interlaced frames are
  de-interlaced. Extensions (GCE/comment/application) are skipped;
  transparency is IGNORED (features want pixels, not alpha — the
  transparent index renders as its palette color, documented).
  Animation: first frame only.
- ENCODE (`encode_gif`): the test-fixture counterpart — a REAL LZW
  compressor (dictionary growth, code-width sync, 12-bit cap with CLEAR
  reset), optional interlace — an independent forward implementation of
  the stream the decoder must invert, the PNG/JPEG/Y4M fixture idiom.

Bomb discipline (the imagecodec contract): frame dimensions are bounded
BEFORE allocation (output capped at MAX_DECODED_BYTES/4 — the decode
holds index bytes + the RGB expansion ≈ 4 bytes per output byte), the
LZW output never grows past the declared pixel count, and malformed
input raises ValueError (a classification outcome for
decode_image_array), never MemoryError/IndexError.
"""

from __future__ import annotations

import struct

import numpy as np

from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

MAX_GIF_PIXEL_BYTES = MAX_DECODED_BYTES >> 2


def is_gif(content: bytes) -> bool:
    return content[:6] in (b"GIF87a", b"GIF89a")


def _sub_blocks(content: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at i; returns (data, index
    past the 0x00 terminator)."""
    out = bytearray()
    n = len(content)
    while True:
        if i >= n:
            raise ValueError("truncated GIF sub-blocks")
        size = content[i]
        i += 1
        if size == 0:
            return bytes(out), i
        if i + size > n:
            raise ValueError("truncated GIF sub-block")
        out += content[i : i + size]
        i += size


def _lzw_decode(mcs: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-variant LZW: LSB-first codes of growing width, CLEAR resets,
    dictionary capped at 4096 entries. Output is bounded by the frame's
    declared pixel count — a crafted stream cannot outgrow the header."""
    if not 2 <= mcs <= 11:
        raise ValueError("bad GIF LZW minimum code size")
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    # bit reader state (LSB-first within bytes)
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = []
    code_size = mcs + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = mcs + 1
        prev = None

    reset()
    while len(out) < max_pixels:
        code = read_code(code_size)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                raise ValueError("bad GIF LZW first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # the decoder's table is one entry BEHIND the encoder's at the
        # moment a code is read (the encoder adds before emitting the
        # next code), so the width grows one entry EARLY relative to the
        # table size — the classic GIF-LZW sync rule
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        prev = entry
    return out[:max_pixels]


# the GIF interlace passes: (row offset, row stride)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> np.ndarray:
    """First frame of a GIF as (H, W, 3) uint8 RGB."""
    if not is_gif(content):
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, flags, _bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n_colors = 2 << (flags & 7)
        if i + 3 * n_colors > len(content):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(content, np.uint8, 3 * n_colors, i).reshape(-1, 3)
        i += 3 * n_colors

    n = len(content)
    while i < n:
        b = content[i]
        if b == 0x21:  # extension: label + sub-blocks, skipped
            if i + 2 > n:
                raise ValueError("truncated GIF extension")
            _data, i = _sub_blocks(content, i + 2)
            continue
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if b != 0x2C:
            raise ValueError("unknown GIF block")
        if i + 10 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, iflags = struct.unpack("<HHHHB", content[i + 1 : i + 10])
        i += 10
        if w == 0 or h == 0:
            raise ValueError("GIF with zero frame dimensions")
        if w * h * 3 > MAX_GIF_PIXEL_BYTES:
            raise ValueError(
                f"GIF decoded size {h}x{w} exceeds the "
                f"{MAX_GIF_PIXEL_BYTES >> 20} MB micro-decoder bound"
            )
        if (left, top, w, h) != (0, 0, _sw, _sh):
            # an offset or sub-canvas first frame needs background/placement
            # compositing this micro-decoder doesn't do; decoding it at frame
            # dims would silently disagree with sniff_image_meta's canvas
            # dims for the same payload (ADVICE r11) — classify to the sniff
            # fallback instead of returning mis-dimensioned pixels
            raise ValueError(
                "GIF first frame does not cover the logical-screen canvas"
            )
        palette = gct
        if iflags & 0x80:  # local color table
            n_colors = 2 << (iflags & 7)
            if i + 3 * n_colors > n:
                raise ValueError("truncated GIF local color table")
            palette = np.frombuffer(content, np.uint8, 3 * n_colors, i).reshape(
                -1, 3
            )
            i += 3 * n_colors
        if palette is None:
            raise ValueError("GIF image with no color table")
        if i >= n:
            raise ValueError("truncated GIF image data")
        mcs = content[i]
        data, i = _sub_blocks(content, i + 1)
        idx = _lzw_decode(mcs, data, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF LZW data shorter than the frame")
        indices = np.frombuffer(bytes(idx), np.uint8).astype(np.int32)
        if int(indices.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index outside the color table")
        rows = palette[indices].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: reorder the row schedule
            out = np.empty_like(rows)
            src = 0
            for off, stride in _INTERLACE:
                cnt = len(range(off, h, stride))
                out[off::stride] = rows[src : src + cnt]
                src += cnt
            rows = out
        return rows.copy()
    raise ValueError("GIF contains no image data")


# ---------------------------------------------------------------------------
# Fixture encoder


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """Real LZW compression, the forward twin of _lzw_decode: dictionary
    growth + code-width sync + 12-bit cap with CLEAR reset."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {}
    next_code = 0
    code_size = mcs + 1

    def reset():
        nonlocal table, next_code, code_size
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        code_size = mcs + 1

    reset()
    emit(clear, code_size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            reset()
        w = bytes([k])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Minimal GIF89a writer: one frame from (H, W) uint8 palette indices
    and an (N, 3) uint8 color table (N a power of two, 2..256)."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if indices.ndim != 2:
        raise ValueError("encode_gif takes (H, W) palette indices")
    n_colors = len(palette)
    if n_colors < 2 or n_colors & (n_colors - 1) or n_colors > 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    if int(indices.max(initial=0)) >= n_colors:
        raise ValueError("index outside the palette")
    h, w = indices.shape
    depth = max(1, (n_colors - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    if interlace:
        parts = [indices[off::stride] for off, stride in _INTERLACE]
        stream = np.concatenate(parts, axis=0).tobytes()
    else:
        stream = indices.tobytes()
    mcs = max(2, depth)
    out.append(mcs)
    lzw = _lzw_encode(mcs, stream)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
