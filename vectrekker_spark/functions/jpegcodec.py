"""Pure-numpy baseline JPEG micro-codec for the multimodal path.

JPEG is the dominant format in any web-scraped image corpus, but this
container ships no media library (PIL/ffmpeg absent), so until now JPEG
payloads were sniff-only (dimensions via the SOF marker walk in
imagecodec.py) and `extract_features` fell back to byte histograms exactly
where a 100 TB multimodal pipeline needs pixel features most. This module
implements the baseline sequential DCT process from the PUBLIC spec alone
(ITU-T T.81: marker/segment layout §B, Huffman entropy coding §F.2,
dequantization + 8x8 inverse DCT §A.3.3, restart intervals §B.2.4.4) plus
the JFIF YCbCr<->RGB transform, using only stdlib struct + numpy.

Scope (deliberately a micro-decoder, not a libjpeg replacement):
- DECODE: baseline + extended-sequential Huffman (SOF0/SOF1) AND
  progressive Huffman (SOF2, §G.2: spectral selection + successive
  approximation — r11, closing the ~10%-of-web-JPEGs gap), 8-bit,
  grayscale or 3-component YCbCr, any sampling factors where hmax/h and
  vmax/v divide evenly (covers 4:4:4, 4:2:2, 4:2:0, 4:1:1), DRI/RSTn
  restart intervals. Arithmetic coding, 12-bit, CMYK, hierarchical, and
  multi-scan SEQUENTIAL files raise ValueError and callers fall back to
  the header-sniff path.
- ENCODE (`encode_jpeg`, `encode_progressive_jpeg`): the test-fixture
  counterparts — Annex K quant + Huffman tables (fixed-length per-scan
  tables for progressive), IJG quality scaling, 4:4:4 / 4:2:2 / 4:2:0,
  optional restart intervals — so round-trip tests need no media library,
  mirroring imagecodec.encode_png. The forward DCT/quantizer is an
  independent implementation of the inverse path (and the IDCT is
  additionally checked against a naive cosine-sum in tests), the same
  two-implementations discipline the PNG decoder used. The decisive
  progressive check: both encoders write the SAME quantized coefficients,
  so their decodes must be BIT-IDENTICAL (pinned in tests).

Bomb-bound discipline matches the PNG decoder: the decoded size is checked
straight off the SOF header, BEFORE any allocation or entropy decode, and
the per-segment parse never trusts a length field beyond the payload —
but the JPEG bound is MAX_JPEG_PIXEL_BYTES (MAX_DECODED_BYTES/8) because
this pipeline's float32 working set is ~12-16 bytes per output byte where
PNG's is ~2 (see the constant's comment); the entropy stage's Python-object
coefficient accumulators are chunk-flushed at _FLUSH_COEFFS so a crafted
all-nonzero scan cannot grow them past ~20 MB/component (advice finding
r10 — they previously held every coefficient to end-of-scan, ~5x the
documented bound on a dense bound-passing file). Malformed input raises
ValueError (a classification outcome for decode_image_array), never
MemoryError — fuzz-verified over every truncation point and single-byte
flip of a real fixture.

The serial Python Huffman loop makes this suitable for corpus-filtering
feature extraction on typical web images, not for decoding billboard-size
assets — a real cluster with PIL installed never reaches this code
(operators/multimodal.decode_image prefers the library).
"""

from __future__ import annotations

import struct

import numpy as np

from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

# The JPEG decode pipeline holds ~3 float32 copies of the image per
# component (dequantized coefficient blocks, the IDCT result, the
# assembled plane) plus the einsum temporary — roughly 12-16 bytes of
# working memory per OUTPUT byte, unlike the PNG decoder whose working
# set is ~2x its output. The SOF-header bound therefore caps the OUTPUT
# at MAX_DECODED_BYTES/8 (8 MiB of pixels ≈ 128 MiB peak working set) so
# a bound-passing JPEG can never OOM an executor the way a bound-passing
# PNG cannot (review finding r10).
MAX_JPEG_PIXEL_BYTES = MAX_DECODED_BYTES >> 3

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the public example tables every mainstream
# encoder ships). The DECODER never assumes these: it is fully table-driven
# from the file's own DQT/DHT segments; only encode_jpeg writes them.

# zigzag index -> natural (raster) index (T.81 Figure A.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Tables K.1/K.2 in natural order
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (bits[1..16] counts, symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T @ P @ T.T, inverse
    P = T.T @ F @ T (T.81 A.3.3 with the c(u) normalization folded in)."""
    x = np.arange(8, dtype=np.float64)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    t[0, :] *= 1 / np.sqrt(2)
    return t


_DCT_T = _dct_matrix()


# Memo for built decode tables: every JPEG from the same encoder family
# ships identical DHT segments (usually the Annex K tables), and building
# the 65536-entry lookup costs ~1 ms — a constant that dominated small-
# image decodes. Keyed by the exact (bits, values) spec; FIFO-bounded.
_DECODE_TABLE_MEMO: dict = {}
_DECODE_TABLE_MEMO_MAX = 64


def _build_decode_table(bits: list[int], values: list[int]):
    """Canonical Huffman (T.81 C.2) as a flat 16-bit lookup: two 65536
    lists (symbol, code_length) indexed by the NEXT 16 bits of the
    stream — every code is a prefix of a 16-bit window, so decode is one
    table probe instead of a bit-at-a-time dict walk. length 0 marks an
    invalid code."""
    if len(values) != sum(bits):
        raise ValueError("JPEG Huffman table count mismatch")
    memo_key = (tuple(bits), tuple(values))
    hit = _DECODE_TABLE_MEMO.get(memo_key)
    if hit is not None:
        return hit
    sym = np.zeros(65536, dtype=np.uint8)
    ln = np.zeros(65536, dtype=np.uint8)
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("JPEG Huffman table overfull")
            lo = code << (16 - length)
            sym[lo : lo + (1 << (16 - length))] = values[vi]
            ln[lo : lo + (1 << (16 - length))] = length
            code += 1
            vi += 1
        code <<= 1
    # plain lists: Python list indexing is ~3x a numpy scalar index in
    # the per-symbol hot loop
    out = (sym.tolist(), ln.tolist())
    if len(_DECODE_TABLE_MEMO) >= _DECODE_TABLE_MEMO_MAX:
        _DECODE_TABLE_MEMO.pop(next(iter(_DECODE_TABLE_MEMO)))
    _DECODE_TABLE_MEMO[memo_key] = out
    return out


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """{symbol: (code, code_length)} from the same canonical assignment."""
    table, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return table


def is_jpeg(content: bytes) -> bool:
    return len(content) >= 2 and content[0] == 0xFF and content[1] == 0xD8


# ---------------------------------------------------------------------------
# Decoder


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already removed)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy-coded data exhausted mid-block")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def peek16(self) -> int:
        """Next 16 bits without consuming; virtual 1-padding past the end
        of data (consuming into the padding still raises in skip())."""
        while self.nbits < 16 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        pad = 16 - self.nbits
        return ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF

    def skip(self, n: int) -> None:
        if n > self.nbits:
            raise ValueError("JPEG entropy-coded data exhausted mid-block")
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1


def _read_huff(r: _BitReader, table) -> int:
    sym, ln = table
    idx = r.peek16()
    length = ln[idx]
    if length == 0:
        raise ValueError("invalid JPEG Huffman code")
    r.skip(int(length))
    return int(sym[idx])


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _parse_dqt(data: bytes, qt: dict) -> None:
    p = 0
    while p < len(data):
        pq, tq = data[p] >> 4, data[p] & 15
        p += 1
        if pq not in (0, 1) or tq > 3:
            raise ValueError("bad JPEG DQT header")
        count = 64 * (2 if pq else 1)
        if p + count > len(data):
            raise ValueError("truncated JPEG DQT")
        raw = (
            np.frombuffer(data[p : p + 128], dtype=">u2").astype(np.int64)
            if pq
            else np.frombuffer(data[p : p + 64], dtype=np.uint8).astype(np.int64)
        )
        # stored zigzag; keep zigzag order (decode multiplies pre-scatter)
        qt[tq] = raw
        p += count


def _parse_dht(data: bytes, huff: dict) -> None:
    p = 0
    while p < len(data):
        tc, th = data[p] >> 4, data[p] & 15
        p += 1
        if tc > 1 or th > 3 or p + 16 > len(data):
            raise ValueError("bad JPEG DHT header")
        bits = list(data[p : p + 16])
        p += 16
        nv = sum(bits)
        if p + nv > len(data):
            raise ValueError("truncated JPEG DHT")
        huff[(tc, th)] = _build_decode_table(bits, list(data[p : p + nv]))
        p += nv


def _parse_sof_payload(data: bytes) -> dict:
    """Common SOF0/1/2 frame-header parse with the bomb bound."""
    if len(data) < 6:
        raise ValueError("truncated JPEG SOF")
    precision = data[0]
    h = struct.unpack(">H", data[1:3])[0]
    w = struct.unpack(">H", data[3:5])[0]
    nc = data[5]
    if precision != 8:
        raise ValueError(f"unsupported JPEG precision {precision} (only 8)")
    if nc not in (1, 3):
        raise ValueError(f"unsupported JPEG component count {nc}")
    if w == 0 or h == 0:
        raise ValueError("JPEG with zero width or height")
    if h * w * nc > MAX_JPEG_PIXEL_BYTES:
        raise ValueError(
            f"JPEG decoded size {h}x{w}x{nc} exceeds the "
            f"{MAX_JPEG_PIXEL_BYTES >> 20} MB micro-decoder bound "
            "(sized for the float32 working-set multiplier)"
        )
    comps = []
    for c in range(nc):
        off = 6 + 3 * c
        if off + 3 > len(data):
            raise ValueError("truncated JPEG SOF components")
        cid, samp, tq = data[off], data[off + 1], data[off + 2]
        comps.append((cid, samp >> 4, samp & 15, tq))
    if nc == 1:
        # single-component scan geometry ignores sampling (A.2.2)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    for _, hs, vs, _ in comps:
        if not (1 <= hs <= 4 and 1 <= vs <= 4):
            raise ValueError("bad JPEG sampling factor")
    if sum(hs * vs for _, hs, vs, _ in comps) > 10:
        raise ValueError("JPEG blocks per MCU exceed the spec bound of 10")
    return {"h": h, "w": w, "comps": comps}


def _parse_segments(content: bytes):
    """Walk the marker stream up to SOS. Returns (qt, huff, frame,
    restart_interval, scan_comps, entropy_offset)."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", content[i + 2 : i + 4])
        if seg_len < 2 or i + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        data = content[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT — may hold several tables (B.2.4.1)
            _parse_dqt(data, qt)
        elif marker == 0xC4:  # DHT — may hold several tables (B.2.4.2)
            _parse_dht(data, huff)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            frame = _parse_sof_payload(data)
        elif marker == 0xC2:
            # handled by the dedicated multi-scan walker; decode_jpeg
            # dispatches on the SOF marker before reaching this parser
            raise ValueError("progressive JPEG reached the sequential parser")
        elif marker in (
            0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
        ):
            raise ValueError("unsupported JPEG coding process (baseline only)")
        elif marker == 0xDD:  # DRI
            if len(data) < 2:
                raise ValueError("truncated JPEG DRI")
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not data:
                raise ValueError("truncated JPEG SOS")
            ns = data[0]
            if ns != len(frame["comps"]):
                raise ValueError(
                    "multi-scan (non-interleaved) baseline JPEG unsupported"
                )
            # payload: ns(1) + 2 per component + Ss/Se/AhAl(3) (B.2.3) —
            # an unchecked short payload was an IndexError that escaped
            # decode_image_array's classification catch (review finding)
            if len(data) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG SOS component list")
            scan_comps = []
            by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in frame["comps"]}
            for s in range(ns):
                cid, tables = data[1 + 2 * s], data[2 + 2 * s]
                if cid not in by_id:
                    raise ValueError("JPEG scan references unknown component")
                hs, vs, tq = by_id[cid]
                scan_comps.append((cid, hs, vs, tq, tables >> 4, tables & 15))
            return qt, huff, frame, restart_interval, scan_comps, i + 2 + seg_len
        # APPn / COM / anything else: skip
        i += 2 + seg_len
    raise ValueError("JPEG missing SOS")


def _entropy_segments(content: bytes, start: int) -> list[bytes]:
    """Entropy-coded bytes from `start` to the next real marker, 0xFF00
    stuffing removed, split at RSTn boundaries (B.1.1.5)."""
    segs, _end = _entropy_segments_end(content, start)
    return segs


def _entropy_segments_end(content: bytes, start: int) -> tuple[list[bytes], int]:
    """(segments, index of the terminating marker's 0xFF) — the multi-scan
    progressive walker needs to resume the marker walk after each scan."""
    segs, cur = [], bytearray()
    i, n = start, len(content)
    while i < n:
        b = content[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
            break
        m = content[i + 1]
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # EOI or next segment marker
            break
    segs.append(bytes(cur))
    return segs, i


# Coefficient-accumulator flush threshold: bounds the per-component
# Python-object working set of the entropy loop (~36 bytes/coefficient
# across the three lists) to ~20 MB regardless of how dense a crafted
# scan is. Tests shrink it to force multi-flush paths.
_FLUSH_COEFFS = 512 * 1024


def _flush_coeffs(c: dict) -> None:
    """Scatter + dequant a component's accumulated (block-offset,
    zigzag-index, raw-value) lists into its coefficient buffer and clear
    them. Each position is written at most once per scan, so flushing in
    chunks is exactly equivalent to one end-of-scan scatter."""
    if c["offs"]:
        ks_arr = np.array(c["ks"], dtype=np.int64)
        flat = c["coef"].reshape(-1)
        flat[np.array(c["offs"], dtype=np.int64) + ZIGZAG[ks_arr]] = (
            np.array(c["vals"], dtype=np.float32) * c["qt"][ks_arr]
        )
    c["offs"], c["ks"], c["vals"] = [], [], []


def _sof_marker(content: bytes) -> int | None:
    """First SOFn marker byte via a bounded marker walk (cheap dispatch
    between the sequential fast path and the progressive decoder)."""
    i, n = 2, len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            return None
        m = content[i + 1]
        if m == 0xFF:
            i += 1
            continue
        if m == 0x01 or 0xD0 <= m <= 0xD9:
            i += 2
            continue
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return m
        if m == 0xDA:  # SOS before any SOF: malformed, let the parser say so
            return None
        (seg_len,) = struct.unpack(">H", content[i + 2 : i + 4])
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential OR progressive (SOF2) JPEG to
    an (H, W, C) uint8 array (C=1 grayscale, C=3 RGB via the JFIF YCbCr
    transform)."""
    if not is_jpeg(content):
        raise ValueError("not a JPEG: bad SOI")
    if _sof_marker(content) == 0xC2:
        return _decode_progressive(content)
    qt, huff, frame, restart_interval, scan_comps, pos = _parse_segments(content)
    h, w = frame["h"], frame["w"]
    hmax = max(hs for _, hs, _, _, _, _ in scan_comps)
    vmax = max(vs for _, _, vs, _, _, _ in scan_comps)
    for _, hs, vs, _, _, _ in scan_comps:
        if hmax % hs or vmax % vs:
            raise ValueError("JPEG sampling factors must divide the maxima")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comps = []
    for cid, hs, vs, tq, dc_id, ac_id in scan_comps:
        if tq not in qt:
            raise ValueError(f"JPEG scan uses undefined quant table {tq}")
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG scan uses undefined Huffman table")
        comps.append(
            {
                "cid": cid,
                "hs": hs,
                "vs": vs,
                "qt": qt[tq].astype(np.float32),  # zigzag order
                "dc": huff[(0, dc_id)],
                "ac": huff[(1, ac_id)],
                # per-block natural-order coefficients (float32: the
                # decode working set is ~3 copies of the image per
                # component — see MAX_JPEG_PIXEL_BYTES)
                "coef": np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.float32),
                "pred": 0,
            }
        )

    segments = _entropy_segments(content, pos)
    seg_i = 0
    reader = _BitReader(segments[0])
    mcu = 0
    # the entropy loop is pure-Python ints: coefficients accumulate into
    # (block-offset, zigzag-index, value) lists and a vectorized
    # scatter + dequant flushes them into the numpy coefficient buffer —
    # per-coefficient numpy scalar writes were the decode's hottest line.
    # The flush runs whenever a component's accumulator crosses
    # _FLUSH_COEFFS (each position is written at most once, so chunked
    # flushing ≡ one end-of-scan scatter), which caps the Python-object
    # working set at ~20 MB/component for ANY input density — a crafted
    # all-nonzero JPEG at the pixel cap would otherwise hold ~8.4M boxed
    # ints per list, ~5x the documented memory bound (advice finding r10)
    for c in comps:
        c["offs"], c["ks"], c["vals"] = [], [], []
        c["blkcols"] = mcux * c["hs"]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("JPEG missing expected restart marker")
                reader = _BitReader(segments[seg_i])
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_t, ac_t = c["dc"], c["ac"]
                offs, ks, vals = c["offs"], c["ks"], c["vals"]
                if len(offs) >= _FLUSH_COEFFS:
                    _flush_coeffs(c)
                    offs, ks, vals = c["offs"], c["ks"], c["vals"]
                pred = c["pred"]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        base = (
                            (my * c["vs"] + by) * c["blkcols"]
                            + mx * c["hs"]
                            + bx
                        ) * 64
                        s = _read_huff(reader, dc_t)
                        if s > 11:
                            raise ValueError("bad JPEG DC category")
                        if s:
                            pred += _extend(reader.read(s), s)
                        offs.append(base)
                        ks.append(0)
                        vals.append(pred)
                        k = 1
                        while k < 64:
                            rs = _read_huff(reader, ac_t)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            offs.append(base)
                            ks.append(k)
                            vals.append(_extend(reader.read(size), size))
                            k += 1
                c["pred"] = pred
            mcu += 1

    for c in comps:
        _flush_coeffs(c)

    return _reconstruct(comps, h, w, hmax, vmax)


def _reconstruct(comps: list[dict], h: int, w: int, hmax: int, vmax: int) -> np.ndarray:
    """Shared decode tail (sequential + progressive): batched IDCT over
    each component's natural-order dequantized coefficients, crop,
    replicate-upsample, YCbCr->RGB."""
    planes = []
    t = _DCT_T.astype(np.float32)
    for c in comps:
        rows, cols = c["coef"].shape[:2]
        blocks = c["coef"].reshape(rows, cols, 8, 8)
        # batched 2-D IDCT: P = T.T @ F @ T
        spatial = np.einsum(
            "ij,rcjk,kl->rcil", t.T, blocks, t, dtype=np.float32
        ) + np.float32(128.0)
        plane = (
            spatial.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        )
        # crop to this component's own resolution, then upsample to full
        ch = -(-h * c["vs"] // vmax)
        cw = -(-w * c["hs"] // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1
        )[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=2,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoder (ITU-T T.81 §G.2: spectral selection + successive
# approximation, Huffman). The scan-state algorithms (EOBRUN, AC refinement
# correction bits) follow the spec's flow charts (G.1.2.2/G.1.2.3) in their
# conventional realization; the encoder below is an independent forward
# implementation, and the decisive cross-check is bit-identity with the
# SEQUENTIAL decode of the same quantized coefficients (progressive vs
# baseline differ only in entropy organization, so pixels must match
# exactly — pinned in tests).

_MAX_SCANS = 64  # hostile-input bound: a real encoder emits ~10 scans


def _walk_progressive(content: bytes):
    """Full marker walk of a SOF2 file. DQT/DHT/DRI state evolves between
    scans, so each scan snapshot resolves its own tables and restart
    interval at ITS SOS. Returns (frame, qt, scans)."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    ri = 0
    scans: list[dict] = []
    i, n = 2, len(content)
    while i + 2 <= n:
        if content[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG segment")
        (seg_len,) = struct.unpack(">H", content[i + 2 : i + 4])
        if seg_len < 2 or i + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        data = content[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:
            _parse_dqt(data, qt)
        elif marker == 0xC4:
            _parse_dht(data, huff)
        elif marker == 0xC2:
            if frame is not None:
                raise ValueError("multiple JPEG frames")
            frame = _parse_sof_payload(data)
        elif marker in (
            0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
        ):
            raise ValueError("non-progressive SOF in the progressive walker")
        elif marker == 0xDD:
            if len(data) < 2:
                raise ValueError("truncated JPEG DRI")
            (ri,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not data:
                raise ValueError("truncated JPEG SOS")
            ns = data[0]
            if ns < 1 or len(data) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG SOS component list")
            frame_idx = {c[0]: k for k, c in enumerate(frame["comps"])}
            ss = data[1 + 2 * ns]
            se = data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not (ss <= se <= 63) or al > 13 or ah > 13:
                raise ValueError("bad progressive scan header")
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            if ss > 0 and ns != 1:
                raise ValueError("interleaved progressive AC scan (B.2.3)")
            members = []
            for s in range(ns):
                cid, tables = data[1 + 2 * s], data[2 + 2 * s]
                if cid not in frame_idx:
                    raise ValueError("JPEG scan references unknown component")
                td, ta = tables >> 4, tables & 15
                # snapshot the tables in force at THIS scan's SOS
                dc_tbl = ac_tbl = None
                if ss == 0 and ah == 0:
                    if (0, td) not in huff:
                        raise ValueError("JPEG scan uses undefined Huffman table")
                    dc_tbl = huff[(0, td)]
                elif ss > 0:
                    if (1, ta) not in huff:
                        raise ValueError("JPEG scan uses undefined Huffman table")
                    ac_tbl = huff[(1, ta)]
                members.append((frame_idx[cid], dc_tbl, ac_tbl))
            segs, end = _entropy_segments_end(content, i + 2 + seg_len)
            scans.append(
                dict(members=members, ss=ss, se=se, ah=ah, al=al, ri=ri, segs=segs)
            )
            if len(scans) > _MAX_SCANS:
                raise ValueError("JPEG scan count exceeds the decoder bound")
            i = end
            continue
        i += 2 + seg_len
    if frame is None:
        raise ValueError("JPEG missing SOF")
    if not scans:
        raise ValueError("JPEG missing SOS")
    return frame, qt, scans


# A legitimate 8-bit file's point-transformed DC is |dc<<Al| <= 2047<<13
# (~16.7M); anything past this generous bound is a crafted diff run that
# would overflow the int32 coefficient store (numpy>=2 raises OverflowError
# — a crash escaping the ValueError-only classification contract; numpy 1.x
# silently wraps into garbage pixels). Review finding r11.
_MAX_DC_MAGNITUDE = 1 << 26


def _dc_checked(pred: int, al: int) -> int:
    v = pred << al
    if not -_MAX_DC_MAGNITUDE <= v <= _MAX_DC_MAGNITUDE:
        raise ValueError("JPEG DC accumulator out of range")
    return v


def _refine_band(blk, k: int, se: int, reader: _BitReader, p1: int, m1: int) -> None:
    """AC successive-approximation correction pass over blk[k..se]
    (G.1.2.3): every nonzero-history coefficient reads one bit; a 1 bit
    whose magnitude bit is not already set moves the value away from
    zero by 1 << Al."""
    while k <= se:
        v = int(blk[k])
        if v != 0 and reader.read(1) and (v & p1) == 0:
            blk[k] = v + (p1 if v >= 0 else m1)
        k += 1


def _process_scan(scan: dict, comps: list[dict], mcux: int, mcuy: int) -> None:
    """Apply one progressive scan to the per-component zigzag-order
    coefficient state.

    Deliberately per-coefficient numpy scalar access, unlike the
    sequential decoder's list-accumulate + vectorized scatter: refinement
    scans READ the running coefficient state to drive control flow
    (correction bits exist only at nonzero-history positions), so the
    state must be randomly readable mid-scan. The measured end-to-end premium
    over the sequential path is 1.4-1.7x (SCALE.md r11) — acceptable for
    the corpus-filter fallback; batching the write-once first scans
    through the _FLUSH_COEFFS idiom is the known lever if that ever
    stops being true."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    segs, ri = scan["segs"], scan["ri"]
    seg_i = 0
    reader = _BitReader(segs[0])

    def restart_if_due(unit: int):
        nonlocal seg_i, reader, eobrun
        if ri and unit and unit % ri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing expected restart marker")
            reader = _BitReader(segs[seg_i])
            for p in preds:
                preds[p] = 0
            eobrun = 0

    preds = {ci: 0 for ci, *_ in scan["members"]}
    eobrun = 0

    if ss == 0:
        # DC scan: interleaved MCU order (or the component's own block
        # raster when single-component)
        members = scan["members"]
        if len(members) == 1:  # non-interleaved: the component's own grid
            ci, dc_tbl, _ = members[0]
            c = comps[ci]
            unit = 0
            for row in range(c["nbh"]):
                for col in range(c["nbw"]):
                    restart_if_due(unit)
                    blk = c["zz"][row * c["bcols"] + col]
                    if ah == 0:
                        s = _read_huff(reader, dc_tbl)
                        if s > 11:
                            raise ValueError("bad JPEG DC category")
                        if s:
                            preds[ci] += _extend(reader.read(s), s)
                        blk[0] = _dc_checked(preds[ci], al)
                    elif reader.read(1):
                        blk[0] = int(blk[0]) | (1 << al)
                    unit += 1
        else:
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    restart_if_due(mcu)
                    for ci, dc_tbl, _ in members:
                        c = comps[ci]
                        for by in range(c["vs"]):
                            for bx in range(c["hs"]):
                                flat = (
                                    (my * c["vs"] + by) * c["bcols"]
                                    + mx * c["hs"]
                                    + bx
                                )
                                blk = c["zz"][flat]
                                if ah == 0:
                                    s = _read_huff(reader, dc_tbl)
                                    if s > 11:
                                        raise ValueError("bad JPEG DC category")
                                    if s:
                                        preds[ci] += _extend(reader.read(s), s)
                                    blk[0] = _dc_checked(preds[ci], al)
                                elif reader.read(1):
                                    blk[0] = int(blk[0]) | (1 << al)
                    mcu += 1
        return

    # AC scan: always one component, block raster over its own grid
    ci, _, ac_tbl = scan["members"][0]
    c = comps[ci]
    p1, m1 = 1 << al, -(1 << al)
    unit = 0
    for row in range(c["nbh"]):
        for col in range(c["nbw"]):
            restart_if_due(unit)
            unit += 1
            blk = c["zz"][row * c["bcols"] + col]
            if ah == 0:
                # first AC scan for this band (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_huff(reader, ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overrun")
                        blk[k] = _extend(reader.read(s), s) << al
                        k += 1
                continue
            # AC refinement (G.1.2.3)
            if eobrun:
                _refine_band(blk, ss, se, reader, p1, m1)
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _read_huff(reader, ac_tbl)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "progressive AC refinement size must be 1"
                        )
                    newval = p1 if reader.read(1) else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # advance past r zero-HISTORY slots, correcting nonzero
                # ones for free (they cost a bit each, not a run slot)
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if reader.read(1) and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("JPEG AC refinement overrun")
                    blk[k] = newval
                k += 1
            if eobrun:
                # the block that STARTS an EOB run still refines the rest
                # of its own band, and counts as the run's first member
                _refine_band(blk, k, se, reader, p1, m1)
                eobrun -= 1


def _decode_progressive(content: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) Huffman JPEG. Coefficients accumulate
    across scans in zigzag order; dequantization and the shared
    IDCT/upsample/color tail run once at the end."""
    frame, qt, scans = _walk_progressive(content)
    h, w = frame["h"], frame["w"]
    hmax = max(hs for _, hs, _, _ in frame["comps"])
    vmax = max(vs for _, _, vs, _ in frame["comps"])
    for _, hs, vs, _ in frame["comps"]:
        if hmax % hs or vmax % vs:
            raise ValueError("JPEG sampling factors must divide the maxima")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comps = []
    for cid, hs, vs, tq in frame["comps"]:
        if tq not in qt:
            raise ValueError(f"JPEG scan uses undefined quant table {tq}")
        brows, bcols = mcuy * vs, mcux * hs
        ch = -(-h * vs // vmax)  # component pixel dims
        cw = -(-w * hs // hmax)
        comps.append(
            {
                "cid": cid,
                "hs": hs,
                "vs": vs,
                "qt": qt[tq],
                # int32 zigzag-order coefficient state, flat block index
                "zz": np.zeros((brows * bcols, 64), dtype=np.int32),
                "brows": brows,
                "bcols": bcols,
                # the component's OWN block grid (non-interleaved scans
                # cover exactly these blocks, A.2.2)
                "nbh": -(-ch // 8),
                "nbw": -(-cw // 8),
            }
        )

    seen_dc = set()
    for scan in scans:
        if scan["ss"] == 0:
            for ci, *_ in scan["members"]:
                seen_dc.add(ci)
        _process_scan(scan, comps, mcux, mcuy)
    if len(seen_dc) != len(comps):
        raise ValueError("progressive JPEG missing a DC scan")

    out_comps = []
    for c in comps:
        qtzz = c["qt"].astype(np.float32)
        nat = np.zeros((c["zz"].shape[0], 64), dtype=np.float32)
        # one vectorized dequant + zigzag->natural scatter per component
        nat[:, ZIGZAG] = c["zz"].astype(np.float32) * qtzz[None, :]
        out_comps.append(
            {
                "coef": nat.reshape(c["brows"], c["bcols"], 64),
                "hs": c["hs"],
                "vs": c["vs"],
            }
        )
    return _reconstruct(out_comps, h, w, hmax, vmax)


# ---------------------------------------------------------------------------
# Encoder (fixture builder)


class _BitWriter:
    """MSB-first bit writer with 0xFF00 byte stuffing (B.1.1.5)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (natural order)."""
    if not 1 <= quality <= 100:
        raise ValueError("JPEG quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


def _category(v: int) -> int:
    """Magnitude category (bit length of |v|), 0 for 0."""
    return int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter, zz_coef: np.ndarray, pred: int, dc_tbl: dict, ac_tbl: dict
) -> int:
    """Huffman-encode one block's zigzag-order quantized coefficients.
    Returns the new DC predictor."""
    dc = int(zz_coef[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_tbl[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz_coef)[0])) if np.any(zz_coef[1:]) else 0
    for k in range(1, 64):
        v = int(zz_coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tbl[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, length = ac_tbl[0x00]  # EOB
        bw.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Pad a component plane to 8x8 blocks (edge replicate), forward-DCT
    every block, quantize against the natural-order table, return zigzag
    coefficients of shape (rows, cols, 64)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).astype(
            np.float64
        )
        - 128.0
    )
    t = _DCT_T
    freq = np.einsum("ij,rcjk,kl->rcil", t, blocks, t.T)
    q = np.round(freq / qtable.reshape(8, 8)).astype(np.int64)
    # ZIGZAG maps zigzag index -> natural index, so fancy-indexing a
    # natural-order flat block with it YIELDS the zigzag-order vector
    return q.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]


def _rgb_to_ycbcr(arr: np.ndarray) -> list[np.ndarray]:
    r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]


def _prep_components(arr: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half (baseline + progressive): color convert,
    subsample, forward-DCT + quantize, pad block grids to the MCU grid.
    Returns (comp_blocks, samps, qt_luma, qt_chroma, h, w, nc, mcux, mcuy)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if h == 0 or w == 0:
        raise ValueError("JPEG requires nonzero dimensions")
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4', '4:2:2' or '4:2:0'")

    qt_luma, qt_chroma = _quality_tables(quality)

    if nc == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsampling == "4:2:0":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:2:2":  # horizontal-only chroma decimation
            pw = -(-w // 2) * 2
            cb = np.pad(cb, ((0, 0), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, 0), (0, pw - w)), mode="edge")
            cb = cb.reshape(h, pw // 2, 2).mean(axis=2)
            cr = cr.reshape(h, pw // 2, 2).mean(axis=2)
            samps = [(2, 1), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comp_blocks = []
    for ci, (plane, (hs, vs)) in enumerate(zip(planes, samps)):
        qtable = qt_luma if ci == 0 else qt_chroma
        zzb = _plane_blocks(plane, qtable)
        # pad the block grid so every MCU indexes valid blocks
        need_r, need_c = mcuy * vs, mcux * hs
        pr, pc = need_r - zzb.shape[0], need_c - zzb.shape[1]
        if pr or pc:
            zzb = np.pad(zzb, ((0, pr), (0, pc), (0, 0)), mode="edge")
        comp_blocks.append(zzb)
    return comp_blocks, samps, qt_luma, qt_chroma, h, w, nc, mcux, mcuy


def _jpeg_headers(
    qt_luma, qt_chroma, samps, h: int, w: int, nc: int, sof_marker: int
) -> bytearray:
    """SOI + APP0 + DQT + SOF — shared between the two encoders."""

    def seg(marker: int, data: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    dqt = bytes([0x00]) + bytes(qt_luma[ZIGZAG].astype(np.uint8))
    if nc == 3:
        dqt += bytes([0x01]) + bytes(qt_chroma[ZIGZAG].astype(np.uint8))
    out += seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(sof_marker, sof)
    return out


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG writer — the test-fixture counterpart of
    decode_jpeg (Annex K tables, IJG quality scaling, 4:4:4/4:2:2/4:2:0,
    optional DRI/RSTn restarts)."""
    comp_blocks, samps, qt_luma, qt_chroma, h, w, nc, mcux, mcuy = (
        _prep_components(arr, quality, subsampling)
    )
    dc_l, ac_l = _build_encode_table(*_DC_LUMA), _build_encode_table(*_AC_LUMA)
    dc_c, ac_c = _build_encode_table(*_DC_CHROMA), _build_encode_table(*_AC_CHROMA)

    bw = _BitWriter()
    entropy_parts: list[bytes] = []
    preds = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                entropy_parts.append(bytes(bw.out))
                entropy_parts.append(
                    bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                )
                bw = _BitWriter()
                preds = [0] * nc
            for ci, (hs, vs) in enumerate(samps):
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            bw,
                            comp_blocks[ci][my * vs + by, mx * hs + bx],
                            preds[ci],
                            dc_t,
                            ac_t,
                        )
            mcu += 1
    bw.flush()
    entropy_parts.append(bytes(bw.out))
    entropy = b"".join(entropy_parts)

    def seg(marker: int, data: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    out = _jpeg_headers(qt_luma, qt_chroma, samps, h, w, nc, 0xC0)
    dht = bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1])
    dht += bytes([0x10]) + bytes(_AC_LUMA[0]) + bytes(_AC_LUMA[1])
    if nc == 3:
        dht += bytes([0x01]) + bytes(_DC_CHROMA[0]) + bytes(_DC_CHROMA[1])
        dht += bytes([0x11]) + bytes(_AC_CHROMA[0]) + bytes(_AC_CHROMA[1])
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential DCT
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (fixture builder for the SOF2 decoder)


def _fixed_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Equal-length canonical Huffman spec covering exactly `symbols`:
    n codes of length L = ceil(log2(n+1)) (the +1 keeps the all-ones code
    unused, the T.81 convention). Deliberately non-optimal — the decoder
    is fully table-driven from DHT, and fixture size doesn't matter; what
    matters is that this is an INDEPENDENT forward implementation, not a
    copy of the decode tables."""
    vals = sorted(set(symbols))
    if not vals:
        return [0] * 16, []
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())  # smallest L with n < 2**L
    if n >= (1 << length):
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


class _SymCollector:
    """Pass-1 sink: records which Huffman symbols a scan emits (bit
    payloads are ignored — only the symbol alphabet matters)."""

    def __init__(self):
        self.symbols: set[int] = set()

    def symbol(self, s: int) -> None:
        self.symbols.add(s)

    def bits(self, value: int, nbits: int) -> None:
        pass

    def restart(self, idx: int) -> None:
        pass


class _ScanWriter:
    """Pass-2 sink: real entropy output through a Huffman encode table,
    with RSTn emission between restart intervals."""

    def __init__(self, table: dict):
        self.table = table
        self.bw = _BitWriter()
        self.parts: list[bytes] = []

    def symbol(self, s: int) -> None:
        code, length = self.table[s]
        self.bw.write(code, length)

    def bits(self, value: int, nbits: int) -> None:
        if nbits:
            self.bw.write(value, nbits)

    def restart(self, idx: int) -> None:
        self.bw.flush()
        self.parts.append(bytes(self.bw.out))
        self.parts.append(bytes([0xFF, 0xD0 + idx % 8]))
        self.bw = _BitWriter()

    def finish(self) -> bytes:
        self.bw.flush()
        self.parts.append(bytes(self.bw.out))
        return b"".join(self.parts)


def _scan_blocks(comp_blocks, samps, members, mcux, mcuy, h, w, hmax, vmax):
    """Yield (restart_boundary_mcu_index_or_None, [(ci, zz_block), ...])
    per MCU in the scan's block order — interleaved MCU clusters for
    multi-component scans, the component's own raster otherwise."""
    if len(members) == 1:
        ci = members[0]
        hs, vs = samps[ci]
        nbh = -(- (-(-h * vs // vmax)) // 8)
        nbw = -(- (-(-w * hs // hmax)) // 8)
        for row in range(nbh):
            for col in range(nbw):
                yield [(ci, comp_blocks[ci][row, col])]
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                cluster = []
                for ci in members:
                    hs, vs = samps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            cluster.append(
                                (ci, comp_blocks[ci][my * vs + by, mx * hs + bx])
                            )
                yield cluster


def _encode_dc_scan(sink, blocks_iter, al: int, ah: int, ri: int):
    """DC scan: first pass encodes (dc >> Al) diffs (arithmetic shift —
    the DC point transform, G.1.2.1); refinement emits bit Al of each DC
    value raw."""
    preds: dict[int, int] = {}
    mcu = 0
    rst = 0
    for cluster in blocks_iter:
        if ri and mcu and mcu % ri == 0:
            sink.restart(rst)
            rst += 1
            preds = {}
        for ci, zz in cluster:
            dc = int(zz[0])
            if ah == 0:
                v = dc >> al
                diff = v - preds.get(ci, 0)
                preds[ci] = v
                s = _category(diff)
                sink.symbol(s)
                if s:
                    sink.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
            else:
                sink.bits((dc >> al) & 1, 1)
        mcu += 1


def _encode_ac_first_scan(sink, blocks_iter, ss: int, se: int, al: int, ri: int):
    """First AC scan for a band: run-length + EOB-run coding of the
    point-transformed coefficients (G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(r << 4)
            if r:
                sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    mcu = 0
    rst = 0
    for cluster in blocks_iter:
        if ri and mcu and mcu % ri == 0:
            flush_eob()
            sink.restart(rst)
            rst += 1
        mcu += 1
        ((_ci, zz),) = cluster
        band = [int(v) for v in zz[ss : se + 1]]
        tvals = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
        last_nz = -1
        for idx, t in enumerate(tvals):
            if t:
                last_nz = idx
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for idx in range(last_nz + 1):
            t = tvals[idx]
            if t == 0:
                run += 1
                continue
            while run > 15:
                sink.symbol(0xF0)  # ZRL
                run -= 16
            s = _category(t)
            sink.symbol((run << 4) | s)
            sink.bits(t if t >= 0 else t + (1 << s) - 1, s)
            run = 0
        if last_nz < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_ac_refine_scan(sink, blocks_iter, ss: int, se: int, al: int, ri: int):
    """AC refinement scan: newly-significant coefficients get (run, 1)
    symbols + a sign bit; previously-significant ones contribute buffered
    correction bits (G.1.2.3). TWO buffers, matching the decoder's read
    order exactly: `run_bits` belong to the pending cross-block EOB run
    and are emitted right after the EOBn symbol (the decoder reads them
    while refining the run's blocks); `cur` holds the CURRENT block's
    bits since the last symbol and trails the next in-block symbol (the
    decoder reads them in its advance-past-r-zeros loop). Conflating the
    two desyncs the very first multi-block refine scan — found by the
    round-trip bit-identity test, kept as the regression it caught."""
    eobrun = 0
    run_bits: list[int] = []  # owned by the pending EOB run
    cur: list[int] = []  # current block, since the last emitted symbol

    def flush_eob():
        nonlocal eobrun, run_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.symbol(r << 4)
            if r:
                sink.bits(eobrun - (1 << r), r)
            for b in run_bits:
                sink.bits(b, 1)
            run_bits = []
            eobrun = 0

    def emit_cur():
        nonlocal cur
        for b in cur:
            sink.bits(b, 1)
        cur = []

    mcu = 0
    rst = 0
    for cluster in blocks_iter:
        if ri and mcu and mcu % ri == 0:
            flush_eob()
            sink.restart(rst)
            rst += 1
        mcu += 1
        ((_ci, zz),) = cluster
        band = [int(v) for v in zz[ss : se + 1]]
        absv = [abs(v) >> al for v in band]
        eob = -1  # index (in band coords) of the LAST newly-significant
        for idx, t in enumerate(absv):
            if t == 1:
                eob = idx
        r = 0
        for idx in range(len(band)):
            t = absv[idx]
            if t == 0:
                r += 1
                continue
            while r > 15 and idx <= eob:
                flush_eob()
                sink.symbol(0xF0)  # ZRL
                r -= 16
                emit_cur()
            if t > 1:
                # previously significant: one buffered correction bit
                cur.append(t & 1)
                continue
            # newly significant (|v| >> Al == 1)
            flush_eob()
            sink.symbol((r << 4) | 1)
            sink.bits(1 if band[idx] >= 0 else 0, 1)
            emit_cur()
            r = 0
        if r > 0 or cur:
            # block ends inside an EOB run: its leftover correction bits
            # now belong to the run
            eobrun += 1
            run_bits.extend(cur)
            cur = []
            if eobrun == 0x7FFF or len(run_bits) > 900:
                flush_eob()
    flush_eob()


def encode_progressive_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    split: int = 5,
    dc_al: int = 1,
    ac_al: int = 1,
) -> bytes:
    """Progressive (SOF2) JPEG writer — the test-fixture counterpart of
    the progressive decoder, an independent forward implementation of
    T.81 §G.1.2 over the SAME quantized coefficients encode_jpeg writes
    (so the two encodes must decode bit-identically).

    Scan script (the conventional shape): interleaved DC first at Al=dc_al;
    per-component AC first scans for bands [1..split] and [split+1..63] at
    Al=ac_al; the matching AC refinement scans down to Al=0; a final DC
    refinement. Each scan carries its own DHT (equal-length codes over
    exactly the symbols it emits — redefinition between scans is legal and
    keeps the table builder trivial and independent)."""
    comp_blocks, samps, qt_luma, qt_chroma, h, w, nc, mcux, mcuy = (
        _prep_components(arr, quality, subsampling)
    )
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    if not 0 <= split <= 62:
        raise ValueError("split must be in [0, 62]")

    def seg(marker: int, data: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    out = _jpeg_headers(qt_luma, qt_chroma, samps, h, w, nc, 0xC2)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    # scan script: (members, ss, se, ah, al, kind)
    script: list[tuple[list[int], int, int, int, int, str]] = [
        (list(range(nc)), 0, 0, 0, dc_al, "dc"),
    ]
    bands = [(1, split), (split + 1, 63)] if split else [(1, 63)]
    for ci in range(nc):
        for bss, bse in bands:
            script.append(([ci], bss, bse, 0, ac_al, "ac_first"))
    for a in range(ac_al, 0, -1):
        for ci in range(nc):
            for bss, bse in bands:
                script.append(([ci], bss, bse, a, a - 1, "ac_refine"))
    for a in range(dc_al, 0, -1):
        script.append((list(range(nc)), 0, 0, a, a - 1, "dc"))

    for members, ss, se, ah, al, kind in script:
        def run(sink):
            it = _scan_blocks(
                comp_blocks, samps, members, mcux, mcuy, h, w, hmax, vmax
            )
            if kind == "dc":
                _encode_dc_scan(sink, it, al, ah, restart_interval)
            elif kind == "ac_first":
                _encode_ac_first_scan(sink, it, ss, se, al, restart_interval)
            else:
                _encode_ac_refine_scan(sink, it, ss, se, al, restart_interval)

        needs_table = not (kind == "dc" and ah > 0)
        table_class = 0 if kind == "dc" else 1
        if needs_table:
            collector = _SymCollector()
            run(collector)
            bits, vals = _fixed_table(sorted(collector.symbols))
            out += seg(
                0xC4, bytes([(table_class << 4) | 0]) + bytes(bits) + bytes(vals)
            )
            writer = _ScanWriter(_build_encode_table(bits, vals))
        else:
            writer = _ScanWriter({})
        sos = bytes([len(members)])
        for ci in members:
            sos += bytes([ci + 1, 0x00])  # td=0 / ta=0 (redefined per scan)
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        run(writer)
        out += writer.finish()

    out += b"\xff\xd9"  # EOI
    return bytes(out)
