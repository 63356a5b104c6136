"""Pure-Python lossless-WebP (VP8L) micro-codec (decode + fixture
encoder) for the multimodal path — closes the last sniff-only image
format (VERDICT r11 "What's missing" #3). Built from the PUBLIC WebP
lossless bitstream specification only (RFC 9649 §3 and the VP8L spec it
incorporates): RIFF/WEBP container, the 0x2F-signature VP8L header,
LSB-first bit packing, canonical DEFLATE-style prefix codes with the
simple/normal code-length transmission, the four transforms (predictor,
color, subtract-green, color-indexing with pixel bundling), meta prefix
groups, the color cache, and LZ77 backward references with the 120-entry
2D distance map.

Scope (micro-decoder, not libwebp):
- DECODE: lossless (VP8L) payloads, bare or inside a VP8X extended
  container, to (H, W, 3|4) uint8 — RGBA when the header's alpha hint is
  set, RGB otherwise. Lossy (VP8) raises ValueError and callers fall back
  to the header sniff (which already reports lossy dims). Animations:
  only a top-level VP8L chunk is decoded; ANMF sub-frames classify to the
  sniff fallback.
- ENCODE (`encode_webp`): the test-fixture counterpart — an independent
  forward implementation (real Huffman over measured symbol frequencies,
  RLE 16/17/18 code-length transmission, optional LZ77 / color cache /
  meta prefix groups / each transform) so round-trips check the decoder
  against the spec's stream format, not against itself. Canonical code
  assignment is implemented TWICE in different formulations (decoder:
  RFC 1951 §3.2.2 bl_count/next_code; encoder: sort-by-(len, symbol)
  sequential) so a tie-rule bug breaks round-trips instead of hiding.

Distance map: the spec defines codes 1..120 as a printed table of
(dx, dy) neighbor offsets. The table is reconstructed here from its
generating rule — all offsets with dy in [0, 7], dx in [-7, 8] on the
positive side (exactly 120), ordered by (dx² + dy², descending dy,
positive dx first) — which reproduces the spec's printed table; the
first 48 entries are pinned literally in tests/test_webpcodec.py.

Bomb discipline (the imagecodec contract): output dimensions are bounded
BEFORE allocation (the pixel loop holds Python int objects, ~8 bytes of
working set per output byte, so the bound is MAX_DECODED_BYTES/8), the
pixel loop never writes past the declared pixel count, backward
references are range-checked, and malformed input raises ValueError (a
classification outcome for decode_image_array), never
MemoryError/IndexError.
"""

from __future__ import annotations

import struct

import numpy as np

from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

MAX_WEBP_PIXEL_BYTES = MAX_DECODED_BYTES >> 3

# code-length-code transmission order (VP8L spec; differs from DEFLATE's)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_HASH_MUL = 0x1E35A7BD  # color-cache multiplicative hash (spec constant)


def _build_dist_map() -> list[tuple[int, int]]:
    """The 120-entry 2D distance map (see module docstring for the
    derivation rule and its verification span)."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cands


_DIST_MAP = _build_dist_map()
assert len(_DIST_MAP) == 120


def is_webp(content: bytes) -> bool:
    return len(content) >= 12 and content[:4] == b"RIFF" and content[8:12] == b"WEBP"


def _find_vp8l(content: bytes) -> bytes:
    """Walk the RIFF chunks for the VP8L payload. Lossy and truncated
    containers raise (classification outcomes)."""
    if not is_webp(content):
        raise ValueError("not a WebP container")
    i = 12
    n = len(content)
    while i + 8 <= n:
        fourcc = content[i : i + 4]
        (size,) = struct.unpack("<I", content[i + 4 : i + 8])
        if i + 8 + size > n:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            return content[i + 8 : i + 8 + size]
        if fourcc == b"VP8 ":
            raise ValueError("lossy WebP (VP8) pixel decode unsupported")
        i += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L chunk")


class _BitReader:
    """LSB-first bit reader over the VP8L bitstream. ``peek`` zero-pads
    past the end (the LUT fast path needs a fixed window); ``read`` and
    the LUT consume path both enforce the hard end-of-stream bound."""

    __slots__ = ("d", "nbits", "bitpos")

    def __init__(self, data: bytes):
        self.d = data
        self.nbits = len(data) * 8
        self.bitpos = 0

    def peek(self, n: int) -> int:
        d = self.d
        nd = len(d)
        p = self.bitpos
        byte = p >> 3
        v = d[byte] >> (p & 7) if byte < nd else 0
        got = 8 - (p & 7)
        while got < n:
            byte += 1
            v |= (d[byte] if byte < nd else 0) << got
            got += 8
        return v & ((1 << n) - 1)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.bitpos += n
        if self.bitpos > self.nbits:
            raise ValueError("VP8L bitstream exhausted")
        return v


class _PrefixCode:
    """Canonical prefix code per RFC 1951 §3.2.2 (codes assigned by
    increasing length then symbol, packed MSB-first into the LSB-first
    bitstream). Single-nonzero-length codes read as zero bits (spec
    single-symbol rule); multi-symbol codes must satisfy Kraft equality
    (complete), matching the reference decoder's strictness."""

    __slots__ = ("single", "lut", "long_map", "max_len")

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L prefix code with no symbols")
        self.single = None
        self.lut = None
        self.long_map = None
        self.max_len = 0
        if len(nz) == 1:
            self.single = nz[0][0]
            return
        max_len = max(l for _, l in nz)
        if max_len > 15:
            raise ValueError("VP8L code length exceeds 15")
        # completeness (Kraft equality) — an over- or under-subscribed
        # code is a corrupt stream, not a decodable one
        if sum(1 << (15 - l) for _, l in nz) != 1 << 15:
            raise ValueError("VP8L prefix code is not complete")
        # RFC 1951 bl_count/next_code canonical assignment
        bl_count = [0] * (max_len + 1)
        for _, l in nz:
            bl_count[l] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        lut: list = [None] * 256
        long_map: dict = {}
        for s, l in nz:  # enumerate order is symbol order — canonical
            c = next_code[l]
            next_code[l] += 1
            if l <= 8:
                rev = 0
                for i in range(l):
                    rev |= ((c >> i) & 1) << (l - 1 - i)
                step = 1 << l
                for j in range(rev, 256, step):
                    lut[j] = (s, l)
            else:
                long_map[(l, c)] = s
        self.lut = lut
        self.long_map = long_map
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        e = self.lut[br.peek(8)]
        if e is not None:
            br.bitpos += e[1]
            if br.bitpos > br.nbits:
                raise ValueError("VP8L bitstream exhausted")
            return e[0]
        c = 0
        for l in range(1, self.max_len + 1):
            c = (c << 1) | br.read(1)
            s = self.long_map.get((l, c)) if l > 8 else None
            if s is not None:
                return s
        raise ValueError("invalid VP8L prefix code")


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """One prefix code's length array: the simple (1-2 symbol) form or
    the normal form (code-length code + RLE symbols 16/17/18 + the
    optional max_symbol bound)."""
    lengths = [0] * alphabet_size
    if br.read(1):  # simple
        num_syms = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        syms = [s0]
        if num_syms == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
        if num_syms == 2 and syms[0] == syms[1]:
            raise ValueError("VP8L simple code repeats a symbol")
        for s in syms:
            lengths[s] = 1
        return lengths
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L max_symbol exceeds the alphabet")
    else:
        max_symbol = alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                rep, use = 3 + br.read(2), prev
            elif cl == 17:
                rep, use = 3 + br.read(3), 0
            else:
                rep, use = 11 + br.read(7), 0
            if sym + rep > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns")
            for _ in range(rep):
                lengths[sym] = use
                sym += 1
    return lengths


def _read_group(br: _BitReader, cache_size: int) -> tuple:
    """The 5 prefix codes of one group, in spec order."""
    return (
        _PrefixCode(_read_code_lengths(br, 256 + 24 + cache_size)),  # green
        _PrefixCode(_read_code_lengths(br, 256)),  # red
        _PrefixCode(_read_code_lengths(br, 256)),  # blue
        _PrefixCode(_read_code_lengths(br, 256)),  # alpha
        _PrefixCode(_read_code_lengths(br, 40)),  # distance
    )


def _lz77_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix coding (spec §4.2.2): code → value."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_dist(dval: int, width: int) -> int:
    if dval > 120:
        return dval - 120
    dx, dy = _DIST_MAP[dval - 1]
    return max(dy * width + dx, 1)


def _sub(v: int, bits: int) -> int:
    return (v + (1 << bits) - 1) >> bits


def _decode_pixels(
    br: _BitReader,
    w: int,
    h: int,
    groups: list,
    meta: list[int] | None,
    meta_bits: int,
    meta_w: int,
    cache_bits: int,
) -> list[int]:
    """The LZ77-coded pixel stream → flat ARGB int list (row-major)."""
    npix = w * h
    pix = [0] * npix
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0
    green, red, blue, alpha, dist_tree = groups[0]
    single = len(groups) == 1 and meta is None
    pos = x = y = 0
    while pos < npix:
        if not single:
            gi = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            green, red, blue, alpha, dist_tree = groups[gi]
        s = green.decode(br)
        if s < 256:
            r = red.decode(br)
            b = blue.decode(br)
            a = alpha.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            pix[pos] = px
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> cshift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dval = _lz77_value(br, dist_tree.decode(br))
            dist = _plane_to_dist(dval, w)
            if dist > pos or length > npix - pos:
                raise ValueError("VP8L backward reference out of range")
            if cache is not None:
                for _ in range(length):
                    px = pix[pos - dist]
                    pix[pos] = px
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> cshift] = px
                    pos += 1
            else:
                for _ in range(length):
                    pix[pos] = pix[pos - dist]
                    pos += 1
            y, x = divmod(pos, w)
        else:
            # color-cache reference; alphabet sizing guarantees the index
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            pix[pos] = cache[s - 280]
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return pix


def _decode_image(br: _BitReader, w: int, h: int) -> list[int]:
    """One entropy-coded image (transform data, meta image, palette):
    <color-cache-info><prefix-codes><lz77-coded-image> — no meta prefix
    codes at this level (spec: only the spatially-coded image has them)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color cache bits out of range")
    groups = [_read_group(br, (1 << cache_bits) if cache_bits else 0)]
    return _decode_pixels(br, w, h, groups, None, 0, 0, cache_bits)


# --------------------------------------------------------------------------
# Inverse transforms


def _avg2(a: int, b: int) -> int:
    """Per-channel (a + b) >> 1 on packed ARGB (carry-free SIMD form)."""
    return (a & b) + (((a ^ b) >> 1) & 0x7F7F7F7F)


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 add on packed ARGB."""
    lo = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    hi = ((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00
    return lo | hi


def _select(l: int, t: int, tl: int) -> int:
    pa = (l >> 24) + (t >> 24) - (tl >> 24)
    pr = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    pg = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    pb = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    dl = (
        abs(pa - (l >> 24))
        + abs(pr - ((l >> 16) & 0xFF))
        + abs(pg - ((l >> 8) & 0xFF))
        + abs(pb - (l & 0xFF))
    )
    dt = (
        abs(pa - (t >> 24))
        + abs(pr - ((t >> 16) & 0xFF))
        + abs(pg - ((t >> 8) & 0xFF))
        + abs(pb - (t & 0xFF))
    )
    return l if dl < dt else t


def _clamp_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C truncation toward zero, per the reference ClampAddSubtractHalf
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _inv_predictor(pix: list[int], w: int, h: int, bits: int, timg: list[int]) -> None:
    """In-place inverse predictor transform (spec §4.2.1): pixel =
    residual + _predict(reconstructed neighbors) mod 256 per channel.
    ``_predict`` (shared with the encoder's forward residual pass — the
    mode table is one spec table, not a dual-implementation seam) reads
    only positions < pos, which at this point hold reconstructed pixels."""
    tw = _sub(w, bits)
    pos = 0
    for y in range(h):
        trow = (y >> bits) * tw
        for x in range(w):
            mode = (timg[trow + (x >> bits)] >> 8) & 0xFF
            if mode > 13:
                raise ValueError("VP8L predictor mode out of range")
            pix[pos] = _add_px(pix[pos], _predict(pix, pos, w, mode))
            pos += 1


def _signed8(arr: np.ndarray) -> np.ndarray:
    return ((arr.astype(np.int32) ^ 0x80) - 0x80).astype(np.int32)


def _inv_color_transform(arr: np.ndarray, bits: int, timg: np.ndarray) -> np.ndarray:
    """Vectorized inverse color transform (spec §4.2.3): cte stored as
    blue=green_to_red, green=green_to_blue, red=red_to_blue; delta is
    (int8 × int8) >> 5 with the NEW red feeding red_to_blue."""
    h, w = arr.shape
    cte = timg[(np.arange(h) >> bits)[:, None], (np.arange(w) >> bits)[None, :]]
    g2r = _signed8(cte & 0xFF)
    g2b = _signed8((cte >> 8) & 0xFF)
    r2b = _signed8((cte >> 16) & 0xFF)
    g = _signed8((arr >> 8) & 0xFF)
    r = (((arr >> 16) & 0xFF).astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    rs = _signed8(r)
    b = ((arr & 0xFF).astype(np.int32) + ((g2b * g) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return (
        (arr & np.uint32(0xFF00FF00))
        | (r.astype(np.uint32) << 16)
        | b.astype(np.uint32)
    )


def _inv_subtract_green(arr: np.ndarray) -> np.ndarray:
    g = (arr >> 8) & 0xFF
    r = (((arr >> 16) & 0xFF) + g) & 0xFF
    b = ((arr & 0xFF) + g) & 0xFF
    return (arr & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inv_palette(
    arr: np.ndarray, width_bits: int, palette: np.ndarray, full_w: int
) -> np.ndarray:
    """Inverse color-indexing: unbundle packed indices (LSB-first within
    the green byte), then look up the delta-decoded palette. Out-of-range
    indices are a corrupt stream (the fixture encoder never emits them)."""
    h = arr.shape[0]
    idx = (arr >> 8) & 0xFF
    if width_bits:
        packs = 1 << width_bits
        bpp = 8 >> width_bits
        mask = (1 << bpp) - 1
        wide = np.empty((h, arr.shape[1] * packs), dtype=np.uint32)
        for k in range(packs):
            wide[:, k::packs] = (idx >> (k * bpp)) & mask
        idx = wide[:, :full_w]
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("VP8L palette index out of range")
    return palette[idx.astype(np.int64)]


def decode_webp(content: bytes) -> np.ndarray:
    """Decode a lossless WebP to (H, W, 3|4) uint8 (RGBA iff the header's
    alpha hint is set). Raises ValueError for lossy/malformed payloads —
    a classification outcome for decode_image_array."""
    payload = _find_vp8l(content)
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if h * w * 4 > MAX_WEBP_PIXEL_BYTES:
        raise ValueError(
            f"WebP decoded size {h}x{w} exceeds the "
            f"{MAX_WEBP_PIXEL_BYTES >> 20} MB micro-decoder bound"
        )
    # transforms (top-level image only); color indexing reduces the
    # working width for everything read after it
    transforms: list[tuple] = []
    seen = set()
    cur_w = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(t)
        if t == 2:
            transforms.append(("subtract_green",))
        elif t in (0, 1):
            bits = br.read(3) + 2
            timg = _decode_image(br, _sub(cur_w, bits), _sub(h, bits))
            kind = "predictor" if t == 0 else "color"
            transforms.append((kind, bits, timg, cur_w))
        else:  # 3: color indexing
            n_colors = br.read(8) + 1
            raw = _decode_image(br, n_colors, 1)
            pal = [0] * n_colors
            prev = 0
            for i, px in enumerate(raw):  # component-wise delta coding
                prev = _add_px(prev, px)
                pal[i] = prev
            width_bits = (
                3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
            )
            transforms.append(("palette", width_bits, pal, cur_w))
            if width_bits:
                cur_w = _sub(cur_w, width_bits)

    # spatially-coded image: cache, then the meta prefix image
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color cache bits out of range")
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = _sub(cur_w, meta_bits)
        raw = _decode_image(br, meta_w, _sub(h, meta_bits))
        meta = [((px >> 8) & 0xFFFF) for px in raw]
        n_groups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [_read_group(br, cache_size) for _ in range(n_groups)]
    pix = _decode_pixels(br, cur_w, h, groups, meta, meta_bits, meta_w, cache_bits)

    # inverse transforms, in reverse read order; each runs at the working
    # width current when it was read
    arr = None  # numpy view, created lazily for the vectorized inverses
    for t in reversed(transforms):
        if t[0] == "predictor":
            if arr is not None:
                pix = [int(v) for v in arr.ravel()]
                arr = None
            _inv_predictor(pix, t[3], h, t[1], t[2])
        else:
            if arr is None:
                cur = len(pix) // h
                arr = np.array(pix, dtype=np.uint32).reshape(h, cur)
            if t[0] == "subtract_green":
                arr = _inv_subtract_green(arr)
            elif t[0] == "color":
                timg = np.array(t[2], dtype=np.uint32).reshape(
                    _sub(h, t[1]), _sub(t[3], t[1])
                )
                arr = _inv_color_transform(arr, t[1], timg)
            else:  # palette
                pal = np.array(t[2], dtype=np.uint32)
                arr = _inv_palette(arr, t[1], pal, t[3])
    if arr is None:
        arr = np.array(pix, dtype=np.uint32).reshape(h, len(pix) // h)
    if arr.shape != (h, w):
        raise ValueError("VP8L transform chain yields wrong dimensions")
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if has_alpha:
        a = (arr >> 24).astype(np.uint8)
        return np.stack([r, g, b, a], axis=-1)
    return np.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# Fixture encoder — an independent forward implementation of the stream


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        if v >> nbits:
            # a value that overflows its field would bleed into the next
            # one and produce a stream that misparses far from the bug
            raise ValueError(f"bit field overflow: {v} in {nbits} bits")
        self.acc |= v << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        # prefix codes pack MSB-first into the LSB-first stream
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Depth-limited Huffman code lengths (heap merge; frequencies are
    halved and rebuilt if the depth bound is exceeded — the classic
    flattening trick, exact completeness preserved)."""
    import heapq

    if not freqs:
        raise ValueError("no symbols")
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    f = dict(freqs)
    while True:
        heap = [(weight, sym, None) for sym, weight in f.items()]
        counter = 0
        nodes: list = []
        heapq.heapify(heap)
        while len(heap) > 1:
            w1, t1, n1 = heapq.heappop(heap)
            w2, t2, n2 = heapq.heappop(heap)
            nodes.append(((t1, n1), (t2, n2)))
            counter += 1
            heapq.heappush(heap, (w1 + w2, -counter, len(nodes) - 1))
        lengths: dict[int, int] = {}
        _, root_tag, root_idx = heap[0]
        stack = [(root_tag, root_idx, 0)]
        deep = False
        while stack:
            tag, idx, depth = stack.pop()
            if idx is None:
                lengths[tag] = max(depth, 1)
                if depth > max_len:
                    deep = True
            else:
                (ta, ia), (tb, ib) = nodes[idx]
                stack.append((ta, ia, depth + 1))
                stack.append((tb, ib, depth + 1))
        if not deep:
            return lengths
        f = {s: max(1, wgt >> 1) for s, wgt in f.items()}


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical assignment, encoder formulation: sort by (length,
    symbol), assign sequential codes (must agree with the decoder's
    bl_count/next_code build — a divergence breaks round-trips)."""
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _write_code_lengths(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Transmit one prefix code and return its canonical codes. Uses the
    simple form when possible, else the normal RLE form covering the
    whole alphabet (no max_symbol — trailing zeros ride 18-runs)."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] <= 255:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        s = syms[0]
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return {s: (0, 0)}
    if len(syms) == 2 and syms[1] <= 255 and max(lengths.values()) == 1:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        s0 = syms[0]
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(syms[1], 8)
        return _canonical(lengths)
    bw.write(0, 1)  # normal form
    arr = [lengths.get(s, 0) for s in range(alphabet_size)]
    # RLE per spec: 16 = repeat previous nonzero 3-6, 17 = zeros 3-10,
    # 18 = zeros 11-138
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i = 0
    prev_nz = 8
    while i < alphabet_size:
        v = arr[i]
        run = 1
        while i + run < alphabet_size and arr[i + run] == v:
            run += 1
        if v == 0:
            left = run
            while left >= 11:
                n = min(left, 138)
                tokens.append((18, n - 11, 7))
                left -= n
            while left >= 3:
                n = min(left, 10)
                tokens.append((17, n - 3, 3))
                left -= n
            tokens.extend((0, 0, 0) for _ in range(left))
        else:
            start = 0
            if v != prev_nz:
                tokens.append((v, 0, 0))
                start = 1
            prev_nz = v
            left = run - start
            while left >= 3:
                n = min(left, 6)
                tokens.append((16, n - 3, 2))
                left -= n
            tokens.extend((v, 0, 0) for _ in range(left))
        i += run
    cl_freqs: dict[int, int] = {}
    for t, _, _ in tokens:
        cl_freqs[t] = cl_freqs.get(t, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, 7)
    cl_codes = _canonical(cl_lengths)
    if len(cl_lengths) == 1:
        # a lone CL symbol is declared with length 1; the decoder's
        # single-symbol rule reads it with zero bits
        cl_codes = {next(iter(cl_lengths)): (0, 0)}
    num_cl = max(
        (i + 1 for i, s in enumerate(_CL_ORDER) if s in cl_lengths), default=4
    )
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for s in _CL_ORDER[:num_cl]:
        bw.write(cl_lengths.get(s, 0), 3)
    bw.write(0, 1)  # no max_symbol
    for t, extra, ebits in tokens:
        c, ln = cl_codes[t]
        bw.write_code(c, ln)
        if ebits:
            bw.write(extra, ebits)
    if len(lengths) == 1:
        # a lone symbol (> 255, so the simple form couldn't carry it) is
        # declared with length 1 but read with ZERO bits per the
        # decoder's single-symbol rule — emit it the same way
        return {next(iter(lengths)): (0, 0)}
    return _canonical(lengths)


def _lz77_encode_value(v: int) -> tuple[int, int, int]:
    """value → (code, extra_bits, extra) — inverse of _lz77_value."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    e = x.bit_length() - 2
    b = (x >> e) & 1
    return 2 * e + 2 + b, e, x - ((2 + b) << e)


def _tokenize(
    pixels: list[int],
    w: int,
    cache_bits: int,
    use_lz77: bool,
    lz77_dists: tuple[int, ...] = (),
) -> list[tuple]:
    """Deterministic token stream: ('lit', px) / ('copy', length, dist) /
    ('cache', idx). The LZ77 matcher checks the two structurally common
    distances (1 = previous pixel, w = row above) plus any caller-given
    candidates — enough to exercise the decoder's copy path, the 2D map
    AND the >120 absolute-distance form, and cache interplay."""
    npix = len(pixels)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0
    out: list[tuple] = []
    pos = 0
    while pos < npix:
        if use_lz77 and pos >= 1:
            best_len = 0
            best_dist = 0
            for dist in (1, w, *lz77_dists):
                # dist + 120 must stay within the 40-code distance
                # alphabet (max value 1048576) or the stream can't be
                # expressed
                if dist == 0 or dist > pos or dist > 1048456:
                    continue
                ln = 0
                while (
                    pos + ln < npix
                    and ln < 4096
                    and pixels[pos + ln] == pixels[pos + ln - dist]
                ):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 4:
                out.append(("copy", best_len, best_dist))
                if cache is not None:
                    for i in range(pos, pos + best_len):
                        px = pixels[i]
                        cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> cshift] = px
                pos += best_len
                continue
        px = pixels[pos]
        if cache is not None:
            key = ((_HASH_MUL * px) & 0xFFFFFFFF) >> cshift
            if cache[key] == px:
                out.append(("cache", key))
                pos += 1
                continue
            cache[key] = px
        out.append(("lit", px))
        pos += 1
    return out


def _write_image(
    bw: _BitWriter,
    pixels: list[int],
    w: int,
    h: int,
    *,
    cache_bits: int = 0,
    use_lz77: bool = False,
    lz77_dists: tuple[int, ...] = (),
    meta_bits: int | None = None,
    spatial: bool = False,
) -> None:
    """One entropy-coded image. ``spatial`` adds the meta-prefix layer
    (only the top-level image may carry it)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    group_of_pos = None
    n_groups = 1
    if spatial:
        if meta_bits is not None:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw, mh = _sub(w, meta_bits), _sub(h, meta_bits)
            meta_px = [
                (0xFF << 24) | (((bx + by) % 2) << 8)
                for by in range(mh)
                for bx in range(mw)
            ]
            _write_image(bw, meta_px, mw, mh)
            meta_idx = [((px >> 8) & 0xFFFF) for px in meta_px]
            # the decoder sizes the group list from the max index PRESENT
            # (a 1-block meta image references only group 0) — emit
            # exactly that many groups or the streams desync
            n_groups = max(meta_idx) + 1
            group_of_pos = [
                meta_idx[
                    ((pos % w) >> meta_bits)
                    + ((pos // w) >> meta_bits) * mw
                ]
                for pos in range(w * h)
            ]
        else:
            bw.write(0, 1)

    tokens = _tokenize(pixels, w, cache_bits, use_lz77, lz77_dists)
    cache_size = (1 << cache_bits) if cache_bits else 0
    galpha = 256 + 24 + cache_size

    # frequency pass, per group
    gfreq = [dict() for _ in range(n_groups)]
    rfreq = [dict() for _ in range(n_groups)]
    bfreq = [dict() for _ in range(n_groups)]
    afreq = [dict() for _ in range(n_groups)]
    dfreq = [dict() for _ in range(n_groups)]

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    pos = 0
    for tok in tokens:
        gi = group_of_pos[pos] if group_of_pos is not None else 0
        if tok[0] == "lit":
            px = tok[1]
            bump(gfreq[gi], (px >> 8) & 0xFF)
            bump(rfreq[gi], (px >> 16) & 0xFF)
            bump(bfreq[gi], px & 0xFF)
            bump(afreq[gi], px >> 24)
            pos += 1
        elif tok[0] == "copy":
            lcode, _, _ = _lz77_encode_value(tok[1])
            bump(gfreq[gi], 256 + lcode)
            dval = _dist_to_val(tok[2], w)
            dcode, _, _ = _lz77_encode_value(dval)
            bump(dfreq[gi], dcode)
            pos += tok[1]
        else:
            bump(gfreq[gi], 280 + tok[1])
            pos += 1

    codes = []
    for gi in range(n_groups):
        row = []
        for freqs, alpha in (
            (gfreq[gi], galpha),
            (rfreq[gi], 256),
            (bfreq[gi], 256),
            (afreq[gi], 256),
            (dfreq[gi], 40),
        ):
            if not freqs:
                freqs = {0: 1}  # unused code: 1-symbol placeholder
            lengths = _huffman_lengths(freqs, 15)
            row.append(_write_code_lengths(bw, lengths, alpha))
        codes.append(row)

    pos = 0
    for tok in tokens:
        gi = group_of_pos[pos] if group_of_pos is not None else 0
        gc, rc, bc, ac, dc = codes[gi]
        if tok[0] == "lit":
            px = tok[1]
            c, ln = gc[(px >> 8) & 0xFF]
            bw.write_code(c, ln)
            c, ln = rc[(px >> 16) & 0xFF]
            bw.write_code(c, ln)
            c, ln = bc[px & 0xFF]
            bw.write_code(c, ln)
            c, ln = ac[px >> 24]
            bw.write_code(c, ln)
            pos += 1
        elif tok[0] == "copy":
            lcode, ebits, extra = _lz77_encode_value(tok[1])
            c, ln = gc[256 + lcode]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
            dval = _dist_to_val(tok[2], w)
            dcode, ebits, extra = _lz77_encode_value(dval)
            c, ln = dc[dcode]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
            pos += tok[1]
        else:
            c, ln = gc[280 + tok[1]]
            bw.write_code(c, ln)
            pos += 1


_DIST_TO_PLANE_CACHE: dict[int, dict[int, int]] = {}


def _dist_to_val(dist: int, w: int) -> int:
    """Scalar distance → 2D plane code when one maps to it (first match
    in table order, mirroring the decoder's deterministic mapping), else
    the absolute form dist + 120."""
    m = _DIST_TO_PLANE_CACHE.get(w)
    if m is None:
        m = {}
        for i, (dx, dy) in enumerate(_DIST_MAP):
            d = max(dy * w + dx, 1)
            if d >= 1 and d not in m:
                m[d] = i + 1
        _DIST_TO_PLANE_CACHE[w] = m
        if len(_DIST_TO_PLANE_CACHE) > 64:
            _DIST_TO_PLANE_CACHE.clear()
            _DIST_TO_PLANE_CACHE[w] = m
    return m.get(dist, dist + 120)


# forward predictors need the same helpers the decoder uses; the forward
# RESIDUAL computation below is still independent of the decoder's
# reconstruction loop (it subtracts where the decoder adds)


def _sub_px(a: int, b: int) -> int:
    lo = ((a | 0x01000100) - (b & 0x00FF00FF)) & 0x00FF00FF
    hi = (((a >> 8) | 0x01000100) - ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF
    return lo | (hi << 8)


def _predict(pix: list[int], pos: int, w: int, mode: int) -> int:
    y, x = divmod(pos, w)
    if pos == 0:
        return 0xFF000000
    if y == 0:
        return pix[pos - 1]
    if x == 0:
        return pix[pos - w]
    lpx = pix[pos - 1]
    t = pix[pos - w]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return lpx
    if mode == 2:
        return t
    if mode == 3:
        return pix[pos - w + 1]
    if mode == 4:
        return pix[pos - w - 1]
    if mode == 5:
        return _avg2(_avg2(lpx, pix[pos - w + 1]), t)
    if mode == 6:
        return _avg2(lpx, pix[pos - w - 1])
    if mode == 7:
        return _avg2(lpx, t)
    if mode == 8:
        return _avg2(pix[pos - w - 1], t)
    if mode == 9:
        return _avg2(t, pix[pos - w + 1])
    if mode == 10:
        return _avg2(_avg2(lpx, pix[pos - w - 1]), _avg2(t, pix[pos - w + 1]))
    if mode == 11:
        return _select(lpx, t, pix[pos - w - 1])
    if mode == 12:
        return _clamp_full(lpx, t, pix[pos - w - 1])
    return _clamp_half(_avg2(lpx, t), pix[pos - w - 1])


def encode_webp(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor: tuple[int, object] | None = None,
    color_transform: tuple[int, tuple[int, int, int]] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = False,
    lz77_dists: tuple[int, ...] = (),
    meta_bits: int | None = None,
) -> bytes:
    """Minimal lossless-WebP writer from (H, W, 3|4) uint8 pixels.

    ``predictor`` is (block_bits, mode) where mode is an int (one mode
    for every block) or "mixed" ((bx + by) % 14 per block, exercising
    every predictor). ``color_transform`` is (block_bits, (g2r, g2b,
    r2b)) signed int8 deltas applied uniformly. ``palette`` bundles
    automatically when the distinct-color count allows. Transforms are
    written (and applied forward) in the order palette → subtract_green
    → predictor → color_transform; palette excludes the other pixel
    transforms (the realistic encoder split)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    h, w, ch = arr.shape
    if ch not in (3, 4) or h == 0 or w == 0:
        raise ValueError("encode_webp takes (H, W, 3|4) nonempty pixels")
    if w > 0x4000 or h > 0x4000:
        raise ValueError("VP8L dimensions cap at 16384")
    if palette and (subtract_green or predictor or color_transform):
        raise ValueError("palette excludes the other pixel transforms")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits must be in [0, 11]")
    if meta_bits is not None and not 2 <= meta_bits <= 9:
        raise ValueError("meta_bits must be in [2, 9]")
    a = (
        arr[:, :, 3].astype(np.uint32)
        if ch == 4
        else np.full((h, w), 255, dtype=np.uint32)
    )
    px = (
        (a << 24)
        | (arr[:, :, 0].astype(np.uint32) << 16)
        | (arr[:, :, 1].astype(np.uint32) << 8)
        | arr[:, :, 2].astype(np.uint32)
    )
    pixels = [int(v) for v in px.ravel()]

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)
    bw.write(0, 3)  # version

    cur_w = w
    if palette:
        colors = sorted(set(pixels))
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)
        n_colors = len(colors)
        bw.write(n_colors - 1, 8)
        # component-wise delta coding of the palette
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_px(c, prev))
            prev = c
        _write_image(bw, deltas, n_colors, 1)
        index_of = {c: i for i, c in enumerate(colors)}
        idx = [index_of[v] for v in pixels]
        width_bits = (
            3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
        )
        if width_bits:
            packs = 1 << width_bits
            bpp = 8 >> width_bits
            new_w = _sub(w, width_bits)
            packed = [0] * (new_w * h)
            for y in range(h):
                for x in range(w):
                    packed[y * new_w + (x >> width_bits)] |= idx[y * w + x] << (
                        (x % packs) * bpp
                    )
            pixels = [(0xFF << 24) | (v << 8) for v in packed]
            cur_w = new_w
        else:
            pixels = [(0xFF << 24) | (v << 8) for v in idx]
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        pixels = [
            (p & 0xFF00FF00)
            | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
            | ((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF
            for p in pixels
        ]
    if predictor is not None:
        bits, mode = predictor
        if not 2 <= bits <= 9:
            raise ValueError("predictor block bits must be in [2, 9]")
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        tw, th = _sub(cur_w, bits), _sub(h, bits)
        modes = [
            ((bx + by) % 14 if mode == "mixed" else int(mode))
            for by in range(th)
            for bx in range(tw)
        ]
        timg = [(0xFF << 24) | (m << 8) for m in modes]
        _write_image(bw, timg, tw, th)
        # forward: residual = pixel - predict(ORIGINAL neighbors)
        res = [0] * len(pixels)
        for pos in range(len(pixels)):
            y, x = divmod(pos, cur_w)
            m = modes[(y >> bits) * tw + (x >> bits)]
            res[pos] = _sub_px(pixels[pos], _predict(pixels, pos, cur_w, m))
        pixels = res
    if color_transform is not None:
        bits, (g2r, g2b, r2b) = color_transform
        if not 2 <= bits <= 9:
            raise ValueError("color-transform block bits must be in [2, 9]")
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        tw, th = _sub(cur_w, bits), _sub(h, bits)
        cte = (
            (0xFF << 24)
            | ((r2b & 0xFF) << 16)
            | ((g2b & 0xFF) << 8)
            | (g2r & 0xFF)
        )
        _write_image(bw, [cte] * (tw * th), tw, th)

        def delta(t: int, c: int) -> int:
            ts = t - 256 if t > 127 else t
            cs = c - 256 if c > 127 else c
            return (ts * cs) >> 5

        res = []
        for p in pixels:
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            nr = (r - delta(g2r & 0xFF, g)) & 0xFF
            nb = (b - delta(g2b & 0xFF, g) - delta(r2b & 0xFF, r)) & 0xFF
            res.append((p & 0xFF00FF00) | (nr << 16) | nb)
        pixels = res
    bw.write(0, 1)  # end of transforms

    _write_image(
        bw,
        pixels,
        cur_w,
        h,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        lz77_dists=lz77_dists,
        meta_bits=meta_bits,
        spatial=True,
    )
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
