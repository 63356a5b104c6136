"""Pure-stdlib/numpy FLAC frame DECODER + independent fixture ENCODER for
the multimodal audio path (VERDICT r11 #3) — built from the PUBLIC FLAC
format spec (RFC 9639 / xiph.org format docs) only, the jpegcodec
discipline applied to audio: an independent encoder generates fixtures, the
decoder must reproduce input PCM bit-exactly, and the M4/M5 feature
operators (pcm/spectral windows) gain compressed-audio coverage.

Scope (the overwhelming majority of real FLAC streams):
- STREAMINFO parse (shared contract with audiocodec.sniff_flac_meta);
- frame headers: fixed + variable blocking, all block-size/sample-rate
  codes incl. end-of-header widths, UTF-8-coded frame/sample numbers,
  CRC-8 verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + shift), wasted-bits unary prefix;
- residuals: partitioned Rice, both 4-bit (method 0) and 5-bit (method 1)
  parameters, escape-coded raw partitions;
- channel assignments: independent, left/side, right/side, mid/side
  (side channels carry bps+1 bits per spec);
- frame CRC-16 verified.

Sample widths 8/16/24 bits (the corpus cases). Never trusts a length
field: every read is bounds-checked, total decoded samples are capped by
MAX_DECODED_SAMPLES (the imagecodec MAX_DECODED_BYTES discipline), and any
malformation raises ValueError — callers classify, never crash.

The ENCODER is the independent twin (not an inverse transcription): it
chooses Rice parameters from residual statistics, supports all four
channel modes, verbatim/constant/fixed/LPC strategies, multi-partition
residuals, and optional wasted-bits emission — so decoder paths the
"happy" encoder wouldn't reach stay tested.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_DECODED_SAMPLES = 64 << 20  # per payload, all channels: classify, don't OOM

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 init 0 over the frame header, CRC-16 poly
# 0x8005 init 0 over the whole frame incl. header)

def _make_crc8_table():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16_table():
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, the FLAC bit order)

class _BitReader:
    __slots__ = ("data", "pos", "n")  # pos in BITS

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8
        self.n = len(data) * 8

    def read(self, bits: int) -> int:
        if bits == 0:
            return 0
        if self.pos + bits > self.n:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self.pos
        data = self.data
        remaining = bits
        while remaining:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail <= remaining else remaining
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.pos = pos
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def read_unary(self, limit: int = 1 << 20) -> int:
        """Count of 0 bits before the terminating 1 bit (FLAC's unary)."""
        q = 0
        pos = self.pos
        n = self.n
        data = self.data
        while True:
            if pos >= n:
                raise ValueError("FLAC bitstream truncated in unary run")
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            chunk = byte & ((1 << avail) - 1)
            if chunk == 0:
                q += avail
                pos += avail
            else:
                lead = avail - chunk.bit_length()
                q += lead
                pos += lead + 1
                break
            if q > limit:
                raise ValueError("FLAC unary run exceeds sanity bound")
        self.pos = pos
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (FLAC frame/sample numbers use the UTF-8 scheme
# extended to 36 bits / 7 bytes)

def _read_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    ones = 0
    while (b0 << ones) & 0x80:
        ones += 1
    if ones == 1 or ones > 7:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0x7F >> ones)
    for _ in range(ones - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_coded_number(w: _BitWriter, v: int):
    if v < 0x80:
        w.write(v, 8)
        return
    # choose the shortest multi-byte form
    for nbytes in range(2, 8):
        if v < (1 << (6 * (nbytes - 1) + (7 - nbytes))):
            break
    else:
        raise ValueError("coded number out of range")
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | (v >> (6 * (nbytes - 1)))
    w.write(lead, 8)
    for i in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


# ---------------------------------------------------------------------------
# STREAMINFO

def parse_streaminfo(content: bytes):
    """(rate, n_channels, bits, total_samples, first_frame_offset).
    Walks the metadata chain (bounded) to the first audio frame."""
    if content[:4] != b"fLaC" or len(content) < 4 + 4 + 34:
        raise ValueError("not a FLAC payload")
    btype = content[4] & 0x7F
    blen = int.from_bytes(content[5:8], "big")
    if btype != 0 or blen < 34:
        raise ValueError("FLAC missing mandatory STREAMINFO")
    si = content[8 : 8 + 34]
    packed = int.from_bytes(si[10:18], "big")
    rate = (packed >> 44) & 0xFFFFF
    n_ch = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & 0xFFFFFFFFF
    if rate == 0:
        raise ValueError("FLAC STREAMINFO rate 0")
    off = 4
    for _ in range(1024):
        if off + 4 > len(content):
            raise ValueError("FLAC metadata chain truncated")
        last = bool(content[off] & 0x80)
        bl = int.from_bytes(content[off + 1 : off + 4], "big")
        off += 4 + bl
        if off > len(content):
            raise ValueError("FLAC metadata chain truncated")
        if last:
            return rate, n_ch, bits, total, off
    raise ValueError("FLAC metadata chain too long")


# ---------------------------------------------------------------------------
# Decoder

def _decode_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if block_size % (1 << po) != 0:
        raise ValueError("FLAC partition order does not divide block size")
    res: list[int] = []
    for p in range(1 << po):
        n = block_size // (1 << po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition shorter than predictor order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw == 0:
                res.extend([0] * n)
            else:
                res.extend(r.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                res.append((u >> 1) ^ -(u & 1))  # zigzag
    return res


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("FLAC subframe pad bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        if wasted >= bps:
            raise ValueError("FLAC wasted bits exceed sample width")
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (r.read_signed(eff) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        if order > block_size:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        out_l = warm + [0] * len(res)
        for i in range(len(res)):
            pos = order + i
            pred = sum(c * out_l[pos - 1 - j] for j, c in enumerate(coefs))
            out_l[pos] = pred + res[i]
        out = np.array(out_l, dtype=np.int64)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        if order > block_size:
            raise ValueError("FLAC LPC order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:  # 0b1111 is invalid per spec
            raise ValueError("invalid FLAC LPC precision code")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        out_l = warm + [0] * len(res)
        for i in range(len(res)):
            pos = order + i
            acc = sum(c * out_l[pos - 1 - j] for j, c in enumerate(coefs))
            out_l[pos] = (acc >> shift) + res[i]
        out = np.array(out_l, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(content: bytes):
    """(rate, n_channels, bits, samples) — samples is an
    (n_frames, n_channels) int32 array reproducing the encoder's input
    bit-exactly (FLAC is lossless). Raises ValueError on anything
    malformed, truncated, CRC-failing, or over the sample budget."""
    rate, n_ch, bits, total, off = parse_streaminfo(content)
    if bits not in (8, 12, 16, 20, 24):
        raise ValueError(f"unsupported FLAC bit depth {bits}")
    if total and total * n_ch > MAX_DECODED_SAMPLES:
        raise ValueError("FLAC total samples exceed the decode budget")
    parts: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    decoded = 0
    r = _BitReader(content, off)
    while r.byte_pos() < len(content):
        frame_start = r.byte_pos()
        if r.read(14) != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        if r.read(1) != 0:
            raise ValueError("FLAC frame reserved bit set")
        _variable = r.read(1)
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1) != 0:
            raise ValueError("FLAC frame reserved bit set")
        _num = _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        bps = bits if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise ValueError("reserved FLAC sample size code")
        hdr_end = r.byte_pos()
        if crc8(content[frame_start:hdr_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        decoded += block_size * n_ch
        if decoded > MAX_DECODED_SAMPLES:
            raise ValueError("FLAC decode exceeds the sample budget")
        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            sub = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC stereo decorrelation on non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(r, block_size, bps)
                side = _decode_subframe(r, block_size, bps + 1)
                sub = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(r, block_size, bps + 1)
                right = _decode_subframe(r, block_size, bps)
                sub = [side + right, right]
            else:  # mid/side
                mid = _decode_subframe(r, block_size, bps)
                side = _decode_subframe(r, block_size, bps + 1)
                m2 = (mid << 1) | (side & 1)
                sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        r.align()
        fcrc = r.read(16)
        if crc16(content[frame_start : r.byte_pos() - 2]) != fcrc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(n_ch):
            parts[c].append(sub[c])
        # trailing garbage vs next frame: peek — anything but a sync is an
        # error unless we've consumed the whole payload
        if r.byte_pos() >= len(content):
            break
    chans = [np.concatenate(p) if p else np.empty(0, np.int64) for p in parts]
    n = min(len(c) for c in chans)
    lim = 1 << (bits - 1)
    samples = np.stack([c[:n] for c in chans], axis=1)
    if samples.size and (samples.max() >= lim or samples.min() < -lim):
        raise ValueError("FLAC decoded samples exceed declared bit depth")
    if total and n != total:
        raise ValueError("FLAC decoded sample count != STREAMINFO total")
    return rate, n_ch, bits, samples.astype(np.int32)


# ---------------------------------------------------------------------------
# Encoder (independent fixture generator)

def _rice_param(res: np.ndarray, pbits: int) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res).mean())
    p = 0
    while (1 << p) < mean + 1 and p < (1 << pbits) - 2:
        p += 1
    return p


def _encode_residual(w: _BitWriter, res: np.ndarray, block_size: int,
                     order: int, partition_order: int, method: int):
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(partition_order, 4)
    idx = 0
    for p in range(1 << partition_order):
        n = block_size // (1 << partition_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError(
                "first Rice partition shorter than the predictor order — "
                "caller must fit the partition order (_fit_partition_order)"
            )
        part = res[idx : idx + n]
        idx += n
        u = (np.abs(part.astype(object)) * 2 - (part < 0)).astype(object)
        param = _rice_param(part, pbits)
        # escape to raw if rice would explode (huge residuals)
        max_u = int(max(u)) if n else 0
        if param < escape and (max_u >> param) <= 1 << 16:
            w.write(param, pbits)
            for uv in u:
                w.write_unary(int(uv) >> param)
                w.write(int(uv), param)
        else:
            raw = max(int(part.max() if n else 0).bit_length() + 1,
                      int(part.min() if n else 0).bit_length() + 1, 1)
            w.write(escape, pbits)
            w.write(raw, 5)
            for v in part:
                w.write(int(v), raw)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int, strategy: str,
                     partition_order: int, method: int, wasted: int = 0):
    block_size = len(x)
    x_orig = x
    if wasted:
        if np.any(x & ((1 << wasted) - 1)):
            raise ValueError("wasted-bit encode requires low bits zero")
        x = x >> wasted
        bps_eff = bps - wasted
    else:
        bps_eff = bps
    const = block_size > 0 and bool(np.all(x == x[0]))
    if strategy == "constant" and not const:
        raise ValueError("constant strategy on non-constant block")
    if const and strategy in ("constant", "auto"):
        w.write(0, 1)
        w.write(0, 6)
        _write_wasted(w, wasted)
        w.write(int(x[0]), bps_eff)
        return
    if strategy == "auto":
        strategy = "fixed2" if block_size >= 3 else "verbatim"
    if strategy == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        _write_wasted(w, wasted)
        for v in x:
            w.write(int(v), bps_eff)
        return
    if strategy.startswith("fixed"):
        order = int(strategy[5:]) if len(strategy) > 5 else 2
        order = min(order, block_size)
        po = _fit_partition_order(partition_order, block_size, order)
        w.write(0, 1)
        w.write(8 + order, 6)
        _write_wasted(w, wasted)
        for v in x[:order]:
            w.write(int(v), bps_eff)
        coefs = _FIXED_COEFS[order]
        res = x[order:].astype(np.int64).copy()
        for j, c in enumerate(coefs):
            res -= c * x[order - 1 - j : block_size - 1 - j].astype(np.int64)
        _encode_residual(w, res, block_size, order, po, method)
        return
    if strategy == "lpc":
        order = min(2, block_size)
        if order < 2:
            # too short for the fixed-coefficient LPC: verbatim fallback.
            # Recurse on the UNSHIFTED samples with the wasted flag intact
            # — recursing on the shifted x without it silently emitted
            # right-shifted PCM (r12 review finding).
            return _encode_subframe(w, x_orig, bps, "verbatim",
                                    partition_order, method, wasted)
        # deterministic quantized coefficients approximating a gentle
        # 2nd-order predictor: (1.5, -0.5) at shift 1 -> (3, -1) >> 1
        coefs, shift, prec = [3, -1], 1, 4
        w.write(0, 1)
        w.write(32 + (order - 1), 6)
        _write_wasted(w, wasted)
        for v in x[:order]:
            w.write(int(v), bps_eff)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, prec)
        res = []
        xi = x.astype(np.int64)
        for i in range(order, block_size):
            acc = sum(c * int(xi[i - 1 - j]) for j, c in enumerate(coefs))
            res.append(int(xi[i]) - (acc >> shift))
        _encode_residual(w, np.array(res, dtype=np.int64), block_size,
                         order, _fit_partition_order(partition_order,
                                                     block_size, order),
                         method)
        return
    raise ValueError(f"unknown subframe strategy {strategy!r}")


def _fit_partition_order(po: int, block_size: int, order: int) -> int:
    """Largest usable partition order ≤ po: it must divide block_size AND
    leave the first partition at least `order` samples — a po that passed
    the divisibility check alone let a short trailing frame emit a
    NEGATIVE-length first partition (undecodable stream, r12 review
    finding)."""
    while po and (block_size % (1 << po) != 0
                  or block_size // (1 << po) < order):
        po -= 1
    return po


def _write_wasted(w: _BitWriter, wasted: int):
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)


def encode_flac(
    samples: np.ndarray,
    rate: int = 44100,
    bits: int = 16,
    block_size: int = 1024,
    strategy: str = "auto",
    channel_mode: str = "independent",
    partition_order: int = 0,
    rice_method: int = 0,
    wasted: int = 0,
) -> bytes:
    """Independent FLAC encoder for fixtures. ``samples`` is
    (n_frames,) or (n_frames, n_channels) int. strategy: auto | verbatim |
    constant | fixed0..fixed4 | lpc. channel_mode: independent |
    left_side | right_side | mid_side (stereo only)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    lim = 1 << (bits - 1)
    if x.size and (x.max() >= lim or x.min() < -lim):
        raise ValueError("samples exceed the declared bit depth")
    if channel_mode != "independent" and n_ch != 2:
        raise ValueError("stereo decorrelation requires 2 channels")
    if not 0 <= partition_order <= 6:
        raise ValueError("partition order out of the encoder's range")

    out = bytearray(b"fLaC")
    packed = (
        (rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | (n & 0xFFFFFFFFF)
    )
    si = (
        struct.pack(">HH", max(16, min(block_size, n or block_size)), block_size)
        + b"\x00" * 6
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si

    eff_strategy = strategy
    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bs = len(blk)
        po = partition_order
        while po and bs % (1 << po) != 0:
            po -= 1
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit block size - 1 at end of header
        w.write(0, 4)  # rate: from STREAMINFO
        if channel_mode == "independent":
            w.write(n_ch - 1, 4)
        else:
            w.write({"left_side": 8, "right_side": 9, "mid_side": 10}[channel_mode], 4)
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits]
        w.write(bps_code, 3)
        w.write(0, 1)
        _write_coded_number(w, frame_no)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(b, 8)
        w2.write(crc8(hdr), 8)
        if channel_mode == "independent":
            for c in range(n_ch):
                _encode_subframe(w2, blk[:, c], bits, eff_strategy, po,
                                 rice_method, wasted)
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            # wasted bits forward to left/right/side (low-zero bits of both
            # inputs survive a subtraction) but NOT to mid: (l+r)>>1 keeps
            # only wasted-1 zero bits — raise rather than silently ignore
            # the flag (r12 review finding: the fixture API claimed decoder
            # coverage it never exercised)
            if channel_mode == "left_side":
                _encode_subframe(w2, left, bits, eff_strategy, po,
                                 rice_method, wasted)
                _encode_subframe(w2, side, bits + 1, eff_strategy, po,
                                 rice_method, wasted)
            elif channel_mode == "right_side":
                _encode_subframe(w2, side, bits + 1, eff_strategy, po,
                                 rice_method, wasted)
                _encode_subframe(w2, right, bits, eff_strategy, po,
                                 rice_method, wasted)
            else:  # mid_side
                if wasted:
                    raise ValueError(
                        "wasted-bit emission is not supported with mid_side "
                        "(the mid channel keeps only wasted-1 zero bits); "
                        "use left_side/right_side to exercise the side-"
                        "channel wasted-bits decode path"
                    )
                mid = (left + right) >> 1
                _encode_subframe(w2, mid, bits, eff_strategy, po, rice_method)
                _encode_subframe(w2, side, bits + 1, eff_strategy, po, rice_method)
        w2.align()
        body = w2.bytes()
        w3 = _BitWriter()
        for b in body:
            w3.write(b, 8)
        w3.write(crc16(body), 16)
        out += w3.bytes()
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Feature-path adapters (the wav_mono_f64 contract for FLAC payloads)

def is_flac(content: bytes) -> bool:
    return len(content) >= 8 and content[:4] == b"fLaC"


def flac_pcm16(content: bytes):
    """(rate, samples int16 (n, ch)) for a FLAC payload, rescaled to the
    16-bit range the feature kernels expect (8-bit shifts up, 24-bit
    shifts down — same scale as a WAV transcode of the same audio).
    Raises ValueError on malformed payloads (callers classify+skip)."""
    rate, _ch, bits, samples = decode_flac(content)
    if bits == 16:
        s16 = samples
    elif bits < 16:
        s16 = samples << (16 - bits)
    else:
        s16 = samples >> (bits - 16)
    return rate, s16.astype(np.int16)
