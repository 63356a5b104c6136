"""Pure-stdlib RIFF/WAVE micro-parser (PCM16) for the multimodal audio
path — the audio counterpart of functions/imagecodec.py, built from the
public RIFF/WAVE layout only (no torchaudio/ffmpeg in this container).

Scope: canonical WAV files carrying uncompressed integer PCM (format tag 1)
at 16 bits per sample, any channel count/rate. Anything else raises
ValueError and callers fall back to treating the payload as raw PCM16
bytes (operators/multimodal.pcm_window_features's historical contract).
Real pipelines with ffmpeg installed decode compressed containers upstream;
this parser makes the overwhelmingly-common corpus case (plain .wav dumps)
work end-to-end with zero dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

# Bound on the DECODED sample bytes — same executor-safety discipline as
# imagecodec.MAX_DECODED_BYTES: a absurd header must classify, not allocate.
MAX_DATA_BYTES = 256 << 20


def is_wav(content: bytes) -> bool:
    return (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    )


def parse_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, samples) for a PCM16 WAV payload.

    ``samples`` is an (n_frames, n_channels) int16 array (little-endian,
    interleaved frames de-interleaved). Trailing bytes short of a full
    frame are dropped, mirroring pcm_window_features's raw-PCM handling."""
    if not is_wav(content):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        ctype = content[pos : pos + 4]
        (length,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + length]
        if ctype == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            if length > MAX_DATA_BYTES:
                raise ValueError(
                    f"WAV data chunk {length} bytes exceeds the "
                    f"{MAX_DATA_BYTES >> 20} MB micro-parser bound"
                )
            if len(body) != length:
                raise ValueError("truncated WAV data chunk")
            data = body
        # chunks are word-aligned: odd lengths carry a pad byte
        pos += 8 + length + (length & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format tag {audio_format} (only PCM)")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (only 16)")
    if n_channels == 0 or sample_rate == 0:
        raise ValueError("WAV with zero channels or sample rate")
    frame_bytes = 2 * n_channels
    n_frames = len(data) // frame_bytes
    samples = np.frombuffer(
        data[: n_frames * frame_bytes], dtype="<i2"
    ).reshape(n_frames, n_channels)
    return sample_rate, n_channels, samples


def wav_mono_f64(content: bytes) -> np.ndarray | None:
    """Mono float64 samples in [-1, 1) for WAV payloads; None when the
    payload isn't a parseable PCM16 WAV. Callers must treat None for a
    payload that IS RIFF/WAVE (is_wav true) as "unsupported encoding —
    skip", never as license to reinterpret the container bytes as raw
    PCM16 (header + non-int16 samples would fabricate plausible garbage
    features). Multi-channel audio downmixes by channel mean — the
    standard corpus-filtering choice (energy/ZCR gates care about the
    mixture, not the stereo image). Accepts any bytes-like buffer."""
    try:
        _rate, _ch, samples = parse_wav(content)
    except (ValueError, struct.error):
        return None
    return (samples.astype(np.float64) / 32768.0).mean(axis=1)


# ---------------------------------------------------------------------------
# Header sniffing — format parameters + duration WITHOUT touching sample
# data, the audio counterpart of imagecodec.sniff_image_meta: inventory a
# mixed corpus (rate/channel/duration distributions, non-PCM detection) at
# header cost. Unlike parse_wav this REPORTS non-PCM/non-16-bit files
# (format_tag/bits tell the caller what they are) instead of raising.

# chunk-walk bound: real WAVs carry a handful of chunks; a hostile blob of
# millions of zero-length chunks must not cost O(payload/8) iterations
_MAX_CHUNKS = 256


def sniff_wav_meta(content: bytes) -> dict | None:
    """(format_tag, n_channels, sample_rate, bits, data_bytes,
    duration_sec) from the RIFF chunk headers alone. ``duration_sec`` is
    computed from the declared data length and fmt parameters (None when
    they don't define a positive frame size). Returns None for non-WAV,
    truncated-before-fmt, or nonsense-parameter payloads; never raises on
    arbitrary bytes (fuzz-tested)."""
    b = content or b""
    try:
        if not is_wav(b):
            return None
        pos, fmt, data_len = 12, None, None
        for _ in range(_MAX_CHUNKS):
            if pos + 8 > len(b):
                break
            ctype = b[pos : pos + 4]
            (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            if ctype == b"fmt " and length >= 16 and pos + 24 <= len(b):
                fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
            elif ctype == b"data":
                # header truth, clamped to what the payload actually holds
                # (a truncated upload must not claim its declared length)
                data_len = min(length, max(0, len(b) - pos - 8))
            pos += 8 + length + (length & 1)
        if fmt is None:
            return None
        tag, n_ch, rate, byte_rate, _align, bits = fmt
        # rate is a uint32 field: values past int32 are hostile/corrupt and
        # would crash the Int32 meta columns downstream (the imagecodec
        # _checked lesson) — reject, don't propagate
        if n_ch == 0 or rate == 0 or rate > 0x7FFFFFFF:
            return None
        # duration from the declared average byte rate — the spec's own
        # definition, correct for non-byte-aligned bit depths AND for
        # compressed tags where bits//8-based frame math is meaningless
        duration = (
            (data_len / byte_rate)
            if data_len is not None and 0 < byte_rate <= 0x7FFFFFFF
            else None
        )
        return {
            "format_tag": tag,
            "n_channels": n_ch,
            "sample_rate": rate,
            "bits": bits,
            "data_bytes": data_len,
            "duration_sec": duration,
        }
    except Exception:
        return None


# ---------------------------------------------------------------------------
# MP3 / FLAC header sniffing (r11): real web audio is MPEG and FLAC, not
# WAV — the inventory path gets both at header cost, same never-raise
# contract. No sample decode (that's codec work a real cluster does with
# ffmpeg upstream); this is the mp4codec argument applied to audio.

# MPEG-1/2/2.5 Layer III tables (ISO 11172-3 / 13818-3)
_MP3_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}
_MP3_SYNC_SCAN = 4096  # a real file's first frame sits at/near the front


def _id3v2_size(b: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Syncsafe size."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    s = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + s


def _mp3_frame_params(b: bytes, pos: int):
    """Parse and validate one Layer III frame header at pos. Returns
    (version, rate, kbps, mono, frame_len) or None if the 4 bytes at pos
    are not a valid MPEG-1/2/2.5 Layer III header."""
    if pos + 4 > len(b):
        return None
    if b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = b[pos + 1], b[pos + 2], b[pos + 3]
    version = (b1 >> 3) & 3  # 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
    layer = (b1 >> 1) & 3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b2 >> 4) & 15
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / reserved: can't size
    rate = _MP3_RATES[version][sr_idx]
    kbps = (_MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2)[br_idx]
    mono = ((b3 >> 6) & 3) == 3
    padding = (b2 >> 1) & 1
    # Layer III frame length: spf/8 * bitrate / rate + padding
    # (144·kbps·1000/rate for MPEG1, 72 for MPEG2/2.5 — ISO 11172-3 §2.4.3.1)
    coef = 144 if version == 3 else 72
    frame_len = coef * kbps * 1000 // rate + padding
    if frame_len < 24:  # degenerate (e.g. 8 kbps @ 24 kHz is 24 bytes)
        return None
    return version, rate, kbps, mono, frame_len


def sniff_mp3_meta(content: bytes) -> dict | None:
    """MPEG Layer III stream parameters from the first frame header
    (after any ID3v2 tag): channels, sample rate, duration — EXACT when a
    Xing/Info VBR header carries the frame count, else the CBR estimate
    from the first frame's bitrate (documented approximation). Layer I/II
    and reserved fields return None (not mp3). Never raises.

    A candidate sync is accepted only if a SECOND valid frame header with
    the same version/sample-rate sits exactly at pos + frame_length (or the
    payload ends within one frame + ID3v1-tag slack) — an 11-bit sync alone
    misclassified ~10% of random blobs as mp3 (ADVICE r11)."""
    try:
        b = content or b""
        start = _id3v2_size(b)
        if start >= len(b) or start > 1 << 28:
            return None
        # bounded scan for the frame sync; each candidate must be confirmed
        # by a consecutive second header before it is accepted
        end = min(len(b) - 3, start + _MP3_SYNC_SCAN)
        pos, params = -1, None
        for i in range(start, end):
            p = _mp3_frame_params(b, i)
            if p is None:
                continue
            version_i, rate_i, _, _, flen_i = p
            nxt = i + flen_i
            p2 = _mp3_frame_params(b, nxt)
            ok = p2 is not None and p2[0] == version_i and p2[1] == rate_i
            if not ok:
                # single-frame payload: everything after the header must fit
                # in this one frame, plus slack for a 128-byte ID3v1 trailer
                ok = len(b) - i <= flen_i + 132
            if ok:
                pos, params = i, p
                break
        if pos < 0:
            return None
        version, rate, kbps, mono, _ = params
        n_ch = 1 if mono else 2
        spf = 1152 if version == 3 else 576  # samples per Layer III frame
        audio_bytes = len(b) - pos

        # Xing/Info (VBR) header: side-info offset depends on version/mode
        side = (17 if mono else 32) if version == 3 else (9 if mono else 17)
        xoff = pos + 4 + side
        duration = None
        if b[xoff : xoff + 4] in (b"Xing", b"Info") and len(b) >= xoff + 12:
            flags = struct.unpack(">I", b[xoff + 4 : xoff + 8])[0]
            if flags & 1:
                frames = struct.unpack(">I", b[xoff + 8 : xoff + 12])[0]
                if 0 < frames <= 0x7FFFFFFF:
                    duration = frames * spf / rate
        if duration is None:
            duration = audio_bytes * 8 / (kbps * 1000)
        if not 0 <= duration <= 1e9:
            return None
        return {
            "format": "mp3",
            "format_tag": None,
            "n_channels": n_ch,
            "sample_rate": rate,
            "bits": None,  # lossy: no fixed sample width
            "data_bytes": audio_bytes,
            "duration_sec": round(duration, 6),
        }
    except Exception:
        return None


def sniff_flac_meta(content: bytes) -> dict | None:
    """FLAC STREAMINFO parameters ('fLaC' magic + the mandatory first
    metadata block): rate/channels/bits/total-samples → exact duration.
    Never raises."""
    try:
        b = content or b""
        if b[:4] != b"fLaC" or len(b) < 4 + 4 + 34:
            return None
        # first metadata block header: 1 byte (last<<7 | type), 3 bytes len
        btype = b[4] & 0x7F
        blen = int.from_bytes(b[5:8], "big")
        if btype != 0 or blen < 34:  # STREAMINFO is mandatory and first
            return None
        si = b[8 : 8 + 34]
        packed = int.from_bytes(si[10:18], "big")
        rate = (packed >> 44) & 0xFFFFF
        n_ch = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        total = packed & 0xFFFFFFFFF  # 36 bits
        if rate == 0 or rate > 0x7FFFFFFF:
            return None
        duration = round(total / rate, 6) if total else None
        # Walk the full metadata block chain (is-last flag + 3-byte lengths)
        # to the first audio frame — len(b)-8-blen counted VORBIS_COMMENT/
        # PADDING/PICTURE blocks (cover art is often 100s of KB) as audio
        # payload (ADVICE r11). Truncated chains report None, not a guess.
        data_bytes = None
        off = 4
        for _ in range(1024):  # bounded: a real file has a handful of blocks
            if off + 4 > len(b):
                break  # chain runs off the payload: truncated file
            last = bool(b[off] & 0x80)
            bl = int.from_bytes(b[off + 1 : off + 4], "big")
            off += 4 + bl
            if off > len(b):
                break
            if last:
                data_bytes = len(b) - off
                break
        return {
            "format": "flac",
            "format_tag": None,
            "n_channels": n_ch,
            "sample_rate": rate,
            "bits": bits,
            "data_bytes": data_bytes,
            "duration_sec": duration,
        }
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Ogg container (RFC 3533) with Vorbis-I / Opus (RFC 7845) ident headers —
# r13, the remaining mainstream web-audio container. Header cost only:
# rate/channels from the BOS page's ident packet, duration from the LAST
# page's granule position (a bounded tail scan — the same trick ffprobe
# uses), no packet decode. Vorbis/Opus PAYLOAD decode stays out of scope
# for the same reason as MP3/lossy-VP8 (SURVEY §2.7): the codebook/range
# decoder constant tables can't be re-derived verifiably clean-room.

_OGG_MAX_PAGES = 64  # bounded head walk to find the audio BOS page
_OGG_TAIL_SCAN = 64 * 1024  # window for the last-granule scan


def _ogg_page_header(b: bytes, i: int):
    """(header_type, granule, serial, page_end) for the page at i, or
    None. Requires the full segment TABLE in-buffer; the payload need not
    be (a truncated final page still yields its granule)."""
    if b[i : i + 4] != b"OggS" or i + 27 > len(b) or b[i + 4] != 0:
        return None
    htype = b[i + 5]
    granule = int.from_bytes(b[i + 6 : i + 14], "little", signed=True)
    serial = int.from_bytes(b[i + 14 : i + 18], "little")
    nseg = b[i + 26]
    seg_end = i + 27 + nseg
    if seg_end > len(b):
        return None
    return htype, granule, serial, seg_end + sum(b[i + 27 : seg_end])


def sniff_ogg_meta(content: bytes) -> dict | None:
    """Ogg-Vorbis/Ogg-Opus inventory row from the ident header + last-page
    granule. format 'ogg-vorbis' | 'ogg-opus' | 'ogg' (container parses,
    codec unrecognized); duration_sec None when no tail page of the audio
    stream's serial is found (e.g. head-only truncation). Opus granules
    run at 48 kHz regardless of the input rate and are offset by the
    ident header's pre-skip (RFC 7845 §4.2); sample_rate reports the
    ident header's input rate. Never raises on arbitrary bytes."""
    try:
        b = content or b""
        if b[:4] != b"OggS":
            return None
        fmt, serial, n_ch, rate, preskip = "ogg", None, None, None, 0
        i = 0
        any_page = False
        for _ in range(_OGG_MAX_PAGES):
            h = _ogg_page_header(b, i)
            if h is None:
                break
            any_page = True
            htype, _granule, ser, page_end = h
            # payload begins right after the segment table; on a BOS page
            # (htype & 0x02) the codec ident packet starts the payload
            nseg = b[i + 26]
            payload = b[i + 27 + nseg : page_end]
            if htype & 0x02 and payload[:7] == b"\x01vorbis" and len(payload) >= 30:
                fmt, serial = "ogg-vorbis", ser
                n_ch = payload[11]
                rate = int.from_bytes(payload[12:16], "little")
                break
            if htype & 0x02 and payload[:8] == b"OpusHead" and len(payload) >= 19:
                fmt, serial = "ogg-opus", ser
                n_ch = payload[9]
                preskip = int.from_bytes(payload[10:12], "little")
                rate = int.from_bytes(payload[12:16], "little") or 48000
                break
            if page_end <= i or page_end > len(b):
                break
            i = page_end
        if not any_page:  # 4 magic bytes alone don't make an Ogg file
            return None
        if rate is not None and (rate == 0 or rate > 0x7FFFFFFF):
            return None
        # last-granule tail scan: the final page's granule position is the
        # stream's total PCM sample count (RFC 3533 §6)
        duration = None
        if serial is not None:
            tail0 = max(0, len(b) - _OGG_TAIL_SCAN)
            best = None
            j = b.find(b"OggS", tail0)
            for _ in range(_OGG_MAX_PAGES * 4):
                if j < 0:
                    break
                h = _ogg_page_header(b, j)
                if h is not None and h[2] == serial and h[1] >= 0:
                    best = h[1]
                j = b.find(b"OggS", j + 4)
            if best is not None and rate:
                samples = best - (preskip if fmt == "ogg-opus" else 0)
                hz = 48000 if fmt == "ogg-opus" else rate
                duration = round(max(samples, 0) / hz, 6)
        return {
            "format": fmt,
            "format_tag": None,
            "n_channels": n_ch,
            "sample_rate": rate,
            "bits": None,
            "data_bytes": None,
            "duration_sec": duration,
        }
    except Exception:
        return None


def sniff_audio_meta(content: bytes) -> dict | None:
    """Unified audio inventory row: WAV (chunk walk, format column
    'wav'), FLAC, Ogg (Vorbis/Opus ident headers), or MP3; None for
    anything else. The operator-facing composition, mirroring
    video_meta's y4m+mp4+webm unification. MP3 goes LAST: its sync scan
    is the permissive one."""
    m = sniff_wav_meta(content)
    if m is not None:
        return {**m, "format": "wav"}
    m = sniff_flac_meta(content)
    if m is not None:
        return m
    m = sniff_ogg_meta(content)
    if m is not None:
        return m
    # audio-ONLY WebM (.weba/.mka); muxed A+V stays video_meta's row
    from vectrekker_spark.functions.webmcodec import sniff_webm_audio_meta

    m = sniff_webm_audio_meta(content)
    if m is not None:
        return m
    return sniff_mp3_meta(content)
