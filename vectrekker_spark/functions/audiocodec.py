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
