"""RIFF/WAVE micro-parser tests: WAV bytes are hand-built from the public
layout here (no audio library), so the parser is checked against the spec,
not against itself."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectrekker_spark.functions.audiocodec import is_wav, parse_wav, wav_mono_f64


def make_wav(samples: np.ndarray, rate: int = 16000, extra_chunk: bytes = b"") -> bytes:
    """Canonical PCM16 WAV: samples is (n_frames, n_channels) int16."""
    n_frames, n_ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += extra_chunk
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(5)
    mono = rng.randint(-32768, 32767, size=(100, 1), dtype=np.int16)
    rate, ch, out = parse_wav(make_wav(mono, rate=8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out, mono)

    stereo = rng.randint(-32768, 32767, size=(64, 2), dtype=np.int16)
    rate, ch, out = parse_wav(make_wav(stereo, rate=44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, stereo)
    # downmix = channel mean
    mixed = wav_mono_f64(make_wav(stereo))
    expect = (stereo.astype(np.float64) / 32768.0).mean(axis=1)
    assert np.allclose(mixed, expect)


def test_parser_skips_unknown_chunks_and_word_aligns():
    # a LIST chunk with ODD length before data: the pad byte must be
    # honored or every later chunk misparses
    mono = np.arange(10, dtype=np.int16).reshape(-1, 1)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    rate, ch, out = parse_wav(make_wav(mono, extra_chunk=extra))
    assert np.array_equal(out, mono)


def test_unsupported_variants_raise():
    mono = np.zeros((4, 1), dtype=np.int16)
    good = make_wav(mono)
    # float32 WAV (format tag 3)
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3
    with pytest.raises(ValueError):
        parse_wav(bytes(bad_fmt))
    assert wav_mono_f64(bytes(bad_fmt)) is None
    # 8-bit
    bad_bits = bytearray(good)
    bad_bits[34] = 8
    with pytest.raises(ValueError):
        parse_wav(bytes(bad_bits))
    # truncated data chunk
    with pytest.raises(ValueError):
        parse_wav(good[:-3])
    # not WAV at all
    assert not is_wav(b"plain bytes")
    assert wav_mono_f64(b"plain bytes") is None


def test_pcm_window_features_accepts_wav_and_raw_identically(spark):
    """The SAME sine signal as (a) raw PCM16 bytes and (b) a WAV container
    must produce identical window features — the container parse is a real
    decode, not a different code path's approximation."""
    from vectrekker_spark.operators.multimodal import pcm_window_features

    sr, freq, amp = 16000, 100.0, 0.5
    t = np.arange(sr) / sr
    wave = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    raw = wave.tobytes()
    wav = make_wav(wave.reshape(-1, 1), rate=sr)
    # stereo with both channels equal downmixes to the same mono signal
    wav2 = make_wav(np.column_stack([wave, wave]), rate=sr)
    df = spark.createDataFrame(
        [(1, bytearray(raw)), (2, bytearray(wav)), (3, bytearray(wav2))],
        "media_id long, content binary",
    )
    rows = pcm_window_features(df, window=1600).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append((r["window_no"], r["rms"], r["zcr"]))
    assert len(by_id[1]) == len(by_id[2]) == len(by_id[3]) == 10
    assert sorted(by_id[1]) == sorted(by_id[2]) == sorted(by_id[3])


def test_unsupported_wav_encodings_skip_not_garbage(spark):
    """A float32 WAV must emit NO feature rows — reinterpreting its header
    + float bytes as raw PCM16 would fabricate plausible garbage (review
    finding). Non-WAV payloads keep the raw-PCM16 contract."""
    from vectrekker_spark.operators.multimodal import pcm_window_features

    mono = np.zeros((4000, 1), dtype=np.int16)
    float_wav = bytearray(make_wav(mono))
    float_wav[20] = 3  # format tag: IEEE float
    raw = np.zeros(4000, dtype="<i2").tobytes()
    df = spark.createDataFrame(
        [(1, float_wav), (2, bytearray(raw))],
        "media_id long, content binary",
    )
    rows = pcm_window_features(df, window=1000).collect()
    ids = {r["media_id"] for r in rows}
    assert 1 not in ids  # unsupported WAV: skipped, no fabricated features
    assert sum(1 for r in rows if r["media_id"] == 2) == 4  # raw path intact


# --- header sniffing --------------------------------------------------------


def test_sniff_wav_meta_reports_params():
    from vectrekker_spark.functions.audiocodec import sniff_wav_meta

    samples = np.zeros((100, 2), dtype=np.int16)
    m = sniff_wav_meta(make_wav(samples, rate=8000))
    assert m == {
        "format_tag": 1, "n_channels": 2, "sample_rate": 8000, "bits": 16,
        "data_bytes": 400, "duration_sec": pytest.approx(100 / 8000),
    }
    # non-PCM / non-16-bit files are REPORTED, not errored (parse_wav would
    # raise on both) — the inventory must see what they are
    float_fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(float_fmt) + 8 + 8)
           + b"WAVE" + b"fmt " + struct.pack("<I", len(float_fmt)) + float_fmt
           + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    m = sniff_wav_meta(wav)
    assert (m["format_tag"], m["bits"], m["sample_rate"]) == (3, 32, 44100)
    assert m["duration_sec"] == pytest.approx(8 / (44100 * 4))


def test_sniff_wav_meta_clamps_truncated_data():
    from vectrekker_spark.functions.audiocodec import sniff_wav_meta

    wav = make_wav(np.zeros((100, 1), dtype=np.int16))
    cut = wav[:-100]  # declared data length now exceeds the payload
    m = sniff_wav_meta(cut)
    assert m is not None and m["data_bytes"] == 200 - 100


def test_sniff_wav_meta_never_raises_and_is_bounded():
    import random
    import time

    from vectrekker_spark.functions.audiocodec import sniff_wav_meta

    rng = random.Random(7)
    for _ in range(200):
        sniff_wav_meta(bytes(rng.randrange(256) for _ in range(rng.randrange(48))))
    wav = make_wav(np.zeros((10, 1), dtype=np.int16))
    for cut in range(len(wav)):
        sniff_wav_meta(wav[:cut])
    # a bomb of millions of zero-length chunks must return fast (chunk cap)
    bomb = b"RIFF" + struct.pack("<I", 4) + b"WAVE" + b"\x00" * (32 << 20)
    t0 = time.time()
    assert sniff_wav_meta(bomb) is None
    assert time.time() - t0 < 1.0


def test_sniff_wav_rejects_out_of_int32_rate_and_uses_byte_rate():
    from vectrekker_spark.functions.audiocodec import sniff_wav_meta

    hostile = struct.pack("<HHIIHH", 1, 1, 0xFFFFFFFF, 4, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(hostile)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(hostile)) + hostile)
    assert sniff_wav_meta(wav) is None  # would crash Int32 columns downstream

    # 12-bit PCM with 2-byte block align: duration comes from byte_rate
    # (the spec's definition), not bits//8 frame math
    f12 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 12)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(f12) + 8 + 3200) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(f12)) + f12
           + b"data" + struct.pack("<I", 3200) + b"\x00" * 3200)
    m = sniff_wav_meta(wav)
    assert m["duration_sec"] == pytest.approx(3200 / 16000)


def test_spectral_features_pure_sine_and_noise(spark):
    """r10 spectral features: a bin-exact sine concentrates the spectrum
    (centroid = rolloff = its normalized frequency, flatness ~0) while
    white noise spreads it (flatness high, centroid near mid-band) — the
    analytic checks that make these features trustworthy discriminators."""
    import numpy as np

    from vectrekker_spark.operators.multimodal import spectral_window_features

    sr, window = 16000, 1024
    k = 64  # bin-exact: f = k*sr/window = 1000 Hz
    t = np.arange(window * 4)
    sine = (0.5 * np.sin(2 * np.pi * k * t / window) * 32767).astype("<i2")
    rng = np.random.RandomState(9)
    noise = (rng.uniform(-0.9, 0.9, window * 4) * 32767).astype("<i2")
    silence = np.zeros(window * 2, dtype="<i2")

    df = spark.createDataFrame(
        [
            (1, make_wav(sine[:, None], rate=sr)),
            (2, noise.tobytes()),  # raw PCM16: rate unknown
            (3, make_wav(silence[:, None], rate=sr)),
        ],
        "media_id long, content binary",
    )
    rows = spectral_window_features(df, window=window).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)

    want_f = k / window  # 0.0625 cycles/sample
    for r in by_id[1]:
        assert r.sample_rate == sr  # WAV rate surfaced -> Hz = 0.0625*16000
        # int16 quantization of the sine leaks ~1e-5 of the energy into
        # other bins; the centroid moves by that much, no more
        assert abs(r.centroid - want_f) < 1e-4
        assert abs(r.rolloff - want_f) < 1e-6
        assert r.flatness < 1e-4
    assert len(by_id[1]) == 4

    for r in by_id[2]:
        assert r.sample_rate is None  # raw PCM16: normalized only
        assert 0.15 < r.centroid < 0.35  # white noise: mid-band
        assert r.flatness > 0.3
        assert r.rolloff > 0.3

    for r in by_id[3]:  # silence: documented sentinel values
        assert (r.centroid, r.rolloff, r.flatness) == (0.0, 0.0, 1.0)


def test_spectral_features_match_naive_dft():
    """The operator's kernel math vs an independent naive DFT (literal
    correlation sums, no np.fft) on one window — the two-implementations
    discipline."""
    import numpy as np

    window = 64
    rng = np.random.RandomState(4)
    samples = rng.uniform(-1, 1, window)

    # naive DFT magnitudes for k = 0..window//2
    mags = []
    for k in range(window // 2 + 1):
        re = sum(
            samples[n] * np.cos(-2 * np.pi * k * n / window) for n in range(window)
        )
        im = sum(
            samples[n] * np.sin(-2 * np.pi * k * n / window) for n in range(window)
        )
        mags.append(np.hypot(re, im))
    mags = np.array(mags)
    freqs = np.arange(window // 2 + 1) / window
    want_centroid = (mags * freqs).sum() / mags.sum()
    # rolloff over ENERGY (squared magnitude) — the advice-r10 fix; the
    # naive side mirrors the documented definition independently
    naive_energy = mags * mags
    cum = np.cumsum(naive_energy)
    want_rolloff = freqs[int(np.argmax(cum >= 0.85 * naive_energy.sum()))]
    power = naive_energy + 1e-30
    want_flat = np.exp(np.log(power).mean()) / power.mean()

    # the kernel path (same math the operator vectorizes)
    m = np.abs(np.fft.rfft(samples))
    got_centroid = (m * np.fft.rfftfreq(window)).sum() / m.sum()
    e2 = m * m
    got_rolloff = np.fft.rfftfreq(window)[
        int(np.argmax(np.cumsum(e2) >= 0.85 * e2.sum()))
    ]
    p2 = e2 + 1e-30
    got_flat = np.exp(np.log(p2).mean()) / p2.mean()

    assert abs(got_centroid - want_centroid) < 1e-9
    assert abs(got_rolloff - want_rolloff) < 1e-12
    assert abs(got_flat - want_flat) < 1e-9


def test_spectral_unsupported_wav_skipped(spark):
    """A WAV container in an encoding the parser doesn't cover must emit
    NO spectral rows — never be reinterpreted as raw PCM16 (the
    pcm_window_features contract applied to the spectral twin)."""
    import struct

    from vectrekker_spark.operators.multimodal import spectral_window_features

    # float32 WAV (format tag 3): is_wav true, parse_wav raises
    body = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    data = b"\x00" * 4096
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(1, wav)], "media_id long, content binary")
    assert spectral_window_features(df, window=512).count() == 0


def test_spectral_out_of_int32_rate_skipped(spark):
    """r10 review finding: a WAV whose fmt rate exceeds int32 passes
    parse_wav (uint32 field) but would crash the Int32 sample_rate
    column — the operator must classify it as unsupported (no rows),
    not fail the batch (the sniff_wav_meta lesson applied here)."""
    import numpy as np

    from vectrekker_spark.operators.multimodal import spectral_window_features

    data = np.zeros(2048, dtype="<i2").tobytes()
    # hand-built: make_wav's byte_rate arithmetic itself overflows uint32
    # at this rate, which is exactly why the operator must guard the value
    fmt = struct.pack("<HHIIHH", 1, 1, 0xF0000000, 0xFFFFFFFF, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(1, wav)], "media_id long, content binary")
    assert spectral_window_features(df, window=512).count() == 0


def test_spectral_rolloff_is_energy_not_magnitude(spark):
    """Advice r10 regression: a strong tone at k=10 plus a weak tone at
    k=100 (amplitude ratio 0.3) puts 91.7% of the ENERGY but only 76.9%
    of the MAGNITUDE in the strong bin — the documented energy rolloff
    lands on the strong tone, a magnitude cumsum would land on the weak
    one. Pins the definition the docstring states."""
    import numpy as np

    from vectrekker_spark.operators.multimodal import spectral_window_features

    window = 1024
    t = np.arange(window)
    two_tone = 0.6 * np.sin(2 * np.pi * 10 * t / window) + 0.18 * np.sin(
        2 * np.pi * 100 * t / window
    )
    pcm = (two_tone * 32767).astype("<i2")
    df = spark.createDataFrame(
        [(1, pcm.tobytes())], "media_id long, content binary"
    )
    (row,) = spectral_window_features(df, window=window).collect()
    assert abs(row.rolloff - 10 / window) < 1e-6  # energy: strong bin
    assert abs(row.rolloff - 100 / window) > 0.05  # not the magnitude answer


# --- MP3 / FLAC sniffing (r11) ----------------------------------------------


def _mp3_frame_header(version=3, br_idx=9, sr_idx=0, mono=False) -> bytes:
    b1 = 0xFF
    b2 = 0xE0 | (version << 3) | (1 << 1)  # Layer III
    b3 = (br_idx << 4) | (sr_idx << 2)
    b4 = 0xC0 if mono else 0x00
    return bytes([b1, b2, b3, b4])


def _mp3_stream(n_frames, version=3, br_idx=9, sr_idx=0, mono=False,
                first_payload=b"") -> bytes:
    """Valid CBR stream: n_frames consecutive headers at exact frame-length
    strides (the second-header validation the sniffer now enforces)."""
    from vectrekker_spark.functions.audiocodec import (
        _MP3_BITRATES_V1,
        _MP3_BITRATES_V2,
        _MP3_RATES,
    )

    rate = _MP3_RATES[version][sr_idx]
    kbps = (_MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2)[br_idx]
    flen = (144 if version == 3 else 72) * kbps * 1000 // rate
    hdr = _mp3_frame_header(version, br_idx, sr_idx, mono)
    first = (hdr + first_payload).ljust(flen, b"\x00")
    assert len(first) == flen, "first_payload overflows one frame"
    return first + (hdr.ljust(flen, b"\x00")) * (n_frames - 1)


def test_sniff_mp3_cbr_estimate_and_id3_skip():
    from vectrekker_spark.functions.audiocodec import sniff_audio_meta

    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo; ~16 KB of real frames
    body = _mp3_stream(39, br_idx=9, sr_idx=0)  # 39 × 417-byte frames
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    for payload in (body, id3 + body):
        m = sniff_audio_meta(payload)
        assert m is not None and m["format"] == "mp3"
        assert m["sample_rate"] == 44100 and m["n_channels"] == 2
        # CBR estimate: bytes*8 / 128000
        assert m["duration_sec"] == pytest.approx(
            len(body) * 8 / 128000, rel=1e-3
        )


def test_sniff_mp3_xing_exact_duration_and_mono_v2():
    from vectrekker_spark.functions.audiocodec import sniff_audio_meta

    # MPEG2 mono: side info 9 bytes; Xing frame count -> exact duration
    xing = b"\x00" * 9 + b"Xing" + struct.pack(">II", 1, 1000)
    m = sniff_audio_meta(
        _mp3_stream(30, version=2, br_idx=5, sr_idx=1, mono=True,
                    first_payload=xing)
    )
    assert m is not None and m["format"] == "mp3"
    assert m["sample_rate"] == 24000 and m["n_channels"] == 1
    assert m["duration_sec"] == pytest.approx(1000 * 576 / 24000)


def test_sniff_mp3_single_frame_file_accepted():
    from vectrekker_spark.functions.audiocodec import sniff_mp3_meta

    # one full frame, optionally followed by an ID3v1 trailer: accepted
    one = _mp3_stream(1, br_idx=9, sr_idx=0)
    id3v1 = b"TAG" + b"\x00" * 125
    for payload in (one, one + id3v1):
        m = sniff_mp3_meta(payload)
        assert m is not None and m["sample_rate"] == 44100


def test_sniff_mp3_rejects_sync_without_second_frame():
    from vectrekker_spark.functions.audiocodec import sniff_mp3_meta

    # a valid header followed by 16 KB of zeros is NOT an mp3 stream: no
    # second frame header at the computed stride (ADVICE r11 — ~10% of
    # random blobs carried a bare 11-bit sync and were misclassified)
    hdr = _mp3_frame_header(br_idx=9, sr_idx=0)
    assert sniff_mp3_meta(hdr + b"\x00" * 16000) is None

    import random

    rng = random.Random(7)
    hits = sum(
        sniff_mp3_meta(rng.randbytes(8192)) is not None for _ in range(200)
    )
    assert hits == 0


def test_sniff_mp3_rejects_non_layer3_and_free_format():
    from vectrekker_spark.functions.audiocodec import sniff_mp3_meta

    assert sniff_mp3_meta(bytes([0xFF, 0xE0 | (3 << 3) | (3 << 1), 0x90, 0])) is None  # Layer I
    assert sniff_mp3_meta(bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1), 0x00, 0])) is None  # free format
    assert sniff_mp3_meta(b"") is None


def _flac_bytes(rate=44100, n_ch=2, bits=16, total=441000) -> bytes:
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | total
    si = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si + b"\xff" * 64


def test_sniff_flac_streaminfo():
    from vectrekker_spark.functions.audiocodec import sniff_audio_meta

    m = sniff_audio_meta(_flac_bytes())
    assert m is not None and m["format"] == "flac"
    assert m["sample_rate"] == 44100 and m["n_channels"] == 2
    assert m["bits"] == 16
    assert m["duration_sec"] == pytest.approx(10.0)
    # unknown total samples -> duration NULL, never fabricated
    assert sniff_audio_meta(_flac_bytes(total=0))["duration_sec"] is None
    assert m["data_bytes"] == 64  # audio frames start right after STREAMINFO


def test_sniff_flac_data_bytes_walks_metadata_chain():
    from vectrekker_spark.functions.audiocodec import sniff_flac_meta

    # STREAMINFO (not last) + 1000-byte PADDING block (cover-art stand-in,
    # is-last set) + 64 audio bytes: data_bytes must exclude the padding
    # (old formula counted all later metadata as audio — ADVICE r11)
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | 441000
    si = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    payload = (
        b"fLaC"
        + bytes([0x00]) + (34).to_bytes(3, "big") + si          # STREAMINFO
        + bytes([0x80 | 1]) + (1000).to_bytes(3, "big") + b"\x00" * 1000
        + b"\xff" * 64
    )
    m = sniff_flac_meta(payload)
    assert m is not None and m["data_bytes"] == 64

    # truncated chain (last block's length overruns the payload): None,
    # never a fabricated byte count
    truncated = (
        b"fLaC" + bytes([0x00]) + (34).to_bytes(3, "big") + si
        + bytes([0x80 | 1]) + (1000).to_bytes(3, "big") + b"\x00" * 10
    )
    m = sniff_flac_meta(truncated)
    assert m is not None and m["data_bytes"] is None


def test_sniff_audio_never_raises_fuzz():
    import random

    from vectrekker_spark.functions.audiocodec import sniff_audio_meta

    rng = random.Random(3)
    for _ in range(300):
        sniff_audio_meta(bytes(rng.randrange(256) for _ in range(rng.randrange(64))))
    for base in (_flac_bytes(), _mp3_frame_header() + b"\x00" * 100):
        for cut in range(len(base)):
            sniff_audio_meta(base[:cut])
        for i in range(len(base)):
            m = bytearray(base)
            m[i] ^= 0xFF
            sniff_audio_meta(bytes(m))


def test_audio_meta_operator_unifies_formats(spark):
    import numpy as np

    from vectrekker_spark.operators.multimodal import audio_meta

    wav = make_wav(np.zeros((1600, 1), dtype=np.int16), rate=16000)
    mp3 = _mp3_stream(20)  # 20 consecutive 417-byte CBR frames
    flac = _flac_bytes(rate=48000, n_ch=1, bits=24, total=96000)
    df = spark.createDataFrame(
        [(1, wav), (2, mp3), (3, flac), (4, b"noise"), (5, None)],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in audio_meta(df).collect()}
    assert rows[1].aud_format == "wav" and rows[1].aud_rate == 16000
    assert rows[1].aud_format_tag == 1
    assert rows[2].aud_format == "mp3" and rows[2].aud_rate == 44100
    assert rows[2].aud_bits is None  # lossy: no fixed width, never faked
    assert rows[3].aud_format == "flac" and rows[3].aud_bits == 24
    assert rows[3].aud_duration == pytest.approx(2.0)
    assert rows[4].aud_format is None and rows[5].aud_format is None


# --- Ogg (RFC 3533) + Vorbis-I / Opus (RFC 7845) ident headers --------------


def _ogg_page(serial, seq, payload, htype=0, granule=0):
    """One spec-built Ogg page (255-lacing segment table)."""
    n, last = divmod(len(payload), 255)
    table = bytes([255] * n + [last])
    return (
        b"OggS"
        + bytes([0, htype])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"  # crc unchecked by the sniffer
        + bytes([len(table)])
        + table
        + payload
    )


def _vorbis_ident(channels=2, rate=44100):
    return (
        b"\x01vorbis"
        + (0).to_bytes(4, "little")
        + bytes([channels])
        + rate.to_bytes(4, "little")
        + b"\x00" * 12  # bitrate max/nominal/min
        + b"\xb8"  # blocksizes
        + b"\x01"  # framing bit
    )


def _opus_head(channels=1, preskip=312, input_rate=24000):
    return (
        b"OpusHead"
        + bytes([1, channels])
        + preskip.to_bytes(2, "little")
        + input_rate.to_bytes(4, "little")
        + (0).to_bytes(2, "little")  # output gain
        + b"\x00"  # mapping family 0
    )


def _ogg_stream(ident, serial=7, last_granule=88200):
    return (
        _ogg_page(serial, 0, ident, htype=0x02)
        + _ogg_page(serial, 1, b"\x03fakecomment", granule=0)
        + _ogg_page(serial, 2, b"\xaa" * 300, granule=last_granule // 2)
        + _ogg_page(serial, 3, b"\xbb" * 300, htype=0x04, granule=last_granule)
    )


def test_sniff_ogg_vorbis():
    from vectrekker_spark.functions.audiocodec import sniff_ogg_meta

    m = sniff_ogg_meta(_ogg_stream(_vorbis_ident(2, 44100),
                                   last_granule=88200))
    assert m["format"] == "ogg-vorbis"
    assert m["n_channels"] == 2 and m["sample_rate"] == 44100
    assert m["duration_sec"] == pytest.approx(2.0)  # 88200 / 44100


def test_sniff_ogg_opus_preskip_and_48k_granules():
    """RFC 7845: granules always tick at 48 kHz and the pre-skip samples
    don't count — input_sample_rate is reported but not used for time."""
    from vectrekker_spark.functions.audiocodec import sniff_ogg_meta

    m = sniff_ogg_meta(
        _ogg_stream(_opus_head(1, preskip=312, input_rate=24000),
                    last_granule=48000 + 312)
    )
    assert m["format"] == "ogg-opus"
    assert m["n_channels"] == 1 and m["sample_rate"] == 24000
    assert m["duration_sec"] == pytest.approx(1.0)


def test_sniff_ogg_head_only_truncation_reports_no_duration():
    from vectrekker_spark.functions.audiocodec import sniff_ogg_meta

    full = _ogg_stream(_vorbis_ident())
    head = full[: len(_ogg_page(7, 0, _vorbis_ident(), htype=0x02)) + 10]
    m = sniff_ogg_meta(head)
    assert m["format"] == "ogg-vorbis" and m["sample_rate"] == 44100
    # no parseable tail page of this serial → duration honestly NULL...
    # unless the BOS page itself is the last page seen (granule 0 → 0.0)
    assert m["duration_sec"] in (None, 0.0)


def test_sniff_ogg_never_raises_fuzz():
    import random

    from vectrekker_spark.functions.audiocodec import sniff_audio_meta, sniff_ogg_meta

    base = _ogg_stream(_opus_head()) + _ogg_stream(_vorbis_ident(), serial=9)
    for cut in range(0, len(base), 3):
        sniff_ogg_meta(base[:cut])
    rng = random.Random(47)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = sniff_ogg_meta(bytes(b))
        assert r is None or isinstance(r, dict)
        sniff_audio_meta(bytes(b))


def test_audio_meta_inventory_includes_ogg(spark):
    from vectrekker_spark.operators.multimodal import audio_meta

    df = spark.createDataFrame(
        [
            (1, _ogg_stream(_vorbis_ident(2, 22050), last_granule=44100)),
            (2, _ogg_stream(_opus_head(2, 0, 48000), last_granule=96000)),
            (3, b"OggS but not really a page"),
        ],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in audio_meta(df).collect()}
    assert rows[1].aud_format == "ogg-vorbis" and rows[1].aud_duration == 2.0
    assert rows[2].aud_format == "ogg-opus" and rows[2].aud_duration == 2.0
    assert rows[2].aud_channels == 2 and rows[2].aud_rate == 48000
    assert rows[3].aud_format is None

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
