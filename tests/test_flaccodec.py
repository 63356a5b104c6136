"""FLAC codec tests (VERDICT r11 #3): independent encoder as fixture
generator, decoder must reproduce PCM bit-exactly, M4/M5 feature parity
with the WAV path on transcoded fixtures, and the hostile-input
classify-never-crash discipline (the jpegcodec/mp4codec contract)."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from vectrekker_spark.functions import flaccodec as fc


def _sine(n=4000, freq=440, rate=44100, amp=20000):
    t = np.arange(n)
    return (np.sin(2 * np.pi * freq * t / rate) * amp).astype(np.int64)


@pytest.mark.parametrize(
    "strategy",
    ["auto", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"],
)
def test_roundtrip_strategies(strategy):
    x = _sine()
    enc = fc.encode_flac(x, strategy=strategy)
    rate, ch, bits, dec = fc.decode_flac(enc)
    assert (rate, ch, bits) == (44100, 1, 16)
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_roundtrip_channel_modes(mode):
    x = np.stack([_sine(), (_sine() * 0.63).astype(np.int64)], axis=1)
    enc = fc.encode_flac(x, channel_mode=mode)
    _, ch, _, dec = fc.decode_flac(enc)
    assert ch == 2 and np.array_equal(dec, x)


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_roundtrip_bit_depths(bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim, 3000)
    enc = fc.encode_flac(x, bits=bits)
    _, _, b, dec = fc.decode_flac(enc)
    assert b == bits and np.array_equal(dec[:, 0], x)


def test_roundtrip_rice_partitions_and_method2():
    rng = np.random.default_rng(9)
    x = rng.integers(-30000, 30000, 4096)
    for po in (0, 2, 4):
        for method in (0, 1):
            enc = fc.encode_flac(x, partition_order=po, rice_method=method,
                                 block_size=1024)
            assert np.array_equal(fc.decode_flac(enc)[3][:, 0], x)


def test_roundtrip_constant_and_wasted_bits_and_odd_blocks():
    c = np.full(2500, -777)
    assert np.array_equal(fc.decode_flac(fc.encode_flac(c))[3][:, 0], c)
    x = _sine() & ~15  # low 4 bits zero -> wasted-bit path
    enc = fc.encode_flac(x, wasted=4)
    assert np.array_equal(fc.decode_flac(enc)[3][:, 0], x)
    x = _sine(1000)
    enc = fc.encode_flac(x, block_size=333, partition_order=3)  # po auto-drops
    assert np.array_equal(fc.decode_flac(enc)[3][:, 0], x)


def test_compression_actually_compresses():
    # the point of FIXED prediction: smooth signals beat verbatim
    x = _sine(8000)
    smooth = len(fc.encode_flac(x, strategy="fixed4"))
    verb = len(fc.encode_flac(x, strategy="verbatim"))
    assert smooth < verb * 0.5


def test_crc_rejection():
    x = _sine(500)
    enc = bytearray(fc.encode_flac(x))
    # flip a bit in the last frame's audio payload: CRC-16 must catch it
    enc[-3] ^= 0x10
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(enc))


def test_streaminfo_total_mismatch_rejected():
    x = _sine(500)
    enc = bytearray(fc.encode_flac(x))
    # STREAMINFO total_samples is the low 36 bits of the packed field at
    # offset 8+10 .. 8+18; add one to the declared total
    packed = int.from_bytes(enc[18:26], "big")
    packed += 1
    enc[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(enc))


def test_hostile_inputs_classify_never_crash():
    x = _sine(600)
    enc = fc.encode_flac(x, block_size=256)
    for cut in range(0, len(enc), 7):
        try:
            fc.decode_flac(enc[:cut])
        except ValueError:
            pass
    rng = random.Random(5)
    for _ in range(60):
        m = bytearray(enc)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
        try:
            fc.decode_flac(bytes(m))
        except ValueError:
            pass
    for _ in range(200):
        try:
            fc.decode_flac(bytes(rng.randrange(256) for _ in range(rng.randrange(96))))
        except ValueError:
            pass


def test_decode_budget_bounds_hostile_totals():
    # a crafted STREAMINFO claiming an absurd total must classify before
    # any allocation (MAX_DECODED_SAMPLES discipline)
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | (fc.MAX_DECODED_SAMPLES + 1)
    si = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    payload = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si + b"\xff" * 32
    with pytest.raises(ValueError, match="budget"):
        fc.decode_flac(payload)


def test_flac_pcm16_rescale():
    x8 = (np.arange(-100, 100)).astype(np.int64)
    rate, s = fc.flac_pcm16(fc.encode_flac(x8, bits=8, rate=8000))
    assert rate == 8000 and np.array_equal(s[:, 0], x8 << 8)
    x24 = x8 * 65536
    _, s = fc.flac_pcm16(fc.encode_flac(x24, bits=24))
    assert np.array_equal(s[:, 0], x24 >> 8)


# --- feature parity with the WAV path (the VERDICT "done" criterion) -------


def _wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    x = samples if samples.ndim == 2 else samples[:, None]
    data = x.astype("<i2").tobytes()
    n_ch = x.shape[1]
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, rate,
                                rate * 2 * n_ch, 2 * n_ch, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


@pytest.mark.parametrize("op_name", ["pcm", "spectral"])
def test_feature_parity_wav_vs_flac_transcode(spark, op_name):
    from vectrekker_spark.operators.multimodal import (
        pcm_window_features,
        spectral_window_features,
    )

    rng = np.random.default_rng(2)
    sine = _sine(4096, freq=220)
    noise = rng.integers(-8000, 8000, 4096)
    stereo = np.stack([sine, noise], axis=1)
    rows = []
    for i, (x, mode) in enumerate(
        [(sine, "independent"), (noise, "independent"), (stereo, "mid_side")]
    ):
        rows.append((2 * i, _wav_bytes(x, 16000)))
        rows.append((2 * i + 1, fc.encode_flac(x, rate=16000, channel_mode=mode)))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    op = pcm_window_features if op_name == "pcm" else spectral_window_features
    out = op(df, window=512).toPandas()
    for i in range(3):
        wav = out[out.media_id == 2 * i].drop(columns=["media_id"]).reset_index(drop=True)
        flac = out[out.media_id == 2 * i + 1].drop(columns=["media_id"]).reset_index(drop=True)
        assert len(wav) == 8 and wav.equals(flac), f"fixture {i} diverged"


def test_lpc_short_block_fallback_keeps_wasted_bits():
    # r12 review finding: the LPC→verbatim fallback for a 1-sample trailing
    # block recursed on the ALREADY-SHIFTED samples without the wasted
    # flag, silently emitting right-shifted PCM that passed every check
    x = (_sine(257) & ~15)  # block_size=256 -> 1-sample trailing block
    enc = fc.encode_flac(x, strategy="lpc", wasted=4, block_size=256)
    assert np.array_equal(fc.decode_flac(enc)[3][:, 0], x)


def test_partition_order_clamped_for_short_trailing_frame():
    # r12 review finding: a trailing frame short enough that the first
    # Rice partition can't hold the predictor order emitted a corrupt
    # (negative-length-partition) stream the decoder then rejected
    x = _sine(1028)  # 1024-frame + 4-sample trailing frame
    enc = fc.encode_flac(x, strategy="fixed2", partition_order=2,
                         block_size=1024)
    assert np.array_equal(fc.decode_flac(enc)[3][:, 0], x)


def test_stereo_wasted_bits_forwarded_or_refused():
    x = np.stack([_sine() & ~7, (_sine() * 0.5).astype(np.int64) & ~7], axis=1)
    # left/right/side all keep the low-zero bits: forwarded, round-trips
    for mode in ("left_side", "right_side"):
        enc = fc.encode_flac(x, channel_mode=mode, wasted=3)
        assert np.array_equal(fc.decode_flac(enc)[3], x)
    # mid loses a zero bit in (l+r)>>1: refused, never silently dropped
    with pytest.raises(ValueError, match="mid_side"):
        fc.encode_flac(x, channel_mode="mid_side", wasted=3)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
