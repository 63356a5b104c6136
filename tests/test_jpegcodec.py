"""Baseline JPEG micro-codec tests (r9 verdict #1): the dominant web image
format gets a REAL pixel decode with no media library. The verification
discipline mirrors test_imagecodec.py's PNG pattern: the inverse DCT is
checked against an independent naive cosine-sum of the spec formula (T.81
A.3.3), and the encoder (forward DCT + quantize + Huffman) is a separate
implementation the decoder must invert, not a shared code path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectrekker_spark.functions import jpegcodec as jc
from vectrekker_spark.functions.imagecodec import (
    decode_image_array,
    sniff_image_meta,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // max(h - 1, 1),
            xx * 255 // max(w - 1, 1),
            (yy + xx) * 255 // max(h + w - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


def _naive_idct(block: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT as the literal double cosine sum —
    independent of the decoder's matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * block[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_idct_matches_spec_cosine_sum():
    block = _rng(3).randint(-512, 512, size=(8, 8)).astype(np.float64)
    t = jc._DCT_T
    fast = t.T @ block @ t
    assert np.allclose(fast, _naive_idct(block), atol=1e-9)


def test_fdct_idct_identity():
    t = jc._DCT_T
    p = _rng(4).randint(0, 256, size=(8, 8)).astype(np.float64) - 128
    assert np.allclose(t.T @ (t @ p @ t.T) @ t, p, atol=1e-9)


def test_zigzag_is_a_permutation_with_spec_prefix():
    assert sorted(jc.ZIGZAG.tolist()) == list(range(64))
    # first diagonal sweeps of Figure A.6
    assert jc.ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_flat_color_roundtrips_exactly():
    arr = np.zeros((16, 24, 3), dtype=np.uint8)
    arr[:, :] = [200, 60, 30]
    out = jc.decode_jpeg(jc.encode_jpeg(arr, quality=95))
    assert out.shape == arr.shape
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 1


@pytest.mark.parametrize("sub,tol", [("4:4:4", 4), ("4:2:2", 6), ("4:2:0", 8)])
def test_gradient_roundtrip_within_quantization_error(sub, tol):
    arr = _gradient(37, 53)  # odd dims exercise pad + crop on both axes
    out = jc.decode_jpeg(jc.encode_jpeg(arr, quality=95, subsampling=sub))
    assert out.shape == arr.shape
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.max() <= tol
    assert err.mean() <= 1.5


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:21, 0:17]
    g = (yy * 255 // 20 // 2 + xx * 255 // 16 // 2).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(g, quality=95))
    assert out.shape == (21, 17, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 6


def test_noise_roundtrip_bounded():
    # worst case for a DCT codec: white noise — still must be a sane image
    noise = _rng(42).randint(0, 256, (32, 32, 3)).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(noise, quality=90))
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 20


def test_restart_markers_emitted_and_decoded_identically():
    arr = _gradient(33, 49)
    plain = jc.encode_jpeg(arr, quality=90)
    with_rst = jc.encode_jpeg(arr, quality=90, restart_interval=2)
    assert any(
        bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8)
    ), "DRI encode must emit RSTn markers"
    assert np.array_equal(jc.decode_jpeg(with_rst), jc.decode_jpeg(plain))


def test_decoded_dims_match_sniff():
    arr = _gradient(19, 31)
    enc = jc.encode_jpeg(arr, quality=85, subsampling="4:2:0")
    meta = sniff_image_meta(enc)
    assert meta == {"format": "jpeg", "width": 31, "height": 19,
                    "n_frames": 1, "is_animated": False}
    assert jc.decode_jpeg(enc).shape == (19, 31, 3)


def test_decode_image_array_routes_jpeg():
    arr = _gradient(16, 16)
    out = decode_image_array(jc.encode_jpeg(arr, quality=95))
    assert out is not None and out.shape == (16, 16, 3)


def _patch_sof_marker(enc: bytes, new_marker: int) -> bytes:
    i = enc.index(b"\xff\xc0")
    return enc[:i] + bytes([0xFF, new_marker]) + enc[i + 2 :]


def test_sequential_stream_mislabeled_progressive_classifies():
    """A SEQUENTIAL entropy stream under a patched SOF2 marker is
    malformed progressive data (its SOS claims a full-band DC scan): the
    progressive walker must reject it as a classification outcome, and
    the header-sniff path must still read dimensions — the pre-r11
    behavior for all progressive payloads, now only for broken ones."""
    enc = jc.encode_jpeg(_gradient(16, 16), quality=90)
    prog = _patch_sof_marker(enc, 0xC2)
    with pytest.raises(ValueError):
        jc.decode_jpeg(prog)
    assert decode_image_array(prog) is None  # classify, don't crash
    # the header-sniff inventory path still reads dimensions
    assert sniff_image_meta(prog) == {"format": "jpeg", "width": 16, "height": 16, "n_frames": 1, "is_animated": False}


def test_arithmetic_coding_rejected():
    enc = jc.encode_jpeg(_gradient(16, 16), quality=90)
    with pytest.raises(ValueError, match="unsupported JPEG coding"):
        jc.decode_jpeg(_patch_sof_marker(enc, 0xC9))


def test_truncated_and_corrupt_classify_not_crash():
    enc = jc.encode_jpeg(_gradient(24, 24), quality=90)
    # truncate inside the entropy-coded data
    with pytest.raises(ValueError):
        jc.decode_jpeg(enc[: len(enc) - len(enc) // 3])
    # flip bytes mid-entropy-stream: must raise ValueError or still produce
    # an image (a bit flip can decode to valid garbage) — never crash
    corrupt = bytearray(enc)
    sos = enc.index(b"\xff\xda")
    for off in range(sos + 20, min(sos + 40, len(corrupt) - 2)):
        corrupt[off] ^= 0x5A
    try:
        jc.decode_jpeg(bytes(corrupt))
    except ValueError:
        pass
    assert decode_image_array(b"\xff\xd8" + b"\x00" * 50) is None
    assert decode_image_array(enc[:10]) is None


def test_bomb_bound_rejected_before_allocation():
    enc = jc.encode_jpeg(_gradient(8, 8), quality=90)
    i = enc.index(b"\xff\xc0")
    # SOF payload: len(2) precision(1) height(2) width(2) — claim 30000x30000
    huge = bytearray(enc)
    struct.pack_into(">HH", huge, i + 5, 30000, 30000)
    with pytest.raises(ValueError, match="micro-decoder bound"):
        jc.decode_jpeg(bytes(huge))


def test_entropy_exhaustion_is_value_error():
    enc = jc.encode_jpeg(_gradient(24, 24), quality=90)
    sos = enc.index(b"\xff\xda")
    # keep the headers, drop most of the scan, keep the EOI
    cut = enc[: sos + 14] + enc[-2:]
    with pytest.raises(ValueError):
        jc.decode_jpeg(cut)


def test_fuzz_decode_never_raises_unexpected():
    rng = _rng(11)
    for n in (0, 1, 2, 16, 200):
        b = bytes(rng.randint(0, 256, n, dtype=np.uint8).tolist())
        assert decode_image_array(b) is None or True  # no unexpected raise
        decode_image_array(b"\xff\xd8" + b)


def test_truncated_sos_classifies_not_index_error():
    """r10 review finding: an SOS whose payload is shorter than its
    component list escaped as IndexError past decode_image_array's
    classification catch — one corrupt JPEG would have crashed a whole
    extract_features micro-batch."""
    enc = jc.encode_jpeg(_gradient(16, 16), quality=90)
    sos = enc.index(b"\xff\xda")
    # rewrite the SOS length to 2 (empty payload) keeping the bytes after
    broken = enc[: sos + 2] + b"\x00\x02" + enc[sos + 4 :]
    with pytest.raises(ValueError):
        jc.decode_jpeg(broken)
    assert decode_image_array(broken) is None


def test_structured_fuzz_every_truncation_and_byte_flip():
    """Every truncation point and every single-byte flip of a real
    restart-interval 4:2:0 fixture must either decode or raise ValueError
    — no IndexError/KeyError/struct.error may escape the classification
    contract (the sweep that verified the SOS fix)."""
    enc = jc.encode_jpeg(
        _gradient(24, 24), quality=90, subsampling="4:2:0", restart_interval=2
    )
    for n in range(0, len(enc), 7):  # stride keeps the test fast
        try:
            jc.decode_jpeg(enc[:n])
        except ValueError:
            pass
    for i in range(0, len(enc), 7):
        m = bytearray(enc)
        m[i] ^= 0xFF
        try:
            jc.decode_jpeg(bytes(m))
        except ValueError:
            pass


def test_jpeg_bound_is_working_set_aware():
    """The JPEG output bound is MAX_DECODED_BYTES/8: the float32 decode
    pipeline holds ~12-16 bytes of working memory per output byte, so the
    PNG-sized bound would let a bound-passing JPEG OOM an executor."""
    from vectrekker_spark.functions.imagecodec import MAX_DECODED_BYTES

    assert jc.MAX_JPEG_PIXEL_BYTES * 8 == MAX_DECODED_BYTES
    enc = jc.encode_jpeg(_gradient(8, 8), quality=90)
    i = enc.index(b"\xff\xc0")
    huge = bytearray(enc)
    # grayscale would pass the PNG bound (64 MB) but not the JPEG one
    struct.pack_into(">HH", huge, i + 5, 4000, 4000)  # 16 MB, 3ch = 48 MB
    with pytest.raises(ValueError, match="micro-decoder bound"):
        jc.decode_jpeg(bytes(huge))


def test_extract_features_decodes_jpeg(spark):
    from vectrekker_spark.operators.multimodal import extract_features

    payloads = [
        (1, jc.encode_jpeg(_gradient(16, 16), quality=90)),
        (2, b"not an image"),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    rows = {r.media_id: r for r in extract_features(df).collect()}
    assert rows[1].decoded is True
    assert abs(sum(rows[1].features) - 1.0) < 1e-9
    assert rows[2].decoded is False


def test_roundtrip_property_random_images():
    """Hypothesis-style round-trip bound over random geometry/content at
    q95 4:4:4: decoded pixels stay within a small bound of the input for
    smooth content, and noise stays within JPEG's expected error budget."""
    rng = _rng(21)
    for _ in range(8):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        smooth = rng.randint(0, 4, (h, w, 3)).astype(np.uint8) + rng.randint(0, 200)
        out = jc.decode_jpeg(jc.encode_jpeg(smooth, quality=95))
        assert out.shape == smooth.shape
        assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8
        noisy = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        out = jc.decode_jpeg(jc.encode_jpeg(noisy, quality=95))
        assert np.abs(out.astype(int) - noisy.astype(int)).mean() < 16


def test_chunked_coefficient_flush_equals_single_scatter(monkeypatch):
    """Advice r10: the entropy stage must bound its Python-object
    accumulators. Shrinking _FLUSH_COEFFS forces many mid-scan flushes;
    the decode must be bit-identical to the single-flush path because
    each coefficient position is written at most once per scan."""
    grad_enc = jc.encode_jpeg(
        _gradient(48, 56), quality=85, subsampling="4:2:0", restart_interval=3
    )
    noisy = _rng(11).randint(0, 256, (24, 24, 3)).astype(np.uint8)
    noisy_enc = jc.encode_jpeg(noisy, quality=95)  # dense AC coefficients
    grad_base = jc.decode_jpeg(grad_enc)
    noisy_base = jc.decode_jpeg(noisy_enc)
    monkeypatch.setattr(jc, "_FLUSH_COEFFS", 7)  # flush nearly every MCU
    assert np.array_equal(grad_base, jc.decode_jpeg(grad_enc))
    assert np.array_equal(noisy_base, jc.decode_jpeg(noisy_enc))


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — r11


def test_progressive_decode_bit_identical_to_baseline():
    """THE progressive cross-check: encode_jpeg and encode_progressive_jpeg
    write the SAME quantized coefficients, differing only in entropy
    organization — so decoding both must give bit-identical pixels. Runs
    the full parameter grid: subsampling x successive-approximation depth
    x restart intervals x odd dims x grayscale/color x smooth/noise."""
    rng = _rng(17)
    grad = _gradient(37, 53)
    noise = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (40, 72)).astype(np.uint8)
    cases = [
        (grad, dict()),
        (grad, dict(dc_al=2, ac_al=2)),
        (grad, dict(subsampling="4:2:0")),
        (grad, dict(subsampling="4:2:2", restart_interval=3)),
        (grad, dict(split=0)),
        (grad, dict(split=62)),
        (noise, dict(quality=95)),
        (noise, dict(subsampling="4:2:0", restart_interval=2)),
        (gray, dict(dc_al=1, ac_al=1)),
        (np.array([[7]], dtype=np.uint8), dict()),
    ]
    for img, kw in cases:
        q = kw.pop("quality", 85)
        sub = kw.get("subsampling", "4:4:4")
        base = jc.decode_jpeg(jc.encode_jpeg(img, quality=q, subsampling=sub))
        prog = jc.decode_jpeg(
            jc.encode_progressive_jpeg(img, quality=q, **kw)
        )
        assert np.array_equal(base, prog), kw


def test_progressive_is_sof2_and_multi_scan():
    enc = jc.encode_progressive_jpeg(_gradient(16, 16), quality=90)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    frame, _qt, scans = jc._walk_progressive(enc)
    assert len(scans) >= 5  # DC first + AC bands + refinements + DC refine
    assert any(s["ah"] > 0 for s in scans)  # successive approximation real
    assert any(s["ss"] > 0 and s["ah"] == 0 for s in scans)  # spectral sel


def test_progressive_routes_through_decode_image_array():
    enc = jc.encode_progressive_jpeg(_gradient(19, 23), quality=90)
    arr = decode_image_array(enc)
    assert arr is not None and arr.shape == (19, 23, 3)
    assert sniff_image_meta(enc) == {"format": "jpeg", "width": 23, "height": 19, "n_frames": 1, "is_animated": False}


def test_progressive_structured_fuzz_truncation_and_byte_flip():
    """The baseline fuzz discipline applied to the progressive path: every
    truncation point and single-byte flip either decodes or raises
    ValueError — nothing else escapes the classification contract."""
    enc = jc.encode_progressive_jpeg(
        _gradient(24, 24), quality=90, subsampling="4:2:0", restart_interval=2
    )
    for n in range(0, len(enc), 7):
        try:
            jc.decode_jpeg(enc[:n])
        except ValueError:
            pass
    for i in range(0, len(enc), 7):
        m = bytearray(enc)
        m[i] ^= 0xFF
        try:
            jc.decode_jpeg(bytes(m))
        except ValueError:
            pass


def test_progressive_bomb_bound_and_scan_cap():
    enc = jc.encode_progressive_jpeg(_gradient(8, 8), quality=90)
    i = enc.index(b"\xff\xc2")
    huge = bytearray(enc)
    struct.pack_into(">HH", huge, i + 5, 30000, 30000)
    with pytest.raises(ValueError, match="micro-decoder bound"):
        jc.decode_jpeg(bytes(huge))
    # scan-count bound: replicate one scan's DHT+SOS+entropy past the cap
    frame_end = enc.index(b"\xff\xc4")  # first DHT (scans start here)
    eoi = enc.rindex(b"\xff\xd9")
    scans_blob = enc[frame_end:eoi]
    bomb = enc[:frame_end] + scans_blob * 40 + enc[eoi:]
    with pytest.raises(ValueError, match="scan count"):
        jc.decode_jpeg(bomb)


def test_progressive_extract_features_decodes(spark):
    from vectrekker_spark.operators.multimodal import extract_features

    payloads = [
        (1, jc.encode_progressive_jpeg(_gradient(16, 16), quality=90)),
        (2, jc.encode_jpeg(_gradient(16, 16), quality=90)),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    rows = {r.media_id: r for r in extract_features(df).collect()}
    assert rows[1].decoded is True
    # identical pixels -> identical features as the baseline encode
    assert rows[1].features == rows[2].features


def test_progressive_dc_accumulator_overflow_classifies():
    """Review r11: a crafted SOF2 DC scan that keeps emitting max-category
    positive diffs drives the DC predictor past the int32 coefficient
    store. That must be a ValueError (classification), never an
    OverflowError escaping decode_image_array (numpy>=2) or silent int32
    wraparound into garbage pixels (numpy 1.x)."""
    # hand-assemble: SOF2 grayscale 8x4096 (512 blocks), one DC scan at
    # Al=13 whose every diff is +2047 (category 11, magnitude bits all 1)
    def seg(marker, data):
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([16] * 64))
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 4096, 1) + bytes([1, 0x11, 0]))
    # DC table: category 11 gets the single 1-bit code '0'
    out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([11]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 13]))  # Ss=0 Se=0 Ah=0 Al=13
    bw = jc._BitWriter()
    for _ in range(512):
        bw.write(0, 1)  # the category-11 huffman code
        bw.write(0x7FF, 11)  # diff = +2047
    bw.flush()
    out += bytes(bw.out) + b"\xff\xd9"
    with pytest.raises(ValueError, match="DC accumulator"):
        jc.decode_jpeg(bytes(out))
    assert decode_image_array(bytes(out)) is None  # classified, not crashed

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
