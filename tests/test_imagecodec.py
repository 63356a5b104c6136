"""Pure-numpy PNG/PPM micro-decoder tests (r7 verdict #7): the multimodal
path runs a REAL decode end-to-end with no media library. The forward PNG
filters are implemented independently HERE, so the decoder's inverse is
checked against the spec, not against itself."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectrekker_spark.functions.imagecodec import (
    decode_image_array,
    decode_png,
    decode_ppm,
    encode_png,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("channels", [1, 2, 3, 4], ids=["gray", "gray+a", "rgb", "rgba"])
def test_png_roundtrip(channels):
    arr = _rng(channels).randint(0, 256, size=(13, 9, channels), dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def _forward_filter(f: int, raw: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Spec §6 forward filters (independent of the decoder's inverse)."""
    raw_i, prev_i = raw.astype(np.int64), prev.astype(np.int64)
    out = np.empty(len(raw), dtype=np.int64)
    for i in range(len(raw)):
        a = raw_i[i - bpp] if i >= bpp else 0
        b = prev_i[i]
        c = prev_i[i - bpp] if i >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (raw_i[i] - pred) % 256
    return out.astype(np.uint8).tobytes()


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4], ids=["none", "sub", "up", "avg", "paeth"])
def test_png_all_filter_types_reconstruct(f):
    import struct
    import zlib

    arr = _rng(f + 10).randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, c = arr.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        raw += bytes([f]) + _forward_filter(f, line, prev, c)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), arr)


def test_ppm_decode_with_comments():
    arr = _rng(3).randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    ppm = b"P6 # a comment\n# another\n 6 4\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(ppm), arr)


def test_unsupported_variants_raise_or_none():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")  # ASCII PPM out of scope
    assert decode_image_array(b"\xff\xd8\xff\xe0JFIF") is None  # JPEG
    assert decode_image_array(b"") is None
    assert decode_image_array(b"plain text") is None
    # corrupt IDAT (zlib.error) and truncated IHDR (struct.error) are
    # classification outcomes, not crashes
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    corrupt = bytearray(good)
    corrupt[43] ^= 0xFF  # flip a byte inside the compressed stream
    assert decode_image_array(bytes(corrupt)) is None
    assert decode_image_array(good[:20]) is None
    # truncated pixel data must not decode
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image_array(b"P6\n2 2\n255\n" + arr.tobytes()[:-1]) is None


def test_decode_image_uses_micro_decoder_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: decode_image returns PIL.Image there")
    except ImportError:
        pass
    from vectrekker_spark.operators.multimodal import decode_image

    arr = _rng(1).randint(0, 256, size=(3, 4, 3), dtype=np.uint8)
    out = decode_image(encode_png(arr))
    assert np.array_equal(out, arr)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")  # JPEG stays out of scope


def test_extract_features_real_decode_end_to_end(spark):
    """A mixed corpus: real PNG payloads get decoded-pixel features
    (provably different from the byte histogram of the same payload);
    non-image payloads fall back, flagged decoded=false."""
    from vectrekker_spark.operators.multimodal import (
        byte_histogram_features,
        extract_features,
        image_pixel_features,
    )

    png1 = encode_png(_rng(11).randint(0, 256, size=(16, 16, 3), dtype=np.uint8))
    png2 = encode_png(np.full((8, 8), 200, dtype=np.uint8))  # grayscale
    ppm = b"P6\n4 4\n255\n" + _rng(12).randint(0, 256, (4, 4, 3), np.uint8).tobytes()
    txt = b"not an image at all"
    df = spark.createDataFrame(
        [(1, bytearray(png1)), (2, bytearray(png2)),
         (3, bytearray(ppm)), (4, bytearray(txt))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in extract_features(df).collect()}
    assert [rows[i]["decoded"] for i in (1, 2, 3, 4)] == [True, True, True, False]
    for i, payload in [(1, png1), (2, png2), (3, ppm)]:
        assert rows[i]["features"] == pytest.approx(image_pixel_features(payload))
        # pixel features ≠ byte histogram of the compressed payload:
        # the decode demonstrably happened
        assert rows[i]["features"] != pytest.approx(byte_histogram_features(payload))
    assert rows[4]["features"] == pytest.approx(byte_histogram_features(txt))
    # the flat-gray image concentrates all luminance in one bin
    assert rows[2]["features"][200 * 16 // 256] == pytest.approx(1.0)


def test_decompression_bomb_classifies_not_oom():
    # IHDR claims a huge image → rejected at the header (before any
    # allocation); a small-dims header with an over-long stream is caught
    # by the bounded decompress + length check. Neither may MemoryError.
    import struct
    import zlib

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    huge_ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 2, 0, 0, 0)
    bomb1 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", huge_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1024))
        + chunk(b"IEND", b"")
    )
    assert decode_image_array(bomb1) is None

    small_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", small_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (64 << 20)))  # 64 MB claimed
        + chunk(b"IEND", b"")
    )
    assert decode_image_array(bomb2) is None


def test_zero_dimension_images_rejected():
    import struct
    import zlib

    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 4, 3), dtype=np.uint8))

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    zero = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b""))
        + chunk(b"IEND", b"")
    )
    assert decode_image_array(zero) is None
    assert decode_image_array(b"P6\n0 0\n255\n") is None
    # so image_pixel_features can never emit NaNs flagged decoded=true
    from vectrekker_spark.operators.multimodal import image_pixel_features

    assert image_pixel_features(zero) is None


def test_ppm_low_maxval_rescales():
    # Netpbm samples are fractions of maxval: a maxval-15 image must not
    # collapse into luminance bin 0
    raw = np.array([[[15, 15, 15], [0, 0, 0]]], dtype=np.uint8)  # 1x2
    ppm = b"P6\n2 1\n15\n" + raw.tobytes()
    out = decode_ppm(ppm)
    assert out[0, 0].tolist() == [255, 255, 255]
    assert out[0, 1].tolist() == [0, 0, 0]
    mid = b"P6\n1 1\n100\n" + bytes([50, 50, 50])
    assert decode_ppm(mid)[0, 0].tolist() == [128, 128, 128]  # round(50*2.55)


def _webp(fourcc: bytes, payload: bytes) -> bytes:
    chunk = fourcc + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_sniff_webp_all_three_flavors():
    """WebP dims from the spec-built container (RFC 9649): lossy VP8
    (sync + 14-bit u16 dims), lossless VP8L (packed 14-bit fields),
    extended VP8X (24-bit canvas minus one)."""
    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    vp8 = _webp(
        b"VP8 ",
        b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240) + b"\x00" * 8,
    )
    assert sniff_image_meta(vp8) == {"format": "webp", "width": 320, "height": 240, "n_frames": 1, "is_animated": False}

    bits = (639 & 0x3FFF) | ((479 & 0x3FFF) << 14)
    vp8l = _webp(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 6)
    assert sniff_image_meta(vp8l) == {"format": "webp", "width": 640, "height": 480, "n_frames": 1, "is_animated": False}

    vp8x = _webp(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (1919).to_bytes(3, "little") + (1079).to_bytes(3, "little") + b"\x00",
    )
    assert sniff_image_meta(vp8x) == {
        "format": "webp", "width": 1920, "height": 1080,
        "n_frames": 1, "is_animated": False,
    }

    # hostile: bad sync / bad signature / truncation never raise
    bad = bytearray(vp8)
    bad[23] = 0x00
    assert sniff_image_meta(bytes(bad)) is None
    for cut in range(0, len(vp8)):
        sniff_image_meta(vp8[:cut])
    # a WebP payload is NOT pixel-decodable (no VP8 codec here): it must
    # classify to the byte-feature fallback, never crash
    assert decode_image_array(vp8) is None

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
