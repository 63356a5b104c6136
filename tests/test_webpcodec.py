"""Lossless-WebP (VP8L) micro-codec tests (r12: the last sniff-only image
format gains real pixels). The fixture encoder is an independent forward
implementation — real Huffman over measured frequencies, RLE code-length
transmission, LZ77 with the 2D distance map — so round-trips check the
decoder against the spec's stream format, not against itself; VP8L is
lossless, so round-trips are EXACT."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectrekker_spark.functions import webpcodec as wc
from vectrekker_spark.functions.imagecodec import (
    decode_image_array,
    sniff_image_meta,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


def _img(h, w, c=3, seed=7):
    return _rng(seed).randint(0, 256, (h, w, c)).astype(np.uint8)


# The first 48 entries of the spec's printed distance-map table (RFC 9649
# §4.2.2) — pins the generator's membership rule, distance ordering, and
# the descending-dy / positive-dx-first tie rules against the spec text.
_SPEC_DIST_HEAD = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
]


def test_distance_map_matches_the_spec_table():
    assert wc._DIST_MAP[:48] == _SPEC_DIST_HEAD
    assert len(wc._DIST_MAP) == 120
    assert len(set(wc._DIST_MAP)) == 120
    for dx, dy in wc._DIST_MAP:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0


def test_roundtrip_rgb_rgba_gray():
    for arr in (_img(13, 17, 3), _img(9, 11, 4, seed=2), _img(5, 6, 3, seed=3)):
        out = wc.decode_webp(wc.encode_webp(arr))
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)
    gray = _rng(4).randint(0, 256, (7, 8)).astype(np.uint8)
    out = wc.decode_webp(wc.encode_webp(gray))
    assert np.array_equal(out, gray[:, :, None].repeat(3, axis=2))


def test_every_predictor_mode_roundtrips():
    arr = _img(19, 23, 4, seed=5)
    for mode in [*range(14), "mixed"]:
        for bits in (2, 4):
            enc = wc.encode_webp(arr, predictor=(bits, mode))
            assert np.array_equal(wc.decode_webp(enc), arr), (mode, bits)


def test_color_transform_roundtrips_including_extremes():
    arr = _img(14, 10, 3, seed=6)
    for cte in [(0, 0, 0), (17, -23, 61), (-128, 127, -128), (127, 127, 127)]:
        enc = wc.encode_webp(arr, color_transform=(3, cte))
        assert np.array_equal(wc.decode_webp(enc), arr), cte


def test_subtract_green_cache_lz77_meta_and_combo():
    arr = _img(21, 16, 3, seed=8)
    assert np.array_equal(wc.decode_webp(wc.encode_webp(arr, subtract_green=True)), arr)
    for cb in (1, 4, 8, 11):
        assert np.array_equal(
            wc.decode_webp(wc.encode_webp(arr, cache_bits=cb)), arr
        ), cb
    rep = np.tile(_img(4, 16, 3, seed=9), (6, 1, 1))
    assert np.array_equal(wc.decode_webp(wc.encode_webp(rep, use_lz77=True)), rep)
    assert np.array_equal(wc.decode_webp(wc.encode_webp(arr, meta_bits=2)), arr)
    combo = wc.encode_webp(
        arr,
        subtract_green=True,
        predictor=(2, "mixed"),
        color_transform=(2, (17, -23, 61)),
        cache_bits=3,
        use_lz77=True,
        meta_bits=3,
    )
    assert np.array_equal(wc.decode_webp(combo), arr)


def test_palette_bundling_all_pack_widths():
    rng = _rng(11)
    # (n_colors, width): crosses every bundling width incl. non-multiple
    # widths whose last byte is partially filled
    for nc, w in [(2, 13), (2, 8), (4, 10), (16, 9), (16, 33), (200, 12)]:
        vals = (np.arange(nc) * 37 % 251).astype(np.uint8)
        idx = rng.randint(0, nc, (7, w))
        img = np.stack([vals[idx], 255 - vals[idx], vals[idx] // 2], axis=-1)
        enc = wc.encode_webp(img.astype(np.uint8), palette=True)
        assert np.array_equal(wc.decode_webp(enc), img), (nc, w)


def test_lz77_absolute_distance_beyond_the_2d_map():
    # horizontal period 15 at width 30: no (dx<=8, dy<=7) offset yields
    # distance 15, so the encoder must use the dist+120 absolute form —
    # and the decoder's >120 branch must invert it
    row = _img(1, 15, 3, seed=12)
    img = np.tile(row, (8, 2, 1))
    enc = wc.encode_webp(img, use_lz77=True, lz77_dists=(15,))
    assert np.array_equal(wc.decode_webp(enc), img)


def test_flat_and_two_color_images_use_degenerate_codes():
    # 1 distinct pixel → every prefix code is single-symbol (zero bits);
    # 2 distinct greens → the simple 2-symbol transmission form
    flat = np.full((40, 50, 3), 129, np.uint8)
    enc = wc.encode_webp(flat)
    assert len(enc) < 64  # the zero-bit data section keeps it tiny
    assert np.array_equal(wc.decode_webp(enc), flat)
    two = np.zeros((9, 14, 3), np.uint8)
    two[::2, ::3] = (200, 10, 90)
    assert np.array_equal(wc.decode_webp(wc.encode_webp(two)), two)


def test_vp8x_container_and_lossy_classification():
    arr = _img(6, 7, 3, seed=13)
    bare = wc.encode_webp(arr)
    vp8l_chunk = bare[12:]  # the VP8L chunk incl. header
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(4) + b"\x06\x00\x00\x05\x00\x00"
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk)) + b"WEBP" + vp8x + vp8l_chunk
    assert np.array_equal(wc.decode_webp(wrapped), arr)
    # lossy VP8 raises (classification) — decode_image_array yields None
    # but the sniff still reports dims for the same payload
    lossy = bytearray(bare)
    lossy[12:16] = b"VP8 "
    with pytest.raises(ValueError, match="lossy"):
        wc.decode_webp(bytes(lossy))


def test_bomb_bound_before_allocation():
    enc = bytearray(wc.encode_webp(_img(4, 4, 3, seed=14)))
    # VP8L payload: RIFF(12) + chunk header(8) + signature byte, then the
    # 14+14-bit dims — patch to 16383x16383 (≈1 GB decoded)
    struct.pack_into("<I", enc, 21, 0x0FFFFFFF)
    with pytest.raises(ValueError, match="micro-decoder bound"):
        wc.decode_webp(bytes(enc))


def test_hostile_inputs_classify_never_crash():
    arr = _img(11, 13, 3, seed=15)
    enc = wc.encode_webp(arr, cache_bits=2, use_lz77=True, predictor=(3, "mixed"))
    for cut in range(0, len(enc), 2):
        assert decode_image_array(enc[:cut] ) is None or cut == len(enc)
    for i in range(0, len(enc), 2):
        m = bytearray(enc)
        m[i] ^= 0xFF
        out = decode_image_array(bytes(m))  # None or some decoded array
        assert out is None or isinstance(out, np.ndarray)
    rng = _rng(16)
    for _ in range(50):
        blob = b"RIFF" + rng.bytes(40)
        assert decode_image_array(blob) is None


def test_decode_image_array_routes_webp_and_sniff_agrees():
    arr = _img(19, 27, 3, seed=17)
    enc = wc.encode_webp(arr, subtract_green=True, cache_bits=4)
    assert sniff_image_meta(enc) == {"format": "webp", "width": 27, "height": 19, "n_frames": 1, "is_animated": False}
    out = decode_image_array(enc)
    assert out is not None and np.array_equal(out, arr)


def test_extract_features_decodes_webp(spark):
    from vectrekker_spark.operators.multimodal import extract_features

    arr = _img(16, 16, 3, seed=18)
    df = spark.createDataFrame(
        [(1, wc.encode_webp(arr)), (2, b"RIFF----WEBPnope")],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in extract_features(df).collect()}
    assert rows[1].decoded is True
    assert abs(sum(rows[1].features) - 1.0) < 1e-9
    assert rows[2].decoded is False


def test_seeded_option_grid_roundtrips():
    """Randomized encoder-option sweep (the kernel-fuzz discipline): 40
    seeded draws over content type × transform combo × cache × lz77 ×
    meta — every stream must decode bit-exact."""
    rng = _rng(42)
    for trial in range(40):
        h = int(rng.randint(1, 33))
        w = int(rng.randint(1, 33))
        c = int(rng.choice([3, 4]))
        kind = trial % 4
        if kind == 0:
            arr = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
        elif kind == 1:  # gradient: predictor-friendly
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack([(yy * 3) % 256, (xx * 5) % 256, (yy + xx) % 256][:c]
                           + [np.full((h, w), 255)] * (c - 3), axis=2).astype(np.uint8)
        elif kind == 2:  # few colors
            arr = (rng.randint(0, 4, (h, w, c)) * 80).astype(np.uint8)
        else:  # tiled: lz77-friendly
            tile = rng.randint(0, 256, (max(1, h // 3), max(1, w // 3), c))
            arr = np.tile(tile, (4, 4, 1))[:h, :w].astype(np.uint8)
        opts = {}
        if rng.rand() < 0.4:
            opts["subtract_green"] = True
        if rng.rand() < 0.4:
            opts["predictor"] = (int(rng.randint(2, 6)),
                                 rng.choice([*range(14), "mixed"]))
        if rng.rand() < 0.3:
            opts["color_transform"] = (
                int(rng.randint(2, 6)),
                tuple(int(v) for v in rng.randint(-128, 128, 3)),
            )
        if not opts and rng.rand() < 0.5 and len(set(map(tuple, arr.reshape(-1, c)))) <= 256:
            opts = {"palette": True}
        if rng.rand() < 0.5:
            opts["cache_bits"] = int(rng.randint(1, 12))
        if rng.rand() < 0.5:
            opts["use_lz77"] = True
            if rng.rand() < 0.5:
                opts["lz77_dists"] = (int(rng.randint(2, 200)),)
        if rng.rand() < 0.3:
            opts["meta_bits"] = int(rng.randint(2, 6))
        enc = wc.encode_webp(arr, **opts)
        out = wc.decode_webp(enc)
        assert out.shape == arr.shape, (trial, opts)
        assert np.array_equal(out, arr), (trial, opts)


def test_encoder_option_validation_and_distance_cap():
    # review r12: out-of-range options must raise at encode time, not
    # emit a stream that misparses far from the mistake
    arr = _img(6, 8, 3, seed=19)
    with pytest.raises(ValueError, match="meta_bits"):
        wc.encode_webp(arr, meta_bits=10)
    with pytest.raises(ValueError, match="cache_bits"):
        wc.encode_webp(arr, cache_bits=12)
    # a caller-supplied distance beyond the 40-code alphabet's max value
    # (1048456 = 1048576 - 120) is skipped by the matcher, not emitted
    big = np.zeros((1200, 1000, 3), np.uint8)
    big[0] = big[1050] = (7, 99, 201)
    enc = wc.encode_webp(big[:, :64], use_lz77=True, lz77_dists=(1_050_000,))
    assert np.array_equal(wc.decode_webp(enc), big[:, :64])


def _libwebp():
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("webp")
    if not name:
        pytest.skip("libwebp not installed (container-dependent golden)")
    lib = ctypes.CDLL(name)
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def _libwebp_decode_rgba(lib, data: bytes) -> np.ndarray:
    import ctypes

    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert ptr, "libwebp refused the stream"
    try:
        n = w.value * h.value * 4
        out = np.frombuffer(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * n)).contents, np.uint8
        ).reshape(h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return out


def test_libwebp_golden_parity_both_directions():
    """The golden anchor self round-trips cannot provide: bit-exact
    agreement with the reference implementation, both directions —
    (a) our decoder on libwebp-encoded streams (pins the reconstructed
    distance map, bit conventions, transforms, prefix machinery against
    reality, not against our own encoder), (b) libwebp's decoder on our
    fixture streams. Skipped where libwebp is absent (the protobuf-skip
    idiom); green on this container's libwebp 7.1.5."""
    import ctypes

    lib = _libwebp()
    rng = _rng(21)
    # (a) libwebp encodes → our decode must equal libwebp's own decode.
    # Alpha stays >= 1: libwebp's default exact=0 rewrites RGB under
    # fully transparent pixels, a cleanup choice, not a codec behavior.
    for trial in range(12):
        h = int(rng.randint(1, 64))
        w = int(rng.randint(1, 64))
        kind = trial % 4
        if kind == 0:
            arr = rng.randint(0, 256, (h, w, 4))
        elif kind == 1:
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [(yy * 7) % 256, (xx * 3) % 256, (yy + xx) % 256,
                 np.full((h, w), 255)], axis=2)
        elif kind == 2:
            arr = rng.randint(0, 3, (h, w, 4)) * 90
        else:
            tile = rng.randint(0, 256, (max(1, h // 4), max(1, w // 4), 4))
            arr = np.tile(tile, (5, 5, 1))[:h, :w]
        arr = arr.astype(np.uint8)
        arr[:, :, 3] = np.maximum(arr[:, :, 3], 1)
        rgba = np.ascontiguousarray(arr)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        size = lib.WebPEncodeLosslessRGBA(
            rgba.tobytes(), w, h, w * 4, ctypes.byref(out_ptr)
        )
        assert size > 0
        try:
            stream = ctypes.string_at(out_ptr, size)
        finally:
            lib.WebPFree(ctypes.cast(out_ptr, ctypes.c_void_p))
        theirs = _libwebp_decode_rgba(lib, stream)
        ours = wc.decode_webp(stream)
        if ours.shape[2] == 3:  # alpha hint unset: constant 255
            ours = np.concatenate(
                [ours, np.full((h, w, 1), 255, np.uint8)], axis=2
            )
        assert np.array_equal(ours, theirs), (trial, kind)

    # (b) our fixture encoder → libwebp must decode it bit-exactly
    for trial, opts in enumerate([
        {},
        {"subtract_green": True, "cache_bits": 5},
        {"predictor": (3, "mixed"), "use_lz77": True},
        {"color_transform": (2, (17, -23, 61)), "meta_bits": 3},
        {"palette": True},
        {"subtract_green": True, "predictor": (2, 11), "cache_bits": 2,
         "use_lz77": True, "meta_bits": 4},
    ]):
        h, w = 21, 17
        if opts.get("palette"):
            colors = rng.randint(0, 256, (7, 4)).astype(np.uint8)
            colors[:, 3] = 255
            arr = colors[rng.randint(0, 7, (h, w))]
        else:
            arr = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
        enc = wc.encode_webp(arr, **opts)
        theirs = _libwebp_decode_rgba(lib, enc)
        assert np.array_equal(theirs, arr), (trial, opts)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
