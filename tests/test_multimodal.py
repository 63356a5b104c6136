"""Multimodal plumbing tests: real Spark schema/batch path, stubbed decode
(media libs absent in this container — SURVEY.md north-star multimodal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.multimodal import (
    byte_histogram_features,
    decode_image,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture()
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
    )


def test_extract_features_matches_local(spark, media):
    rows = extract_features(media).collect()
    assert len(rows) == 50
    originals = {
        r["media_id"]: bytes(r["content"]) for r in media.collect()
    }
    for r in rows:
        expected = byte_histogram_features(originals[r["media_id"]])
        assert r["n_bytes"] == len(originals[r["media_id"]])
        assert r["decoded"] is False  # text bytes are not a decodable image
        assert [round(x, 9) for x in r["features"]] == [round(x, 9) for x in expected]
        assert abs(sum(r["features"]) - 1.0) < 1e-9


def test_frame_sample_plan(spark, media):
    out = frame_sample_plan(media, every_n=2, frame_size=64)
    rows = out.collect()
    assert {c for c in out.columns} == {"media_id", "frame_no", "byte_offset"}
    assert all(r["byte_offset"] == r["frame_no"] * 64 for r in rows)
    assert all(r["frame_no"] % 2 == 0 for r in rows)


def test_resize_stand_in_shape(spark, media):
    # the fixture's random bytes are not decodable images: on an environment
    # WITH PIL the executor branch would raise UnidentifiedImageError, so
    # this asserts the deterministic stand-in only where it actually runs
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        import pytest

        pytest.skip("PIL present: real decode path active; stand-in not used")
    from vectrekker_spark.operators.multimodal import resize_images, strided_downsample

    out = resize_images(media, factor=4).collect()
    originals = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert len(out) == 50
    for r in out:
        assert bytes(r["content"]) == strided_downsample(originals[r["media_id"]], 4)
        assert len(r["content"]) <= len(originals[r["media_id"]]) // 4 + 1


def test_pcm_window_features_on_synthetic_sine(spark):
    import numpy as np

    from vectrekker_spark.operators.multimodal import pcm_window_features

    sr, freq, amp = 16000, 100.0, 0.5
    t = np.arange(sr) / sr  # 1 second
    wave = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    silent = np.zeros(sr, dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(wave.tobytes())), (2, bytearray(silent.tobytes())),
         (3, bytearray(b"\x01"))],  # <1 window → no rows
        "media_id long, content binary",
    )
    rows = pcm_window_features(df, window=1600).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 10 and len(by_id[2]) == 10 and 3 not in by_id
    for r in by_id[1]:
        # sine RMS = amp/sqrt(2); ZCR = 2 crossings per cycle
        assert abs(r["rms"] - amp / np.sqrt(2)) < 0.01
        expected_zcr = 2 * freq * (1600 / sr) / 1600
        assert abs(r["zcr"] - expected_zcr) < 0.005
    assert all(r["rms"] == 0.0 and r["zcr"] == 0.0 for r in by_id[2])


def test_decode_image_stub_raises_without_pil():
    pytest.importorskip  # real decode only runs where PIL exists
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


# --- header sniffing (format + dimensions without decode) -------------------


def _jpeg_bytes(w=640, h=480):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x01" + b"\x11\x00\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(w=320, h=200):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _bmp_bytes(w=100, h=-50):
    import struct

    return b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, h)


def test_sniff_image_meta_known_formats():
    import numpy as np

    from vectrekker_spark.functions.imagecodec import encode_png, sniff_image_meta

    png = encode_png(np.zeros((7, 9, 3), dtype=np.uint8))
    still = {"n_frames": 1, "is_animated": False}
    assert sniff_image_meta(png) == {
        "format": "png", "width": 9, "height": 7, **still,
    }
    assert sniff_image_meta(_jpeg_bytes()) == {
        "format": "jpeg", "width": 640, "height": 480, **still,
    }
    # the minimal GIF fixture has no block stream at all: dims parse, the
    # frame walk classifies (NULL counts — exact or nothing, r13)
    assert sniff_image_meta(_gif_bytes()) == {
        "format": "gif", "width": 320, "height": 200,
        "n_frames": None, "is_animated": None,
    }
    # BMP height is stored negative for top-down rows — reported absolute
    assert sniff_image_meta(_bmp_bytes()) == {
        "format": "bmp", "width": 100, "height": 50, **still,
    }
    assert sniff_image_meta(b"P6\n# comment\n12 34\n255\n") == {
        "format": "ppm", "width": 12, "height": 34, **still,
    }
    assert sniff_image_meta(b"") is None
    assert sniff_image_meta(b"not an image at all") is None


def test_sniff_never_raises_on_garbage_or_truncation():
    import random

    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    rng = random.Random(42)
    for _ in range(200):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        sniff_image_meta(blob)  # any result, no exception
    for payload in (_jpeg_bytes(), _gif_bytes(), _bmp_bytes(), b"P6 1 1 255 "):
        for cut in range(len(payload)):
            sniff_image_meta(payload[:cut])  # truncations never raise


def test_image_meta_operator(spark):
    import numpy as np

    from vectrekker_spark.functions.imagecodec import encode_png
    from vectrekker_spark.operators.multimodal import image_meta

    rows = [
        (1, bytearray(encode_png(np.zeros((4, 6, 3), dtype=np.uint8)))),
        (2, bytearray(_jpeg_bytes(w=32, h=16))),
        (3, bytearray(b"garbage bytes")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in image_meta(df).collect()}
    assert (got[1]["img_format"], got[1]["img_width"], got[1]["img_height"]) == (
        "png", 6, 4,
    )
    assert (got[2]["img_format"], got[2]["img_width"], got[2]["img_height"]) == (
        "jpeg", 32, 16,
    )
    assert got[3]["img_format"] is None and got[4]["img_format"] is None


def test_sniff_rejects_hostile_dimensions(spark):
    """Out-of-int32 dimensions must yield None (they crashed the Int32
    kernel columns before), and a BITMAPCOREHEADER BMP (DIB size 12,
    16-bit dims) must parse correctly instead of fusing width|height."""
    import struct

    from vectrekker_spark.functions.imagecodec import PNG_MAGIC, sniff_image_meta
    from vectrekker_spark.operators.multimodal import image_meta

    hostile_png = (
        PNG_MAGIC + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 0xFFFFFFFF, 7) + b"\x08\x02\x00\x00\x00"
    )
    assert sniff_image_meta(hostile_png) is None
    assert sniff_image_meta(b"P6 99999999999999 7 255 ") is None
    assert sniff_image_meta(b"P6 0 7 255 ") is None  # zero-dim: invalid

    core_bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 100, 50)
    )
    assert sniff_image_meta(core_bmp) == {
        "format": "bmp", "width": 100, "height": 50,
        "n_frames": 1, "is_animated": False,
    }

    # end-to-end: the hostile payloads classify as NULL, never crash a task
    df = spark.createDataFrame(
        [(1, bytearray(hostile_png)), (2, bytearray(b"P6 99999999999999 7 255 "))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r["img_format"] for r in image_meta(df).collect()}
    assert got == {1: None, 2: None}


def test_sniff_jpeg_fill_byte_walk_is_bounded():
    """b'\\xff\\xd8' + megabytes of 0xFF fill must return fast (the marker
    walk caps its scanned prefix), not iterate the whole payload."""
    import time

    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    blob = b"\xff\xd8" + b"\xff" * (8 << 20)
    t0 = time.time()
    assert sniff_image_meta(blob) is None
    assert time.time() - t0 < 2.0


def test_image_meta_refuses_output_column_clash(spark):
    from pyspark.sql import functions as F

    from vectrekker_spark.operators.multimodal import image_meta

    df = spark.createDataFrame([(1, bytearray(b""))], "media_id long, content binary")
    with pytest.raises(ValueError, match="img_width"):
        image_meta(df.withColumn("img_width", F.lit(1)))


def test_audio_meta_operator(spark):
    import struct as _struct

    import numpy as np

    from vectrekker_spark.operators.multimodal import audio_meta

    def wav_bytes(frames, ch, rate):
        samples = np.zeros((frames, ch), dtype=np.int16)
        data = samples.tobytes()
        fmt = _struct.pack("<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch, 16)
        chunks = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                  + b"data" + _struct.pack("<I", len(data)) + data)
        return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    rows = [
        (1, bytearray(wav_bytes(1600, 1, 16000))),
        (2, bytearray(b"not audio")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in audio_meta(df).collect()}
    assert got[1]["aud_rate"] == 16000 and got[1]["aud_channels"] == 1
    assert got[1]["aud_duration"] == pytest.approx(0.1)
    assert got[2]["aud_rate"] is None and got[3]["aud_rate"] is None
    from pyspark.sql import functions as FF

    with pytest.raises(ValueError, match="aud_rate"):
        audio_meta(df.withColumn("aud_rate", FF.lit(1)))


def test_resize_real_pixels_without_pil(spark):
    """r10: payloads the micro-decoders understand get a REAL resize even
    without PIL — decode → area-average box filter → PNG re-encode —
    with the strided stand-in only for undecodable bytes in the same
    batch (classify, don't abort)."""
    import importlib.util

    import numpy as np
    import pytest

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("PIL present: library path active; micro path not used")

    from vectrekker_spark.functions.imagecodec import (
        decode_png,
        encode_png,
        sniff_image_meta,
    )
    from vectrekker_spark.functions.jpegcodec import encode_jpeg
    from vectrekker_spark.operators.multimodal import (
        downsample_area,
        micro_resize,
        resize_images,
        strided_downsample,
    )

    yy, xx = np.mgrid[0:37, 0:53]
    rgb = np.stack(
        [yy * 255 // 36, xx * 255 // 52, (yy + xx) * 255 // 88], axis=2
    ).astype(np.uint8)
    payloads = [
        (1, encode_png(rgb)),
        (2, encode_jpeg(rgb, quality=95)),
        (3, b"not an image at all"),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    out = {r.media_id: bytes(r.content) for r in resize_images(df, factor=4).collect()}

    # decodable payloads: real pixels, PNG output, ceil(37/4) x ceil(53/4)
    for mid in (1, 2):
        meta = sniff_image_meta(out[mid])
        assert meta == {"format": "png", "width": 14, "height": 10, "n_frames": 1, "is_animated": False}
    # the PNG input's resize is exactly the box filter of its pixels
    assert np.array_equal(decode_png(out[1]), downsample_area(rgb, 4))
    # JPEG input: lossy decode first, so compare against its own micro path
    assert out[2] == micro_resize(payloads[1][1], 4)
    # undecodable bytes fall back to the stand-in
    assert out[3] == strided_downsample(payloads[2][1], 4)


def test_downsample_area_properties():
    import numpy as np
    import pytest

    from vectrekker_spark.operators.multimodal import downsample_area

    # constant image stays constant at any factor (box filter is exact)
    flat = np.full((9, 7, 3), 123, dtype=np.uint8)
    for f in (1, 2, 3, 4):
        small = downsample_area(flat, f)
        assert small.shape == (-(-9 // f), -(-7 // f), 3)
        assert (small == 123).all()
    # factor 1 is the identity
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (8, 8, 2), dtype=np.uint8)
    assert downsample_area(arr, 1) is arr
    # mean correctness on a hand-checkable block
    a = np.zeros((2, 2, 1), dtype=np.uint8)
    a[0, 0, 0], a[0, 1, 0], a[1, 0, 0], a[1, 1, 0] = 10, 20, 30, 40
    assert downsample_area(a, 2)[0, 0, 0] == 25
    with pytest.raises(ValueError, match="factor"):
        downsample_area(a, 0)


# --- animation inventory (r13): GIF sub-block walk + WebP ANMF chunks -------


def _animated_gif(n_frames=3, gct=True):
    """Hand-built GIF89a: LSD (+GCT), per-frame GCE extension + image
    descriptor + opaque data sub-blocks, trailer. The frame-count walk
    skips data by length bytes, so the LZW payload can be junk."""
    import struct

    out = b"GIF89a" + struct.pack("<HH", 10, 8)
    out += bytes([0x91 if gct else 0x11, 0, 0])  # packed, bg, aspect
    if gct:
        out += bytes(3 * 4)  # 2-bit GCT: 4 entries
    for i in range(n_frames):
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 4-byte block + 0
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 10, 8) + b"\x00"
        out += b"\x02" + bytes([5]) + bytes([i] * 5) + b"\x00"  # LZW + subblocks
    return out + b"\x3b"


def _animated_webp(n_frames=4):
    """VP8X WebP with the animation flag, an ANIM chunk and n ANMF frames
    (opaque frame payloads — the walk reads chunk sizes only)."""

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + len(payload).to_bytes(4, "little") + payload + pad

    vp8x = chunk(
        b"VP8X",
        bytes([0x02, 0, 0, 0]) + (9).to_bytes(3, "little")
        + (7).to_bytes(3, "little"),
    )
    anim = chunk(b"ANIM", b"\x00" * 6)
    frames = b"".join(
        chunk(b"ANMF", bytes([i] * 17)) for i in range(n_frames)
    )
    body = b"WEBP" + vp8x + anim + frames
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_gif_animation_frame_count():
    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    m = sniff_image_meta(_animated_gif(3))
    assert (m["n_frames"], m["is_animated"]) == (3, True)
    m1 = sniff_image_meta(_animated_gif(1, gct=False))
    assert (m1["n_frames"], m1["is_animated"]) == (1, False)
    # a REAL encoded still (encode_gif) reports exactly 1 frame
    import numpy as np

    from vectrekker_spark.functions.gifcodec import encode_gif

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    real = encode_gif(np.zeros((6, 5), dtype=np.uint8), pal)
    mr = sniff_image_meta(real)
    assert (mr["n_frames"], mr["is_animated"]) == (1, False)
    # truncation mid-stream after ≥2 frames: animated yes, count NULL
    data = _animated_gif(4)
    mt = sniff_image_meta(data[: len(data) - 30])
    assert mt["is_animated"] is True and mt["n_frames"] is None


def test_webp_animation_anmf_count():
    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    m = sniff_image_meta(_animated_webp(4))
    assert m["format"] == "webp" and m["width"] == 10 and m["height"] == 8
    assert (m["n_frames"], m["is_animated"]) == (4, True)
    # VP8X without the animation flag: a still canvas
    still = _animated_webp(0)
    still = still.replace(bytes([0x02, 0, 0, 0]), bytes([0x00, 0, 0, 0]), 1)
    ms = sniff_image_meta(still)
    assert (ms["n_frames"], ms["is_animated"]) == (1, False)
    # truncated chunk walk: the flag still answers, the count goes NULL
    mt = sniff_image_meta(_animated_webp(4)[:-10])
    assert mt["is_animated"] is True and mt["n_frames"] is None


def test_animation_never_raises_fuzz():
    import random

    from vectrekker_spark.functions.imagecodec import sniff_image_meta

    for base in (_animated_gif(3), _animated_webp(4)):
        for cut in range(len(base)):
            r = sniff_image_meta(base[:cut])
            assert r is None or isinstance(r, dict)
        rng = random.Random(7)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            r = sniff_image_meta(bytes(b))
            assert r is None or isinstance(r, dict)


def test_image_meta_animation_columns(spark):
    import numpy as np

    from vectrekker_spark.functions.imagecodec import encode_png
    from vectrekker_spark.operators.multimodal import image_meta

    df = spark.createDataFrame(
        [
            (1, bytearray(_animated_gif(5))),
            (2, bytearray(_animated_webp(2))),
            (3, bytearray(encode_png(np.zeros((3, 3, 3), dtype=np.uint8)))),
            (4, None),
        ],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in image_meta(df).collect()}
    assert (got[1]["img_frames"], got[1]["img_animated"]) == (5, True)
    assert (got[2]["img_frames"], got[2]["img_animated"]) == (2, True)
    assert (got[3]["img_frames"], got[3]["img_animated"]) == (1, False)
    assert got[4]["img_frames"] is None and got[4]["img_animated"] is None


def test_apng_actl_frame_count():
    """APNG: a still PNG with an acTL chunk spliced before IDAT reports
    the declared frame count; plain PNGs keep (1, False)."""
    import struct
    import zlib

    import numpy as np

    from vectrekker_spark.functions.imagecodec import (
        encode_png,
        sniff_image_meta,
    )

    png = encode_png(np.zeros((5, 4, 3), dtype=np.uint8))

    def chunk(typ, data):
        body = typ + data
        return (
            struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    # splice acTL right after IHDR (sig 8 + IHDR chunk 25 bytes)
    cut = 8 + 25
    apng = png[:cut] + chunk(b"acTL", struct.pack(">II", 7, 0)) + png[cut:]
    m = sniff_image_meta(apng)
    assert (m["n_frames"], m["is_animated"]) == (7, True)
    assert (m["width"], m["height"]) == (4, 5)
    still = sniff_image_meta(png)
    assert (still["n_frames"], still["is_animated"]) == (1, False)
    # truncation inside the walk never raises
    for cut2 in range(len(apng)):
        r = sniff_image_meta(apng[:cut2])
        assert r is None or isinstance(r, dict)
