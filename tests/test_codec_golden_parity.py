"""System-library golden parity for the PNG and JPEG micro-codecs — the
r12 libwebp lesson generalized (VERDICT r12 #5): self round-trips share
assumptions, so each codec family gets an EXTERNAL reference anchor where
the container provides one.

Mechanism: tiny C shims compiled at test time against the system libpng /
libjpeg (raw ctypes against libjpeg is NOT safe — its error handling is
setjmp-based and its struct layout varies by ABI; a shim process isolates
any crash). Every gate skips cleanly where the toolchain or library is
absent (the protobuf-skip idiom). libFLAC is absent from this container,
so the FLAC gate documents itself via skip; the FLAC codec's external
anchor remains the WAV-transcode bit-parity test (test_flaccodec.py).

Parity contracts:
- PNG is lossless: bit-exact BOTH directions (libpng-written streams →
  decode_png; encode_png streams → libpng) across gray/GA/RGB/RGBA.
- JPEG decode is spec-approximate (the DCT/IDCT accuracy clause, ISO
  10918-1 Annex A): different conforming IDCTs may differ by a couple of
  LSBs, so the gate is dims-exact + small bounded pixel delta, measured
  against libjpeg's own decode of the SAME stream.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

_PNG_SHIM = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static void read_all(FILE *f, unsigned char **out, size_t *n) {
    size_t cap = 1 << 20, len = 0, r;
    unsigned char *buf = malloc(cap);
    while ((r = fread(buf + len, 1, cap - len, f)) > 0) {
        len += r;
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    *out = buf; *n = len;
}

int main(int argc, char **argv) {
    unsigned char *in; size_t n;
    read_all(stdin, &in, &n);
    png_image img; memset(&img, 0, sizeof img);
    img.version = PNG_IMAGE_VERSION;
    if (argc > 1 && strcmp(argv[1], "encode") == 0) {
        unsigned w, h, c;
        memcpy(&w, in, 4); memcpy(&h, in + 4, 4); memcpy(&c, in + 8, 4);
        img.width = w; img.height = h;
        img.format = c == 1 ? PNG_FORMAT_GRAY : c == 2 ? PNG_FORMAT_GA
                   : c == 3 ? PNG_FORMAT_RGB : PNG_FORMAT_RGBA;
        png_alloc_size_t size = 0;
        if (!png_image_write_to_memory(&img, NULL, &size, 0, in + 12,
                                       (png_int_32)(w * c), NULL)) return 2;
        void *mem = malloc(size);
        if (!png_image_write_to_memory(&img, mem, &size, 0, in + 12,
                                       (png_int_32)(w * c), NULL)) return 3;
        fwrite(mem, 1, size, stdout);
        return 0;
    }
    if (!png_image_begin_read_from_memory(&img, in, n)) return 2;
    unsigned c;
    switch (img.format & (PNG_FORMAT_FLAG_COLOR | PNG_FORMAT_FLAG_ALPHA)) {
        case 0: c = 1; img.format = PNG_FORMAT_GRAY; break;
        case PNG_FORMAT_FLAG_ALPHA: c = 2; img.format = PNG_FORMAT_GA; break;
        case PNG_FORMAT_FLAG_COLOR: c = 3; img.format = PNG_FORMAT_RGB; break;
        default: c = 4; img.format = PNG_FORMAT_RGBA; break;
    }
    size_t stride = (size_t)img.width * c;
    unsigned char *buf = malloc(stride * img.height);
    if (!png_image_finish_read(&img, NULL, buf, (png_int_32)stride, NULL))
        return 3;
    unsigned wh[3] = {img.width, img.height, c};
    fwrite(wh, 4, 3, stdout);
    fwrite(buf, 1, stride * img.height, stdout);
    return 0;
}
"""

_JPEG_SHIM = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

int main(int argc, char **argv) {
    struct jpeg_error_mgr jerr;
    if (argc > 1 && strcmp(argv[1], "encode") == 0) {
        unsigned hdr[3];
        if (fread(hdr, 4, 3, stdin) != 3) return 2;
        unsigned w = hdr[0], h = hdr[1], c = hdr[2];
        unsigned char *pix = malloc((size_t)w * h * c);
        if (fread(pix, 1, (size_t)w * h * c, stdin) != (size_t)w * h * c)
            return 2;
        struct jpeg_compress_struct cinfo;
        cinfo.err = jpeg_std_error(&jerr);
        jpeg_create_compress(&cinfo);
        jpeg_stdio_dest(&cinfo, stdout);
        cinfo.image_width = w; cinfo.image_height = h;
        cinfo.input_components = (int)c;
        cinfo.in_color_space = c == 3 ? JCS_RGB : JCS_GRAYSCALE;
        jpeg_set_defaults(&cinfo);
        jpeg_set_quality(&cinfo, argc > 2 ? atoi(argv[2]) : 90, TRUE);
        jpeg_start_compress(&cinfo, TRUE);
        while (cinfo.next_scanline < h) {
            JSAMPROW row = pix + (size_t)cinfo.next_scanline * w * c;
            jpeg_write_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_compress(&cinfo);
        return 0;
    }
    struct jpeg_decompress_struct cinfo;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, stdin);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) return 2;
    /* "plain": pixel-replication chroma upsampling — the filter our
       decoder implements; the default is libjpeg's triangular "fancy"
       filter, a decoder choice ISO 10918-1 does not pin */
    if (argc > 1 && strcmp(argv[1], "plain") == 0)
        cinfo.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&cinfo);
    unsigned w = cinfo.output_width, h = cinfo.output_height;
    unsigned c = (unsigned)cinfo.output_components;
    unsigned wh[3] = {w, h, c};
    fwrite(wh, 4, 3, stdout);
    unsigned char *row = malloc((size_t)w * c);
    while (cinfo.output_scanline < h) {
        JSAMPROW r = row;
        jpeg_read_scanlines(&cinfo, &r, 1);
        fwrite(row, 1, (size_t)w * c, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    return 0;
}
"""


def _build_shim(tmpdir: str, name: str, source: str, lib: str) -> str | None:
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    src = os.path.join(tmpdir, f"{name}.c")
    exe = os.path.join(tmpdir, name)
    with open(src, "w") as f:
        f.write(source)
    r = subprocess.run(
        [cc, "-O1", "-o", exe, src, f"-l{lib}"], capture_output=True
    )
    return exe if r.returncode == 0 else None


@pytest.fixture(scope="session")
def png_shim(tmp_path_factory):
    exe = _build_shim(
        str(tmp_path_factory.mktemp("pngshim")), "png_shim", _PNG_SHIM, "png"
    )
    if exe is None:
        pytest.skip("no cc/libpng dev toolchain (container-dependent golden)")
    return exe


@pytest.fixture(scope="session")
def jpeg_shim(tmp_path_factory):
    exe = _build_shim(
        str(tmp_path_factory.mktemp("jpgshim")), "jpeg_shim", _JPEG_SHIM, "jpeg"
    )
    if exe is None:
        pytest.skip("no cc/libjpeg dev toolchain (container-dependent golden)")
    return exe


def _run(exe, args, payload: bytes) -> bytes:
    r = subprocess.run([exe, *args], input=payload, capture_output=True)
    assert r.returncode == 0, (args, r.returncode, r.stderr[:200])
    return r.stdout


def _unpack_raw(blob: bytes):
    w, h, c = struct.unpack("<III", blob[:12])
    arr = np.frombuffer(blob[12 : 12 + w * h * c], np.uint8)
    return arr.reshape(h, w, c)


def _pack_raw(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return struct.pack("<III", w, h, c) + np.ascontiguousarray(arr).tobytes()


def _test_arrays(rng, channels):
    for trial in range(8):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        if trial % 3 == 0:
            yield rng.integers(0, 256, (h, w, channels)).astype(np.uint8)
        elif trial % 3 == 1:
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
            yield np.stack([(base + 31 * i) % 256 for i in range(channels)],
                           axis=2).astype(np.uint8)
        else:
            yield (rng.integers(0, 4, (h, w, channels)) * 85).astype(np.uint8)


def test_libpng_parity_both_directions(png_shim):
    """Lossless format, bit-exact contract: libpng must decode encode_png
    streams to the source pixels, and decode_png must reproduce pixels
    from libpng-written streams (which use libpng's own filter heuristics
    and zlib strategy — a different writer than ours)."""
    from vectrekker_spark.functions.imagecodec import decode_png, encode_png

    rng = np.random.default_rng(13)
    for channels in (1, 2, 3, 4):
        for arr in _test_arrays(rng, channels):
            squeezed = arr[:, :, 0] if channels == 1 else arr
            ours = encode_png(squeezed)
            theirs = _unpack_raw(_run(png_shim, [], ours))
            assert np.array_equal(theirs, arr), ("they-decode-ours", channels)

            stream = _run(png_shim, ["encode"], _pack_raw(arr))
            got = decode_png(stream)
            if got.ndim == 2:
                got = got[:, :, None]
            assert np.array_equal(got, arr), ("we-decode-theirs", channels)


def test_libjpeg_parity_decode_tolerance(jpeg_shim):
    """Same-stream decode agreement: both IDCTs are ISO 10918-1-conforming
    approximations, so outputs may differ by a few LSBs but never more.
    Gate: dims/channels exact, max |delta| ≤ 16, mean |delta| ≤ 1 — on
    BOTH our baseline and progressive streams, and on libjpeg-written
    streams. Subsampled (4:2:0) streams compare under the shim's "plain"
    mode (do_fancy_upsampling=FALSE): the chroma upsampling filter is a
    decoder CHOICE the spec doesn't pin, and ours is pixel replication —
    against libjpeg's default triangular filter the measured divergence
    is max 107 / mean 18 on saturated noise (filter difference, not a
    bug); against plain it is max 13 / mean 0.5."""
    from vectrekker_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(29)

    def check(stream, label, mode=()):
        theirs = _unpack_raw(_run(jpeg_shim, list(mode), stream))
        ours = decode_jpeg(stream)
        if ours.ndim == 2:
            ours = ours[:, :, None]
        assert ours.shape == theirs.shape, label
        delta = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
        assert delta.max() <= 16 and delta.mean() <= 1.0, (
            label, int(delta.max()), float(delta.mean())
        )

    for trial, arr in enumerate(_test_arrays(rng, 3)):
        check(encode_jpeg(arr, quality=90), ("ours-baseline", trial))
        check(
            encode_jpeg(arr, quality=85, subsampling="4:2:0"),
            ("ours-420", trial),
            mode=("plain",),
        )
        check(
            encode_progressive_jpeg(arr, quality=85, subsampling="4:2:0"),
            ("ours-progressive", trial),
            mode=("plain",),
        )
        # libjpeg's writer (its own quant tables, Huffman choices, and
        # default 4:2:0 sampling) → our decoder; plain-upsample compare
        # for the same filter-choice reason as above
        check(_run(jpeg_shim, ["encode", "90"], _pack_raw(arr)),
              ("theirs", trial), mode=("plain",))


def test_libflac_parity_gate():
    """libFLAC golden (decode-theirs / they-decode-ours) — skipped where
    the library is absent, which includes this container. The FLAC codec's
    standing external anchors: WAV-transcode feature bit-parity
    (test_flaccodec.py::test_feature_parity_wav_vs_flac_transcode) and the
    RFC 9639-built fixture suite."""
    import ctypes.util

    if not ctypes.util.find_library("FLAC"):
        pytest.skip("libFLAC not installed (container-dependent golden)")
    pytest.fail("libFLAC present but parity harness not implemented — "
                "extend this gate the way test_libpng_parity does")

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
