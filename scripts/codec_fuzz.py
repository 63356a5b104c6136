"""Codec differential fuzzer (r12) — the exploratory-scale sibling of
the per-codec option-grid tests: seeded random images × random encoder
option combos, round-tripped bit-exact through the pure-Python codecs
(lossless paths), plus hostile-mutation sweeps (truncations + byte
flips) asserting the decode_image_array classification contract (None
or pixels, never a crash). The CI suites pin small fixed grids; this
script runs the same generators at campaign scale so a rare option
interaction (the kind that produced the VP8L meta-group desync) has
room to surface.

Codecs: webp (VP8L: transforms × cache × LZ77 × meta), png, bmp, gif
(palette sizes × interlace). JPEG is lossy — covered by its own
quantized-coefficient equivalence tests, not round-trippable here.

Usage: python scripts/codec_fuzz.py [n_per_codec] [seed ...]
Failures print a one-line repro (codec, seed, trial, opts).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def _image(rng, h, w, c):
    kind = int(rng.randint(0, 4))
    if kind == 0:
        return rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    if kind == 1:
        yy, xx = np.mgrid[0:h, 0:w]
        chans = [(yy * 3) % 256, (xx * 5) % 256, (yy + xx) % 256, (yy * xx) % 256]
        return np.stack(chans[:c], axis=2).astype(np.uint8)
    if kind == 2:
        return (rng.randint(0, 5, (h, w, c)) * 61).astype(np.uint8)
    tile = rng.randint(0, 256, (max(1, h // 3), max(1, w // 3), c))
    return np.tile(tile, (4, 4, 1))[:h, :w].astype(np.uint8)


def trial_webp(rng):
    from vectrekker_spark.functions import webpcodec as wc

    h, w = int(rng.randint(1, 48)), int(rng.randint(1, 48))
    c = int(rng.choice([3, 4]))
    arr = _image(rng, h, w, c)
    opts = {}
    if rng.rand() < 0.4:
        opts["subtract_green"] = True
    if rng.rand() < 0.4:
        opts["predictor"] = (
            int(rng.randint(2, 7)),
            rng.choice([*range(14), "mixed"]),
        )
    if rng.rand() < 0.3:
        opts["color_transform"] = (
            int(rng.randint(2, 6)),
            tuple(int(v) for v in rng.randint(-128, 128, 3)),
        )
    if (
        not opts
        and rng.rand() < 0.5
        and len(set(map(tuple, arr.reshape(-1, c)))) <= 256
    ):
        opts = {"palette": True}
    if rng.rand() < 0.5:
        opts["cache_bits"] = int(rng.randint(1, 12))
    if rng.rand() < 0.5:
        opts["use_lz77"] = True
        if rng.rand() < 0.5:
            opts["lz77_dists"] = (int(rng.randint(2, 300)),)
    if rng.rand() < 0.3:
        opts["meta_bits"] = int(rng.randint(2, 7))
    enc = wc.encode_webp(arr, **opts)
    out = wc.decode_webp(enc)
    ok = out.shape == arr.shape and np.array_equal(out, arr)
    return ok, enc, {k: str(v) for k, v in opts.items()}


def trial_png(rng):
    from vectrekker_spark.functions.imagecodec import decode_png, encode_png

    h, w = int(rng.randint(1, 64)), int(rng.randint(1, 64))
    c = int(rng.choice([1, 2, 3, 4]))
    arr = _image(rng, h, w, min(c, 4))[:, :, :c] if c >= 3 else (
        rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    )
    enc = encode_png(arr)
    out = decode_png(enc)
    return np.array_equal(out, arr), enc, {"channels": c}


def trial_bmp(rng):
    from vectrekker_spark.functions.bmpcodec import decode_bmp, encode_bmp

    h, w = int(rng.randint(1, 64)), int(rng.randint(1, 64))
    arr = _image(rng, h, w, 3)
    enc = encode_bmp(arr)
    out = decode_bmp(enc)
    return np.array_equal(out, arr), enc, {}


def trial_gif(rng):
    from vectrekker_spark.functions.gifcodec import decode_gif, encode_gif

    h, w = int(rng.randint(1, 64)), int(rng.randint(1, 64))
    n_colors = int(rng.choice([2, 4, 8, 16, 64, 256]))
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    idx = rng.randint(0, n_colors, (h, w)).astype(np.uint8)
    interlace = bool(rng.rand() < 0.4)
    enc = encode_gif(idx, pal, interlace=interlace)
    out = decode_gif(enc)
    return (
        np.array_equal(out, pal[idx]),
        enc,
        {"colors": n_colors, "interlace": interlace},
    )


CODECS = {"webp": trial_webp, "png": trial_png, "bmp": trial_bmp, "gif": trial_gif}


def fuzz(n=100, seed=7, codecs=None):
    from vectrekker_spark.functions.imagecodec import decode_image_array

    failures = []
    for ci, name in enumerate(codecs or CODECS):
        fn = CODECS[name]
        for t in range(n):
            rng = np.random.RandomState(seed * 10000 + ci * 1000 + t)
            try:
                ok, enc, opts = fn(rng)
            except Exception as e:
                failures.append(f"{name} seed={seed} trial={t} raised {e!r}")
                continue
            if not ok:
                failures.append(f"{name} seed={seed} trial={t} mismatch opts={opts}")
                continue
            # hostile mutations of a VALID stream: classify, never crash
            for _ in range(4):
                m = bytearray(enc)
                if rng.rand() < 0.5 and len(m) > 2:
                    m = m[: int(rng.randint(1, len(m)))]
                else:
                    m[int(rng.randint(0, len(m)))] ^= int(rng.randint(1, 256))
                try:
                    out = decode_image_array(bytes(m))
                    assert out is None or isinstance(out, np.ndarray)
                except Exception as e:
                    failures.append(
                        f"{name} seed={seed} trial={t} mutation crashed: {e!r}"
                    )
                    break
        print(f"{name} seed={seed}: {n} trials done", flush=True)
    return failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seeds = [int(a) for a in sys.argv[2:]] or [7]
    all_failures = []
    for seed in seeds:
        all_failures += fuzz(n=n, seed=seed)
    print(json.dumps({"codecs": list(CODECS), "n": n, "seeds": seeds,
                      "failures": len(all_failures)}))
    for f in all_failures:
        print("FAIL:", f)
    return 1 if all_failures else 0


if __name__ == "__main__":
    sys.exit(main())
