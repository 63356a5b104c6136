"""Natural-content precision/recall evaluation for the perceptual
image-dedup family (VERDICT r12 #6).

The media-benchmark corpus is parametric (tiled mgrid patterns — the
documented dup-degenerate LSH worst case), so it says nothing about how
dHash/pHash behave on natural-looking content. This harness generates
procedural natural-ish images (multi-octave value noise + gradients —
the closest a numpy-only container gets to photographs: smooth
large-scale structure with fine texture), plants the transformation
classes a web corpus actually contains, and measures pair-detection
precision/recall per Hamming threshold:

  planted positives per base image:
    jpeg85  — JPEG q85 4:2:0 recompression (the common web transcode)
    jpeg60  — aggressive q60 recompression
    bright  — +18 uniform brightness shift
    crop4   — ~8%% symmetric border crop (re-framing)
    crop8   — ~17%% crop (aggressive re-framing)
  negatives: all cross-base pairs (independent noise draws).

Ground truth is construction: a (base, variant) pair IS a near-dup; a
cross-base pair is not. Everything runs on the pure-numpy hash kernels
(dhash_bits / phash_bits — the identical code the Arrow operators call),
so the evaluation needs no Spark session and the numbers transfer
directly to the distributed operators.

Usage: python scripts/imagedup_eval.py [n_bases]    (default 150)
Prints one JSON line; record the table in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectrekker_spark.functions.jpegcodec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)
from vectrekker_spark.operators.imagedup import (  # noqa: E402
    dhash_bits,
    phash_bits,
)

SIZE = 96
THRESHOLDS = [0, 2, 4, 6, 8, 10, 12]
VARIANTS = ["jpeg85", "jpeg60", "bright", "crop4", "crop8"]


def _smooth_noise(rng, cells: int, size: int) -> np.ndarray:
    """Bilinear interpolation of a (cells+1)² random grid to size² —
    one octave of value noise."""
    grid = rng.random((cells + 1, cells + 1))
    xs = np.linspace(0, cells, size)
    i = np.minimum(xs.astype(int), cells - 1)
    f = xs - i
    # rows then cols
    top = grid[i][:, i] * (1 - f)[None, :] + grid[i][:, i + 1] * f[None, :]
    bot = grid[i + 1][:, i] * (1 - f)[None, :] + grid[i + 1][:, i + 1] * f[None, :]
    return top * (1 - f)[:, None] + bot * f[:, None]


def natural_image(rng, size: int = SIZE) -> np.ndarray:
    """Multi-octave noise + a random linear gradient, independently mixed
    into 3 channels — smooth structure at several scales plus texture."""
    field = sum(
        _smooth_noise(rng, c, size) * w
        for c, w in ((3, 1.0), (6, 0.55), (12, 0.3), (24, 0.15), (48, 0.08))
    )
    yy, xx = np.mgrid[0:size, 0:size] / size
    gx, gy = rng.uniform(-0.6, 0.6, 2)
    field = field + gx * xx + gy * yy
    chans = []
    for _ in range(3):
        a, b = rng.uniform(0.7, 1.3), rng.uniform(-0.15, 0.15)
        ch = field * a + b + _smooth_noise(rng, 12, size) * 0.12
        lo, hi = ch.min(), ch.max()
        chans.append(((ch - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8))
    return np.stack(chans, axis=2)


def make_variants(img: np.ndarray) -> dict[str, np.ndarray]:
    return {
        "jpeg85": decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0")),
        "jpeg60": decode_jpeg(encode_jpeg(img, quality=60, subsampling="4:2:0")),
        "bright": np.clip(img.astype(np.int16) + 18, 0, 255).astype(np.uint8),
        "crop4": img[4:-4, 4:-4],
        "crop8": img[8:-8, 8:-8],
    }


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def main() -> int:
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    rng = np.random.default_rng(13)
    base_hashes = {"dhash": [], "phash": []}
    var_hashes = {"dhash": {v: [] for v in VARIANTS},
                  "phash": {v: [] for v in VARIANTS}}
    for _ in range(n_bases):
        img = natural_image(rng)
        base_hashes["dhash"].append(dhash_bits(img))
        base_hashes["phash"].append(phash_bits(img))
        for vname, varr in make_variants(img).items():
            var_hashes["dhash"][vname].append(dhash_bits(varr))
            var_hashes["phash"][vname].append(phash_bits(varr))

    report: dict = {"n_bases": n_bases, "size": SIZE, "thresholds": THRESHOLDS}
    for hname in ("dhash", "phash"):
        bh = base_hashes[hname]
        pos = {
            v: [hamming(bh[i], var_hashes[hname][v][i]) for i in range(n_bases)]
            for v in VARIANTS
        }
        neg = [
            hamming(bh[i], bh[j])
            for i in range(n_bases)
            for j in range(i + 1, n_bases)
        ]
        out: dict = {}
        for t in THRESHOLDS:
            recalls = {
                v: round(sum(1 for d in pos[v] if d <= t) / n_bases, 3)
                for v in VARIANTS
            }
            fp = sum(1 for d in neg if d <= t)
            tp = sum(sum(1 for d in pos[v] if d <= t) for v in VARIANTS)
            out[str(t)] = {
                "recall": recalls,
                "fp_rate": round(fp / max(len(neg), 1), 5),
                "precision": round(tp / max(tp + fp, 1), 4),
            }
        # distance distributions for context: median positive per variant,
        # and the negative-pair floor (how close independent content gets)
        out["median_pos"] = {
            v: int(np.median(pos[v])) for v in VARIANTS
        }
        out["min_neg"] = int(min(neg)) if neg else None
        report[hname] = out
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
