"""Perceptual image near-duplicate detection: dHash (difference hash)
over the micro-decoders + a pigeonhole-banded Hamming join — the
multimodal × dedup crossover a training-data pipeline needs (the
image-side sibling of the text MinHash-LSH pipeline in operators/dedup
and the embedding-space SemDeDup in operators/semdedup).

Design (all from public technique descriptions — dHash is the classic
difference-hash: resample to a (H, W+1) grayscale grid, threshold each
horizontal gradient into one bit):

- ``image_dhash``: one zero-shuffle Arrow map — decode (PNG/PPM/JPEG/
  GIF/BMP/lossless-WebP via functions/imagecodec.decode_image_array),
  ITU-R 601 luma, area-average resample to a 9x8 grid, 64 gradient bits
  packed into one BIGINT. Undecodable payloads yield NULL (the
  classification contract — a corrupt image in a 100 TB corpus must not
  crash the batch, and NULL content is never "duplicate content").
  dHash is invariant to uniform brightness/contrast shifts (gradient
  SIGNS survive monotone point ops) and to lossless re-encoding across
  container formats; JPEG re-compression moves only a few bits.
  Animated payloads (GIF89a, WebP-ANMF) hash their FIRST frame only —
  the micro-decoders return frame 0 — so two animations sharing a first
  frame read as duplicates; inventory with image_meta's img_animated
  column first when per-frame semantics matter (r13).

- ``dhash_dedup_pairs``: candidate pairs by EXACT match on any of B
  hash bands, verified by popcount — the pigeonhole guarantee: two
  hashes within Hamming distance d < B agree exactly on at least one of
  B disjoint bands, so recall is EXACT (not probabilistic) for
  ``max_hamming`` ≤ bands-1. Defaults: bands = max_hamming + 1.

Threshold guidance (measured on 150 procedural natural-content bases ×
5 planted transforms vs 11k negative pairs — scripts/imagedup_eval.py,
full table in SCALE.md r13): the default ``max_hamming=6`` is
recall-1.0 for JPEG recompression (q85 and q60) and brightness shifts
at precision 1.0 on BOTH hashes; re-crops land farther out (~8% crop:
median Hamming 6, ~17%: 12-16), so raise toward 10 to chase re-framing
— dHash degrades more gracefully on crops. The measured negative-pair
floor is Hamming 12 (dHash) / 16 (pHash): past 12 dHash shows its first
false positives (fp 1.8e-4) while pHash stays clean, making pHash the
safer hash at aggressive thresholds.

Scale shape: the hash pass is a narrow map (no shuffle); the band join
shuffles (band_idx, band_value) keys — 8-byte hashes, never pixels —
exactly the banded self-join shape of minhash_dedup_pairs (no all-pairs,
plan-asserted in tests). A pathological corpus where one band value is
shared by k images still costs k² only within that bucket (the LSH
caveat shared with the text pipeline; AQE skew-split applies).

Band extraction and the popcount verify use ARITHMETIC shift + mask in
both engines (sign-extension bits are masked away), so the DuckDB
mirror in tests/test_imagedup.py is bit-exact on negative hashes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DHASH_GRID = (8, 9)  # (rows, cols): 8 x (9-1) horizontal gradients = 64 bits


def _area_resample_gray(gray, oh: int, ow: int):
    """Area-average resample of a 2-D float array to exactly (oh, ow):
    each output cell averages its integer-boundary input box (boxes from
    the i*h//oh grid); images smaller than the grid replicate pixels
    (every box is forced non-empty). Deterministic and shared by the
    operator and its test oracle — the filter choice IS the hash spec."""
    import numpy as np

    h, w = gray.shape
    ys = [min(i * h // oh, h - 1) for i in range(oh)] + [h]
    xs = [min(j * w // ow, w - 1) for j in range(ow)] + [w]
    out = np.empty((oh, ow), dtype=np.float64)
    for i in range(oh):
        y1 = max(ys[i + 1], ys[i] + 1)
        band = gray[ys[i] : y1]
        for j in range(ow):
            x1 = max(xs[j + 1], xs[j] + 1)
            out[i, j] = band[:, xs[j] : x1].mean()
    return out


def dhash_bits(arr) -> int:
    """64-bit dHash of an (H, W, C) uint8 pixel array. Bit k (row-major
    over the 8x8 gradient grid, bit 0 = MSB-side … kept LSB-first here:
    bit (i*8+j)) is 1 iff cell (i, j) is strictly brighter than its right
    neighbor (i, j+1). Returned as a SIGNED 64-bit value (bit 63 set →
    negative), the BIGINT the join operators consume."""
    import numpy as np

    if arr.shape[2] >= 3:
        lum = (
            0.299 * arr[:, :, 0].astype(np.float64)
            + 0.587 * arr[:, :, 1]
            + 0.114 * arr[:, :, 2]
        )
    else:
        lum = arr[:, :, 0].astype(np.float64)
    g = _area_resample_gray(lum, DHASH_GRID[0], DHASH_GRID[1])
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    v = 0
    for k in np.nonzero(bits)[0]:
        v |= 1 << int(k)
    return v - (1 << 64) if v >= (1 << 63) else v


_DCT32 = None


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (memoized for the pHash n=32)."""
    import numpy as np

    global _DCT32
    if n == 32 and _DCT32 is not None:
        return _DCT32
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    if n == 32:
        _DCT32 = d
    return d


def phash_bits(arr) -> int:
    """64-bit pHash (DCT perceptual hash, the classic construction):
    luma → 32x32 area resample → 2-D orthonormal DCT-II → top-left 8x8
    low-frequency block → bit (i*8+j) is 1 iff coeff (i, j) exceeds the
    block's median (DC included — it sits far above the median, so its
    bit is constantly 1 and a uniform brightness shift, which moves ONLY
    the DC, leaves the hash intact). Complements dHash: energy
    thresholds over low-frequency structure survive recompression and
    smoothing that perturb local gradient SIGNS. Known characteristic of
    the median-threshold construction: content whose low-frequency block
    is DEGENERATE (near-constant images, pure synthetic ramps — most
    coefficients ~0, i.e. at the median) yields noise-unstable bits; on
    such content dHash is the stable hash, which is exactly why both
    ship (they are complements, measured in tests). Signed 64-bit return,
    same BIGINT contract as dhash_bits — every band/pair/against
    operator applies unchanged via hash_col="phash"."""
    import numpy as np

    if arr.shape[2] >= 3:
        lum = (
            0.299 * arr[:, :, 0].astype(np.float64)
            + 0.587 * arr[:, :, 1]
            + 0.114 * arr[:, :, 2]
        )
    else:
        lum = arr[:, :, 0].astype(np.float64)
    g = _area_resample_gray(lum, 32, 32)
    d = _dct_matrix(32)
    block = (d @ g @ d.T)[:8, :8]
    med = float(np.median(block))
    bits = (block > med).ravel()
    v = 0
    for k in np.nonzero(bits)[0]:
        v |= 1 << int(k)
    return v - (1 << 64) if v >= (1 << 63) else v


def _image_hash_map(df, content_col, id_col, bits_fn, out_col) -> DataFrame:
    """The shared zero-shuffle Arrow hash pass: decode once, apply a
    64-bit hash kernel, NULL for undecodable payloads (classify, never
    crash; NULL rows are excluded from pairing, the NULL-content rule).
    The id column keeps its caller-given name AND type (review r12)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches) -> Iterator:
        import pandas as pd

        from vectrekker_spark.functions.imagecodec import decode_image_array

        for pdf in batches:
            hashes = []
            for content in pdf[content_col]:
                arr = decode_image_array(bytes(content) if content is not None else b"")
                hashes.append(bits_fn(arr) if arr is not None else None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: pd.array(hashes, dtype="Int64")}
            )

    return df.mapInPandas(gen, schema=f"{id_col} {id_type}, {out_col} long")


def image_dhash(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """(id, dhash) per image — gradient-sign difference hash (see
    dhash_bits; brightness/contrast-shift invariant, lossless-format
    invariant)."""
    return _image_hash_map(df, content_col, id_col, dhash_bits, "dhash")


def image_phash(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """(id, phash) per image — DCT low-frequency perceptual hash (see
    phash_bits; recompression/smoothing-robust). Pair it with the same
    banded machinery: dhash_dedup_pairs(..., hash_col="phash")."""
    return _image_hash_map(df, content_col, id_col, phash_bits, "phash")


def _band_exprs(hash_col: str, bands: int) -> list:
    """The B disjoint band values of a 64-bit hash, via arithmetic shift
    + mask (identical on signed semantics in Spark and DuckDB — the
    mirror contract). 64 must divide evenly: bands ∈ {1,2,4,8,16,32,64}."""
    if bands < 1 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    col = F.col(hash_col)
    if width == 64:  # one band = the whole hash (a 64-bit mask overflows lit)
        return [col.alias("band_0")]
    mask = (1 << width) - 1
    return [
        F.shiftright(col, b * width).bitwiseAND(F.lit(mask)).alias(f"band_{b}")
        for b in range(bands)
    ]


def _validate_banding(max_hamming: int, bands: int) -> None:
    """The shared banding contract: 64-dividing band count, hamming
    bound in range, and the pigeonhole recall guarantee bands > hamming.
    Called by the pair/against operators AND the streaming job builder
    (fail at call time, not inside the first micro-batch)."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming must be in [0, 63] for 64-bit hashes, got {max_hamming}"
        )
    if bands < 1 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if bands - 1 < max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at max_hamming="
            f"{max_hamming} (needs bands > max_hamming)"
        )


def dhash_band_index(
    hashes: DataFrame,
    bands: int = 8,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """(id, hash, band_idx, band_val) — the persistable banded form of a
    hash table (the image-side sibling of dedup.band_hashes): an
    ingestion pipeline writes this once per batch so history is never
    re-banded. NULL hashes are excluded (the NULL-content rule)."""
    hs = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col), *_band_exprs(hash_col, bands)
    )
    return hs.select(
        id_col,
        hash_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_val")
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(id_col, hash_col, "band.band_idx", "band.band_val")


def dhash_dup_against(
    new_hashes: DataFrame,
    corpus_bands: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    broadcast_new: bool = True,
) -> DataFrame:
    """(new_id, dup_id, hamming): which NEW images perceptually duplicate
    an EXISTING corpus image — the incremental shape (dedup today's image
    batch against history without re-pairing history). ``corpus_bands``
    is a dhash_band_index() table, typically persisted by the ingest
    pipeline; ``bands`` must match the value it was built with (and
    exceed ``max_hamming`` for the pigeonhole recall guarantee). A
    micro-batch side is small, so by default the band join BROADCASTS it
    (hinted — the docstring's "history never shuffles" must be the plan,
    not a hope) and streams the corpus index; for a large backfill batch
    that would blow the broadcast limit, pass ``broadcast_new=False`` to
    fall back to a shuffle join on (band_idx, band_val)."""
    _validate_banding(max_hamming, bands)
    nb = dhash_band_index(
        new_hashes, bands=bands, id_col=id_col, hash_col=hash_col
    ).select(
        F.col(id_col).alias("new_id"),
        F.col(hash_col).alias("new_hash"),
        "band_idx",
        "band_val",
    )
    cb = corpus_bands.select(
        F.col(id_col).alias("dup_id"),
        F.col(hash_col).alias("dup_hash"),
        "band_idx",
        "band_val",
    )
    cands = (
        (F.broadcast(nb) if broadcast_new else nb)
        .join(cb, ["band_idx", "band_val"])
        .select("new_id", "dup_id", "new_hash", "dup_hash")
        .distinct()
    )
    return cands.select(
        "new_id",
        "dup_id",
        F.bit_count(
            F.col("new_hash").bitwiseXOR(F.col("dup_hash"))
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def dhash_dedup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    bands: int | None = None,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """(l_id, r_id, hamming) for all pairs within ``max_hamming`` bits,
    l_id < r_id. Candidates from exact equality on any of B bands
    (pigeonhole-EXACT recall for max_hamming ≤ B-1), verified by
    popcount on the full hash — the minhash_dedup_pairs shape: band
    buckets shuffle 8-byte keys, never an all-pairs product."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming must be in [0, 63] for 64-bit hashes, got {max_hamming}"
        )
    if bands is None:
        bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    _validate_banding(max_hamming, bands)
    banded = dhash_band_index(hashes, bands=bands, id_col=id_col, hash_col=hash_col)
    left = banded.select(
        F.col(id_col).alias("l_id"),
        F.col(hash_col).alias("l_hash"),
        "band_idx",
        "band_val",
    )
    right = banded.select(
        F.col(id_col).alias("r_id"),
        F.col(hash_col).alias("r_hash"),
        "band_idx",
        "band_val",
    )
    cands = (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("l_id") < F.col("r_id"))
        .select("l_id", "r_id", "l_hash", "r_hash")
        .distinct()
    )
    return cands.select(
        "l_id",
        "r_id",
        F.bit_count(
            F.col("l_hash").bitwiseXOR(F.col("r_hash"))
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def image_near_dedup(
    df: DataFrame,
    max_hamming: int = 6,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """``df`` with perceptual near-duplicate images dropped — every
    verified pair's larger id loses (the ST7/curation min-id policy);
    NULL-hash (undecodable) rows always survive, the NULL-content rule."""
    hashes = image_dhash(df, content_col=content_col, id_col=id_col)
    losers = (
        dhash_dedup_pairs(hashes, max_hamming=max_hamming, id_col=id_col)
        .select(F.col("r_id").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")
