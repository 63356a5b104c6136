"""Embedding quantization — 4× storage/IO reduction for vector indexes.

At 100 TB the embedding column dominates index size (a 1536-dim float32
vector is 6 KB/row; the reference's Pinecone index stores exactly that,
`vectrekker/main.py:22,165`). Symmetric per-vector int8 scalar quantization
cuts it 4× with bounded reconstruction error: each vector stores
(scale = max|x|/127, int8 codes), dequantizes as code·scale, and cosine
rankings survive (error per component ≤ scale/2 ≈ max|x|/254).

Pure Catalyst expressions (aggregate/transform) — no UDF, no shuffle; the
quantize/dequantize pair composes with every vector operator in this repo
(exact kNN over dequantized vectors, IVF coarse search over codes). The
standard scale path: coarse-search int8, re-rank the top candidates with
the full-precision vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(vec: Column) -> Column:
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Append `{out_col}` (array<tinyint>) and `{out_col}_scale` (double).

    scale = max|x|/127; codes = round(x/scale) ∈ [-127, 127]. All-zero
    vectors get scale 0 and all-zero codes (dequantizes to zero exactly).
    """
    scale = _absmax(F.col(vec_col)) / F.lit(127.0)
    df = df.withColumn(f"{out_col}_scale", scale)
    codes = F.when(
        F.col(f"{out_col}_scale") == 0.0,
        F.transform(F.col(vec_col), lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col(f"{out_col}_scale")).cast(
                "tinyint"
            ),
        )
    )
    return df.withColumn(out_col, codes)


def dequantize_int8(
    df: DataFrame, qvec_col: str = "qvec", out_col: str = "embedding_deq"
) -> DataFrame:
    """Reconstruct array<double> from (codes, scale)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col),
            lambda c: c.cast("double") * F.col(f"{qvec_col}_scale"),
        ),
    )
