"""Deterministic corpus sampling and ordering for training-data assembly.

All three ops are pure hash functions of (seed, key) — no RNG state, so they
are reproducible across runs, executors, and input partitionings, and a
re-run after adding files keeps every previously-sampled row (stable
assignment, the property that matters when a 100 TB corpus is sampled
incrementally). Same salted-md5 design as operators/split.py's
train/val/test assignment. (North-star addition; the reference has no
sampling surface.)

- ``hash_sample``: Bernoulli sample at a fixed rate.
- ``stratified_hash_sample``: per-stratum rates (source/language mixing
  weights — the "data mixture" step of LLM training-data prep).
- ``seeded_shuffle``: global deterministic shuffle (training order). A total
  sort by hash = one range-partitioned sort — the scalable way to shuffle
  100 TB (no driver-side permutation); downstream writers preserve the
  order per output file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.operators.split import split_bucket

# Denominator for rate quantization: rates quantize to 1e-6 buckets. The
# bucket comes from a 32-bit md5 prefix reduced mod 1e6, so bucket sizes
# carry a small modulo bias (~2.3e-4 relative) — realized fractions are
# approximately the requested rate, not exact to the last digit. Rows whose
# id is NULL hash to NULL and are DROPPED by every sampler's filter;
# coalesce ids upstream if NULL-id rows must participate.
_BUCKETS = 1_000_000


def sample_bucket(id_col: str | Column, seed: str) -> Column:
    """Deterministic bucket in [0, 1e6) — split.py's engine-wide salted-md5
    bucket (oracle-expressible via split_bucket_sql) at sampling resolution,
    so split assignment and sampling share ONE hash derivation."""
    return split_bucket(id_col, salt=seed, n=_BUCKETS)


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: str = "s0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash(seed, id) — deterministic,
    partition-invariant, stable under corpus growth. Narrow (no shuffle).
    NULL ids are dropped (see _BUCKETS note); rate is quantized to 1e-6."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(sample_bucket(id_col, seed) < int(round(fraction * _BUCKETS)))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. {"wiki": 1.0, "crawl": 0.1}) — the
    mixture-weighting step. Strata missing from ``rates`` get
    ``default_rate``. Implemented as a CASE over the (broadcast-sized) rate
    map, so it stays a narrow map — no join, no shuffle."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    threshold = F.lit(int(round(default_rate * _BUCKETS)))
    for k, v in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == k, F.lit(int(round(v * _BUCKETS))))
            .otherwise(threshold)
        )
    return df.filter(sample_bucket(id_col, seed) < threshold)


def seeded_shuffle(
    df: DataFrame, seed: str = "s0", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle: total order by hash(seed, id), with the
    id as tiebreak so the order is unique even on hash collisions. One
    range-partitioned sort — the 100 TB-scalable formulation of "randomize
    training order"; change ``seed`` per epoch for a fresh permutation."""
    return df.orderBy(sample_bucket(id_col, seed), F.col(id_col))
