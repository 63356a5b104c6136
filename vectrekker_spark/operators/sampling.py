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


def mixture_rates_for_token_budget(
    df: DataFrame,
    shares: dict[str, float],
    token_budget: int,
    strata_col: str = "source",
    text_col: str = "text",
) -> dict[str, float]:
    """Per-stratum sampling RATES that realize a target token MIXTURE —
    the budgeting step real mixtures are specified in (LLaMA/Pile-style
    recipes say "X% of tokens from wiki", not "X% of documents"):
    feed the result straight to stratified_hash_sample.

    ``shares`` are target token fractions per stratum (must sum to ~1);
    ``token_budget`` is the total token count wanted. One aggregation
    measures per-stratum token supply (JVM token_count, map-side partial
    agg — a single job regardless of corpus size); the rate math runs on
    the driver over the (tiny) stratum table.

    When a stratum's supply can't cover its target (rate would exceed 1.0)
    the shortfall is REDISTRIBUTED over the uncapped strata in proportion
    to their shares — deterministic water-filling, so the budget is met
    whenever total supply allows instead of silently under-delivering.
    Strata present in the data but absent from ``shares`` contribute
    nothing (rate 0 via stratified_hash_sample's default_rate).

    Expected (not exact) realization: hash sampling is Bernoulli per doc,
    so realized token counts concentrate around the target with relative
    error ~1/√docs-per-stratum — at training-corpus scale the deviation
    is noise, and determinism/stability under corpus growth (the property
    every sampler here guarantees) is worth more than exactness.
    """
    from vectrekker_spark.functions.text import token_count

    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if not shares:
        raise ValueError("shares must name at least one stratum")
    for k, v in shares.items():
        if v < 0:
            raise ValueError(f"share for {k!r} must be >= 0, got {v}")
    tot_share = sum(shares.values())
    if not 0.999 <= tot_share <= 1.001:
        raise ValueError(
            f"shares must sum to 1 (got {tot_share:.4f}) — normalize first "
            "so the budget split is explicit, not implicit"
        )
    supply_rows = (
        df.where(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.sum(token_count(F.col(text_col))).alias("supply"))
        .collect()
    )
    supply = {r[strata_col]: int(r["supply"] or 0) for r in supply_rows}
    # deterministic water-filling over the strata named in shares
    rates = {k: 0.0 for k in shares}
    remaining = {k: v for k, v in shares.items() if v > 0}
    budget = float(token_budget)
    while remaining and budget > 0:
        denom = sum(remaining.values())
        capped = {}
        for k in sorted(remaining):
            want = budget * remaining[k] / denom
            have = supply.get(k, 0)
            if have <= want:
                rates[k] = 1.0 if have else 0.0
                capped[k] = have
        if not capped:
            for k in remaining:
                rates[k] = (budget * remaining[k] / denom) / supply[k]
            break
        # capped strata give everything; their shortfall re-splits among
        # the rest on the next pass
        budget -= sum(capped.values())
        for k in capped:
            del remaining[k]
    return rates


def seeded_shuffle(
    df: DataFrame, seed: str = "s0", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle: total order by hash(seed, id), a
    SECOND independent salted hash, and finally the id. One
    range-partitioned sort — the 100 TB-scalable formulation of "randomize
    training order"; change ``seed`` per epoch for a fresh permutation.

    The second hash matters past ~1e6 rows: the primary bucket has 1e6
    resolution, so a raw-id tiebreak made every within-bucket run
    (~N/1e6 docs) appear in the SAME ascending-id order every epoch —
    deterministic but seed-invariant exactly where a big corpus lives
    (r14s3 review). The second salt restores per-seed order at every
    granularity; the id remains the final unique tiebreak."""
    return df.orderBy(
        sample_bucket(id_col, seed),
        sample_bucket(id_col, seed + "/tie"),
        F.col(id_col),
    )
