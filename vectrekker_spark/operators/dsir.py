"""Data Selection via Importance Resampling (DSIR) — pick the raw-corpus
documents that look most like a small target domain (SURVEY.md §2.2
north-star curation family; the reference, vectrekker/main.py, has no
selection surface).

The method is Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023, public): fit bag-of-hashed-n-gram
unigram distributions ``p`` (target domain, small — e.g. Wikipedia or a
benchmark's train split) and ``q`` (the raw crawl), score every raw
document with the importance log-weight

    log w(x) = sum_f  c_f(x) * (log p_f - log q_f)

and sample ``k`` documents WITHOUT replacement with probability
proportional to ``w`` — realized here as Gumbel-top-k, which is exactly
proportional-without-replacement sampling and, unlike sequential
resampling, is embarrassingly parallel and deterministic given a seed.

Spark shape (the 100 TB story):

- ``fit_feature_dist`` — one pass: each partition accumulates a DENSE
  int64 count vector locally (n_features * 8 bytes, ~0.5 MB at the 2^16
  default) and emits only its nonzero ``(idx, cnt)`` rows; one bounded
  ``groupBy(idx).sum`` shuffle (≤ n_features rows per partition,
  INDEPENDENT of corpus size) and a ≤ n_features-row collect. The same
  shape as operators/sketch.py's partial merge.
- ``importance_weights`` — zero-shuffle Arrow map; the (log p - log q)
  delta vector rides one broadcast (0.5 MB). Composes with pushdown.
- ``dsir_select`` — Gumbel keys are a pure Catalyst expression over the
  engine-wide salted-md5 hash family (operators/split.py — SQL-mirrorable
  bit-for-bit), so selection is deterministic, partition-invariant, and
  needs no RNG state; top-k runs as TakeOrderedAndProject (per-partition
  top-k, then a k-row merge). For rate-based selection at huge k,
  ``dsir_select_rate`` thresholds on an approxQuantile cut instead, which
  never gathers more than the quantile sketch.

Feature hashing matches operators/qualityscore.py exactly: index =
first-8-md5-hex-digits of the n-gram mod n_features (SQL mirror
``(('0x' || substr(md5(g), 1, 8))::BIGINT) % n``), tokens =
functions/pytokens.java_words (the executor twin of the JVM ``\\S+``
split), bigrams joined with one space.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.operators.qualityscore import feature_index

N_FEATURES_DEFAULT = 1 << 16
# bounded per-task n-gram → index memo (qualityscore _TOKEN_CACHE_MAX
# idiom): zipfian text keeps the hot head cached; past the cap n-grams
# hash uncached with identical values
_GRAM_CACHE_MAX = 1 << 20
_U32 = 4294967296.0  # 2^32 — denominator of the md5-prefix uniform


def _accumulate_text(
    text: str, counts: np.ndarray, ngram_max: int, cache: dict
) -> None:
    """Add one document's hashed n-gram counts into ``counts`` in place."""
    from vectrekker_spark.functions.pytokens import java_words

    n_features = len(counts)
    toks = java_words(text)
    grams = list(toks)
    if ngram_max >= 2:
        grams.extend(
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        )
    for g in grams:
        idx = cache.get(g)
        if idx is None:
            idx = feature_index(g, n_features)
            if len(cache) < _GRAM_CACHE_MAX:
                cache[g] = idx
        counts[idx] += 1


def feature_counts(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = N_FEATURES_DEFAULT,
    ngram_max: int = 2,
) -> DataFrame:
    """``(idx int, cnt long)`` hashed n-gram counts over the corpus —
    nonzero cells only. Each partition combines into a dense local vector
    first, so the shuffle is bounded by n_features per partition whatever
    the corpus size. NULL texts contribute nothing."""
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    if ngram_max not in (1, 2):
        raise ValueError(f"ngram_max must be 1 or 2, got {ngram_max}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(n_features, dtype=np.int64)
        cache: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is not None:
                    _accumulate_text(text, counts, ngram_max, cache)
        nz = np.nonzero(counts)[0]
        yield pd.DataFrame({"idx": nz.astype("int32"), "cnt": counts[nz]})

    partial = df.select(text_col).mapInPandas(gen, "idx int, cnt long")
    return partial.groupBy("idx").agg(F.sum("cnt").alias("cnt"))


def merge_feature_counts(*counts: DataFrame) -> DataFrame:
    """Merge ``feature_counts`` frames (they are plain mergeable partials —
    the sketch property): union + one bounded re-sum. Persist a corpus's
    counts frame and merge each new crawl batch's counts into it to keep
    the raw distribution current WITHOUT re-reading history."""
    if not counts:
        raise ValueError("merge_feature_counts needs at least one frame")
    for c in counts:
        for needed in ("idx", "cnt"):
            if needed not in c.columns:
                raise ValueError(
                    f"every input must be a feature_counts frame "
                    f"(missing {needed!r})"
                )
    out = counts[0].select("idx", "cnt")
    for c in counts[1:]:
        out = out.unionByName(c.select("idx", "cnt"))
    return out.groupBy("idx").agg(F.sum("cnt").alias("cnt"))


def log_probs_from_counts(
    counts: DataFrame,
    n_features: int = N_FEATURES_DEFAULT,
    smoothing: float = 1.0,
) -> np.ndarray:
    """Smoothed log-probability vector from a (possibly merged/persisted)
    ``feature_counts`` frame — the incremental half of ``fit_feature_dist``.
    The collect is ≤ n_features rows (the sketch-partial bound)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    vec = np.zeros(n_features, dtype=np.float64)
    for row in counts.select("idx", "cnt").collect():
        if not 0 <= row["idx"] < n_features:
            raise ValueError(
                f"counts row idx={row['idx']} is outside n_features="
                f"{n_features} — the frame was built with a different "
                f"feature geometry"
            )
        vec[row["idx"]] += row["cnt"]
    total = vec.sum()
    return np.log(vec + smoothing) - math.log(total + smoothing * n_features)


def fit_feature_dist(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = N_FEATURES_DEFAULT,
    ngram_max: int = 2,
    smoothing: float = 1.0,
) -> np.ndarray:
    """Smoothed log-probability vector (length ``n_features``) of the
    corpus's hashed n-gram distribution:
    ``log((cnt_f + smoothing) / (total + smoothing * n_features))``.
    The collect is ≤ n_features rows (the sketch-partial bound)."""
    return log_probs_from_counts(
        feature_counts(df, text_col, n_features, ngram_max),
        n_features=n_features,
        smoothing=smoothing,
    )


def importance_weights(
    df: DataFrame,
    logp_target: np.ndarray,
    logp_raw: np.ndarray,
    text_col: str = "text",
    out_col: str = "dsir_logw",
    ngram_max: int = 2,
) -> DataFrame:
    """All input columns + ``out_col: double`` — the DSIR importance
    log-weight ``sum_f c_f * (logp_target[f] - logp_raw[f])``, round(6).
    NULL text → NULL weight (excluded by the selectors); token-less text
    → 0.0 (no evidence either way). Zero-shuffle Arrow map; the delta
    vector rides one broadcast."""
    t = np.asarray(logp_target, dtype=np.float64)
    r = np.asarray(logp_raw, dtype=np.float64)
    if t.shape != r.shape or t.ndim != 1 or len(t) == 0:
        raise ValueError(
            "logp_target and logp_raw must be equal-length 1-D vectors, "
            f"got {t.shape} and {r.shape}"
        )
    if ngram_max not in (1, 2):
        raise ValueError(f"ngram_max must be 1 or 2, got {ngram_max}")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists on the input")
    delta = t - r
    bc = df.sparkSession.sparkContext.broadcast(delta)
    fields = ", ".join(f"`{c}` {ty}" for c, ty in df.dtypes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = bc.value
        n_features = len(d)
        cache: dict[str, int] = {}
        scratch = np.zeros(n_features, dtype=np.int64)
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if text is None:
                    out.append(None)
                    continue
                _accumulate_text(text, scratch, ngram_max, cache)
                nz = np.nonzero(scratch)[0]
                out.append(float(np.round(float(d[nz] @ scratch[nz]), 6)))
                scratch[nz] = 0
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(out, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(gen, schema=f"{fields}, `{out_col}` double")


def gumbel_key(
    weight_col: Column | str, id_col: Column | str, seed: str = "s0"
) -> Column:
    """``logw + Gumbel(0,1)`` selection key — Gumbel-top-k over these keys
    IS sampling without replacement with probability ∝ exp(logw). The
    Gumbel noise is a pure hash of (seed, id) (engine-wide salted-md5
    family), so keys are deterministic and partition-invariant; the SQL
    mirror is ``gumbel_key_sql``."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"dsir:{seed}:"), c.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_U32)
    return w + -F.log(-F.log(u))


def gumbel_key_sql(weight_expr: str, id_expr: str, seed: str = "s0") -> str:
    """DuckDB fragment computing the identical key (split_bucket_sql
    convention: the seed is a VALUE — quotes escaped)."""
    s = seed.replace("'", "''")
    h = f"(('0x' || substr(md5('dsir:{s}:' || {id_expr}), 1, 8))::BIGINT)"
    u = f"(({h}::DOUBLE + 0.5) / {_U32!r})"
    return f"({weight_expr} + -ln(-ln({u})))"


def dsir_select(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
    seed: str = "s0",
) -> DataFrame:
    """The ``k`` documents sampled without replacement with probability
    ∝ exp(weight) — Gumbel-top-k on deterministic keys, ties broken by id
    ascending. Rows with a NULL id or NULL weight never select (no hash /
    no evidence — the sampling module's NULL rule). Runs as
    TakeOrderedAndProject: per-partition top-k, k-row merge; for huge k
    use ``dsir_select_rate``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = gumbel_key(weight_col, id_col, seed)
    return (
        df.where(F.col(id_col).isNotNull() & F.col(weight_col).isNotNull())
        .orderBy(key.desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_select_rate(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
    seed: str = "s0",
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep ~``rate`` of the rows, chosen by the same Gumbel keys — the
    huge-k form: the cut point comes from approxQuantile (a bounded
    sketch, never a global sort), so the realized fraction is approximate
    within ``relative_error``. Deterministic for fixed data + seed.
    NULL-id / NULL-weight rows are dropped (as in dsir_select).

    Cost note: the quantile is an ACTION, so the upstream lineage runs
    once for the cut and again when the returned frame is consumed. When
    the input is an un-persisted ``importance_weights`` result (whose
    Arrow map is the expensive stage), ``persist()`` it first — the CLI
    verb does exactly that — or accept the double execution."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    if "__dsir_key" in df.columns:
        raise ValueError(
            "column '__dsir_key' already exists on the input — reserved "
            "by dsir_select_rate; rename it first"
        )
    eligible = df.where(
        F.col(id_col).isNotNull() & F.col(weight_col).isNotNull()
    ).withColumn("__dsir_key", gumbel_key(weight_col, id_col, seed))
    if rate == 1.0:
        return eligible.drop("__dsir_key")
    [cut] = eligible.approxQuantile("__dsir_key", [1.0 - rate], relative_error)
    return eligible.where(F.col("__dsir_key") >= F.lit(cut)).drop("__dsir_key")
