"""Model-based quality scoring — hashed bag-of-words linear classifier
applied as a zero-shuffle narrow map (SURVEY.md §2.2 C16).

The heuristic quality gates in this engine (repetition fractions, text
stats, language id) are rule-based; production curation pipelines
(CCNet-style wiki-vs-crawl filters, fastText classifiers, FineWeb-Edu's
scored filtering) add a LEARNED filter: a small linear model over hashed
token features, trained on a modest labeled set, applied to the whole
corpus. The apply side is what must scale: here it is ONE Arrow map over
the corpus — the weight vector broadcasts (2 MB at the default 2^18
features), each batch tokenizes, feature-hashes, and folds
``sigmoid(bias + Σ w[h(token)] / n_tokens)`` locally. No shuffle, no join,
no explode; plan-asserted in tests.

Feature hashing (the "hashing trick", Weinberger et al. 2009): index =
first-8-md5-hex-digits mod n_features — the engine's shared md5-prefix
family (operators/bloom.py, operators/split.py), so a SQL engine can mirror
the index math bit-for-bit (('0x'||substr(md5(t),1,8))::BIGINT % n).
Tokenization is functions/pytokens.java_words — the exact executor twin of
the JVM token_count()/RE2-oracle split, so counts never diverge from the
engine's other text operators on Unicode-whitespace text.

Training (``fit_linear_quality``) is deliberately DRIVER-SIDE on a bounded
labeled sample: quality labels are produced by humans/LLM-judges in the
thousands, not billions, so the classic shape is "train small, apply at
scale". The collect is capped (assign_centroids idiom — the guard measures
rows against an explicit budget) and the fit is plain seeded full-batch
gradient descent on numpy — deterministic, no sklearn dependency.

Reference scope note: the reference (vectrekker/main.py) has no quality or
filtering surface; north-star training-pipeline addition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES_DEFAULT = 1 << 18
# bounded per-task token→index memo (minhash _SHINGLE_CACHE_MAX idiom):
# zipfian vocab keeps the hot head cached; past the cap tokens hash
# uncached with identical values
_TOKEN_CACHE_MAX = 1 << 20


def feature_index(token: str, n_features: int = N_FEATURES_DEFAULT) -> int:
    """Python reference of the hashed feature index; the SQL mirror is
    ``('0x' || substr(md5(t), 1, 8))::BIGINT % n_features``."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % n_features


def _logits_for_texts(texts, w: np.ndarray, bias: float, cache: dict) -> list:
    """Shared scorer core: per text, mean of hashed-feature weights + bias;
    None for null text, bias alone for token-less text."""
    from vectrekker_spark.functions.pytokens import java_words

    n_features = len(w)
    out = []
    for text in texts:
        if text is None:
            out.append(None)
            continue
        toks = java_words(text)
        if not toks:
            out.append(float(bias))
            continue
        acc = 0.0
        for t in toks:
            idx = cache.get(t)
            if idx is None:
                idx = feature_index(t, n_features)
                if len(cache) < _TOKEN_CACHE_MAX:
                    cache[t] = idx
            acc += w[idx]
        out.append(float(bias + acc / len(toks)))
    return out


def score_linear(
    df: DataFrame,
    weights: np.ndarray,
    bias: float = 0.0,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """All input columns + ``out_col`` = sigmoid(bias + mean token weight),
    round(6). Mean (not sum) keeps scores length-independent, so one
    threshold works across short and long documents. NULL text scores NULL;
    empty/whitespace text scores sigmoid(bias) (no evidence → prior).

    Narrow map: the weight vector rides a Spark broadcast; nothing
    shuffles. Scoring 100 TB is embarrassingly parallel and the plan
    composes with pushdown (the scan still prunes columns other than
    ``text_col`` if the caller selects after scoring).
    """
    w = np.asarray(weights, dtype=np.float64)
    if w.ndim != 1 or len(w) == 0:
        raise ValueError("score_linear: weights must be a non-empty 1-D vector")
    if out_col in df.columns:
        raise ValueError(f"score_linear: column {out_col!r} already exists")
    bc = df.sparkSession.sparkContext.broadcast((w, float(bias)))
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    cols = list(df.columns)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w_, b_ = bc.value
        cache: dict[str, int] = {}
        for pdf in batches:
            logits = _logits_for_texts(pdf[text_col], w_, b_, cache)
            scores = [
                None if z is None else float(np.round(1.0 / (1.0 + np.exp(-z)), 6))
                for z in logits
            ]
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(scores, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(gen, schema=f"{fields}, `{out_col}` double")


def quality_filter(
    df: DataFrame,
    weights: np.ndarray,
    bias: float = 0.0,
    min_score: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Rows whose quality score ≥ min_score (NULL-text rows drop — no
    evidence of quality is not evidence of quality). Same narrow plan as
    score_linear with the filter fused behind it."""
    scored = score_linear(df, weights, bias=bias, text_col=text_col)
    return scored.where(F.col("quality_score") >= float(min_score)).drop(
        "quality_score"
    )


def save_model(path: str, weights: np.ndarray, bias: float) -> None:
    """Persist (weights, bias) as a single .npz — the curation funnel's
    quality_model_path format. Provenance (n_features) rides the weight
    vector's own length; the feature-index math is versionless by design
    (md5-prefix mod n, operators/bloom.py's stability argument)."""
    w = np.asarray(weights, dtype=np.float64)
    if w.ndim != 1 or len(w) == 0:
        raise ValueError("save_model: weights must be a non-empty 1-D vector")
    # write through a file handle: np.savez on a PATH silently appends
    # '.npz' when absent, and load_model/np.load would then miss the file
    # the caller asked for
    with open(path, "wb") as f:
        np.savez(f, weights=w, bias=np.float64(bias))


def load_model(path: str) -> tuple[np.ndarray, float]:
    """Load a save_model .npz; validates shape/finiteness so a corrupt or
    wrong-format file fails at load (run-START) rather than inside an
    executor batch."""
    with np.load(path) as z:
        if "weights" not in z or "bias" not in z:
            raise ValueError(
                f"load_model: {path!r} lacks weights/bias arrays — not a "
                "save_model file"
            )
        w = np.asarray(z["weights"], dtype=np.float64)
        b = float(z["bias"])
    if w.ndim != 1 or len(w) == 0:
        raise ValueError(f"load_model: {path!r} weights are not a 1-D vector")
    if not (np.isfinite(w).all() and np.isfinite(b)):
        raise ValueError(f"load_model: {path!r} contains non-finite values")
    return w, b


def fit_linear_quality(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = N_FEATURES_DEFAULT,
    max_rows: int = 200_000,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[np.ndarray, float]:
    """Fit (weights, bias) by full-batch logistic GD (no stochasticity —
    deterministic without a seed) on a BOUNDED
    collected sample; raises past ``max_rows`` (collect-guard idiom —
    labeled sets are small by construction; a corpus-sized label column is
    a bug, and silently training on a prefix would hide it). Labels must
    be 0/1. Deterministic for fixed inputs; rows with NULL text or NULL
    label are dropped before the cap check.
    """
    rows = (
        df.select(F.col(text_col), F.col(label_col).cast("double"))
        .where(F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"fit_linear_quality: labeled sample exceeds max_rows={max_rows}; "
            "training is driver-side by design (train small, apply at scale) "
            "— downsample the labels (operators/sampling.hash_sample) or "
            "raise the cap deliberately."
        )
    if not rows:
        raise ValueError("fit_linear_quality: no labeled rows after null filtering")
    from vectrekker_spark.functions.pytokens import java_words

    # deterministic order: GD sums over all rows each step, but building in
    # sorted order makes the feature matrix reproducible across layouts
    rows.sort(key=lambda r: (r[0], r[1]))
    y = np.array([r[1] for r in rows], dtype=np.float64)
    if not set(np.unique(y)) <= {0.0, 1.0}:
        raise ValueError("fit_linear_quality: labels must be 0/1")
    cache: dict[str, int] = {}
    idx_lists = []
    for text, _ in rows:
        toks = java_words(text)
        idxs = []
        for t in toks:
            i = cache.get(t)
            if i is None:
                i = feature_index(t, n_features)
                cache[t] = i
            idxs.append(i)
        idx_lists.append(idxs)
    # dense per-row mean one-hot rows would be n×n_features; accumulate
    # sparse instead: X @ w and Xᵀ g as vectorized sparse products.
    # r14 optimization (guide §4.2 — vectorize the whole batch, not per
    # row): the old loop re-walked every row per GD step (w[ix].sum() +
    # np.add.at per row × iters) — 46 s for 10k×300 at sf1. The feature
    # matrix is now built ONCE as deduplicated COO triples (row, feature,
    # count/len), and each step is two bincount accumulations over the nnz
    # — 46 → ~2 s, same deterministic result for fixed inputs (summation
    # association differs by ~1 ulp per step; layout-invariance and
    # classification tests unchanged).
    w = np.zeros(n_features, dtype=np.float64)
    b = 0.0
    n = len(rows)
    inv_len = np.array([1.0 / max(len(ix), 1) for ix in idx_lists])
    lens = np.fromiter((len(ix) for ix in idx_lists), dtype=np.int64, count=n)
    flat = np.fromiter(
        (i for ix in idx_lists for i in ix), dtype=np.int64, count=int(lens.sum())
    )
    row_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
    # collapse duplicate (row, feature) occurrences: val = count / len(row)
    keys, counts = np.unique(row_rep * n_features + flat, return_counts=True)
    rows_u = keys // n_features
    cols_u = keys % n_features
    vals_u = counts * inv_len[rows_u]
    for _ in range(iters):
        z = np.bincount(rows_u, weights=w[cols_u] * vals_u, minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y  # dL/dz
        gw = np.bincount(cols_u, weights=g[rows_u] * vals_u, minlength=n_features)
        w -= lr * (gw / n + l2 * w)
        b -= lr * float(g.mean())
    return w, float(b)
