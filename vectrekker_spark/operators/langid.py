"""Language identification — hashed char-n-gram multinomial classifier
applied as a zero-shuffle narrow map (SURVEY.md §2.2 C22, r14).

Every real multilingual crawl pipeline's first text gate (CCNet's
fastText langid, RedPajama/FineWeb's language filters) PRODUCES a `lang`
column from raw text; this engine already consumed one (curation
keep_langs, per-stratum quota, mixture sampling) but could not create
it. This operator closes that hole with the same shape as the C16
quality classifier (operators/qualityscore.py): train driver-side on a
bounded labeled sample, apply at corpus scale as ONE Arrow map with the
weight matrix riding a Spark broadcast — no shuffle, no join, no
explode; plan-asserted in tests.

Features are hashed character n-grams (n_lo..n_hi, default 1..3) of the
lower-cased text, capped at ``max_chars`` — language signal saturates in
the first few hundred characters, and the cap bounds per-row cost on
100 MB documents. The hash is the engine-wide md5-prefix family
(qualityscore.feature_index), so any SQL engine can mirror the index
math bit-for-bit. Scoring: softmax(b + W · mean-of-gram-features),
argmax with first-index (sorted class order) tie policy; confidences
round to 6 (the engine's determinism unit).

The model geometry (n_lo, n_hi, max_chars, n_features) is PINNED in the
saved artifact and re-applied at load — scoring under a different gram
window silently degrades instead of erroring, the same failure class as
PQ codes under a foreign codebook (operators/pq.py's meta argument).

Reference scope note: the reference (vectrekker/main.py) has no language
surface; north-star training-pipeline addition (CCNet, Wenzek et al.
2020, is the public blueprint).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.operators.qualityscore import feature_index

N_FEATURES_DEFAULT = 1 << 16
MAX_CHARS_DEFAULT = 1000
# bounded per-task gram→index memo (qualityscore._TOKEN_CACHE_MAX idiom)
_GRAM_CACHE_MAX = 1 << 20


def char_ngrams(text: str, n_lo: int = 1, n_hi: int = 3,
                max_chars: int = MAX_CHARS_DEFAULT) -> list[str]:
    """Character n-grams of the lower-cased, whitespace-normalized prefix
    of ``text`` — the featurization both fit and predict share, kept as a
    plain Python function so the test oracle can reproduce it
    independently. Runs of whitespace collapse to one space (layout
    noise — wrapping, indentation — is not language signal)."""
    s = " ".join(text[:max_chars].lower().split())
    out = []
    for n in range(n_lo, n_hi + 1):
        out.extend(s[i:i + n] for i in range(len(s) - n + 1))
    return out


def _gram_counts(text: str, n_lo: int, n_hi: int, max_chars: int,
                 n_features: int, cache: dict) -> dict[int, int]:
    counts: dict[int, int] = {}
    for g in char_ngrams(text, n_lo, n_hi, max_chars):
        idx = cache.get(g)
        if idx is None:
            idx = feature_index(g, n_features)
            if len(cache) < _GRAM_CACHE_MAX:
                cache[g] = idx
        counts[idx] = counts.get(idx, 0) + 1
    return counts


class LangIdModel:
    """(weights C×F, bias C, classes C, featurization geometry) — the
    broadcastable scoring artifact. Classes are sorted at fit, so argmax
    first-index ties resolve to the alphabetically-smallest language."""

    def __init__(self, weights: np.ndarray, bias: np.ndarray,
                 classes: list[str], n_lo: int = 1, n_hi: int = 3,
                 max_chars: int = MAX_CHARS_DEFAULT):
        w = np.asarray(weights, dtype=np.float64)
        b = np.asarray(bias, dtype=np.float64)
        if w.ndim != 2 or b.ndim != 1 or w.shape[0] != len(b):
            raise ValueError("LangIdModel: weights must be C×F with C biases")
        if len(classes) != w.shape[0]:
            raise ValueError("LangIdModel: one class label per weight row")
        if list(classes) != sorted(classes):
            raise ValueError("LangIdModel: classes must be sorted (tie policy)")
        if not (np.isfinite(w).all() and np.isfinite(b).all()):
            raise ValueError("LangIdModel: non-finite parameters")
        self.weights, self.bias = w, b
        self.classes = list(classes)
        self.n_lo, self.n_hi, self.max_chars = int(n_lo), int(n_hi), int(max_chars)


def fit_langid(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n_features: int = N_FEATURES_DEFAULT,
    n_lo: int = 1,
    n_hi: int = 3,
    max_chars: int = MAX_CHARS_DEFAULT,
    max_rows: int = 100_000,
    iters: int = 200,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> LangIdModel:
    """Fit the multinomial head by full-batch softmax GD (deterministic —
    no stochasticity, rows sorted before the fit) on a BOUNDED collected
    sample; raises past ``max_rows`` (the fit_linear_quality collect-guard
    idiom — labeled language sets are thousands of rows, a corpus-sized
    label column is a bug). Rows with NULL text/label drop before the cap
    check; zero-gram rows drop after it (they still count toward the cap
    — the guard bounds the COLLECT, not the usable subset)."""
    rows = (
        df.select(F.col(text_col), F.col(label_col))
        .where(F.col(text_col).isNotNull() & F.col(label_col).isNotNull())
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"fit_langid: labeled sample exceeds max_rows={max_rows}; "
            "training is driver-side by design — downsample the labels "
            "or raise the cap deliberately."
        )
    rows.sort(key=lambda r: (r[1], r[0]))
    classes = sorted({r[1] for r in rows})
    if len(classes) < 2:
        raise ValueError("fit_langid: need at least 2 distinct languages")
    cpos = {c: i for i, c in enumerate(classes)}
    cache: dict[str, int] = {}
    all_idx, all_val, row_y, row_ptr = [], [], [], [0]
    for text, lab in rows:
        counts = _gram_counts(text, n_lo, n_hi, max_chars, n_features, cache)
        if not counts:
            continue
        total = sum(counts.values())
        for i, c in counts.items():
            all_idx.append(i)
            all_val.append(c / total)
        row_ptr.append(len(all_idx))
        row_y.append(cpos[lab])
    n = len(row_y)
    if n == 0:
        raise ValueError("fit_langid: no usable labeled rows (all NULL/empty)")
    C = len(classes)
    idx = np.asarray(all_idx, dtype=np.int64)
    val = np.asarray(all_val, dtype=np.float64)
    ptr = np.asarray(row_ptr, dtype=np.int64)
    y = np.asarray(row_y, dtype=np.int64)
    rows_of_nnz = np.repeat(np.arange(n), np.diff(ptr))
    Y = np.zeros((n, C))
    Y[np.arange(n), y] = 1.0
    W = np.zeros((C, n_features), dtype=np.float64)
    b = np.zeros(C, dtype=np.float64)
    Z = np.empty((n, C), dtype=np.float64)
    for _ in range(iters):
        # Z[n, c] = Σ_nnz val · W[c, idx] per row, + b — computed PER
        # CLASS so the largest temporary is (nnz,), not (C, nnz): the
        # dense block form allocated ~C·nnz·8 B per iteration (tens of
        # GB at the documented max_rows cap — r14s3 review). Bitwise
        # identical: reduceat per class equals the old block reduceat's
        # row slices.
        for c in range(C):
            Z[:, c] = np.add.reduceat(W[c, idx] * val, ptr[:-1])
        Z += b
        # reduceat yields the element at p (not 0) for empty segments —
        # none exist: zero-gram rows were dropped above
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = (P - Y) / n  # (n, C)
        gW = np.zeros_like(W)
        for c in range(C):
            np.add.at(gW[c], idx, G[rows_of_nnz, c] * val)
        W -= lr * (gW + l2 * W)
        b -= lr * G.sum(axis=0)
    return LangIdModel(W, b, classes, n_lo=n_lo, n_hi=n_hi, max_chars=max_chars)


def predict_lang(
    df: DataFrame,
    model: LangIdModel,
    text_col: str = "text",
    out_col: str = "lang",
    conf_col: str | None = "lang_conf",
) -> DataFrame:
    """All input columns + ``out_col`` (predicted language) and optional
    ``conf_col`` (round-6 softmax confidence). NULL text → NULL lang/conf;
    text with zero grams (empty/whitespace) → the bias prior's argmax.

    Narrow map: (W, b, classes) ride one Spark broadcast; nothing
    shuffles — scoring 100 TB is embarrassingly parallel and composes
    with column pruning exactly like score_linear."""
    for c in (out_col, conf_col):
        if c is not None and c in df.columns:
            raise ValueError(f"predict_lang: column {c!r} already exists")
    if conf_col is not None and conf_col == out_col:
        raise ValueError(
            "predict_lang: out_col and conf_col must differ — a "
            "duplicate-name schema fails at executor time with an opaque "
            "Arrow mismatch (r14s3 review)"
        )
    bc = df.sparkSession.sparkContext.broadcast(
        (model.weights, model.bias, model.classes,
         model.n_lo, model.n_hi, model.max_chars)
    )
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    schema = f"{fields}, `{out_col}` string"
    if conf_col is not None:
        schema += f", `{conf_col}` double"
    n_features = model.weights.shape[1]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W, b, classes, n_lo, n_hi, max_chars = bc.value
        cache: dict[str, int] = {}
        for pdf in batches:
            langs, confs = [], []
            for text in pdf[text_col]:
                if text is None:
                    langs.append(None)
                    confs.append(None)
                    continue
                counts = _gram_counts(text, n_lo, n_hi, max_chars,
                                      n_features, cache)
                if counts:
                    ii = np.fromiter(counts.keys(), dtype=np.int64,
                                     count=len(counts))
                    vv = np.fromiter(counts.values(), dtype=np.float64,
                                     count=len(counts))
                    z = b + W[:, ii] @ (vv / vv.sum())
                else:
                    z = b.copy()
                z -= z.max()
                p = np.exp(z)
                p /= p.sum()
                k = int(np.argmax(p))  # first index wins ties (sorted classes)
                langs.append(classes[k])
                confs.append(float(np.round(p[k], 6)))
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(langs, index=pdf.index, dtype=object)
            if conf_col is not None:
                pdf[conf_col] = pd.Series(confs, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def save_langid(path: str, model: LangIdModel) -> None:
    """Persist the model + featurization geometry as one .npz (the
    save_model exact-path contract: write through a handle so np.savez
    can't silently append '.npz')."""
    with open(path, "wb") as f:
        np.savez(
            f,
            weights=model.weights,
            bias=model.bias,
            classes=np.asarray(model.classes, dtype="U"),
            geometry=np.asarray(
                [model.n_lo, model.n_hi, model.max_chars], dtype=np.int64
            ),
        )


def load_langid(path: str) -> LangIdModel:
    """Load a save_langid .npz; validates arrays/geometry at load (run
    START), not inside an executor batch."""
    with np.load(path) as z:
        for key in ("weights", "bias", "classes", "geometry"):
            if key not in z:
                raise ValueError(
                    f"load_langid: {path!r} lacks {key!r} — not a "
                    "save_langid file"
                )
        w = np.asarray(z["weights"], dtype=np.float64)
        b = np.asarray(z["bias"], dtype=np.float64)
        classes = [str(c) for c in z["classes"]]
        n_lo, n_hi, max_chars = (int(v) for v in z["geometry"])
    if n_lo < 1 or n_hi < n_lo or max_chars < 1:
        raise ValueError(f"load_langid: {path!r} has invalid gram geometry")
    return LangIdModel(w, b, classes, n_lo=n_lo, n_hi=n_hi, max_chars=max_chars)
