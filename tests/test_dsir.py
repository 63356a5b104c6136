"""DSIR importance-resampling data selection (operators/dsir.py) vs an
independent numpy oracle, a DuckDB Gumbel-key mirror, and plan shape.

The oracle re-implements hashing/tokenization from the public definitions
(ASCII \\S+ runs, md5-prefix feature index) WITHOUT calling the operator's
kernels, so an accumulation bug cannot cancel itself out. Fixtures stick
to ASCII whitespace (the documented Java/RE2-vs-Python mirror boundary).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from vectrekker_spark.operators.dsir import (
    dsir_select,
    dsir_select_rate,
    feature_counts,
    fit_feature_dist,
    gumbel_key,
    gumbel_key_sql,
    importance_weights,
)

_WORD = re.compile(r"[^ \t\n\x0b\f\r]+")


def _grams(text: str, ngram_max: int) -> list[str]:
    toks = _WORD.findall(text)
    out = list(toks)
    if ngram_max >= 2:
        out += [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
    return out


def _idx(gram: str, n: int) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16) % n


def _oracle_counts(texts, n: int, ngram_max: int) -> np.ndarray:
    c = np.zeros(n, dtype=np.int64)
    for t in texts:
        if t is None:
            continue
        for g in _grams(t, ngram_max):
            c[_idx(g, n)] += 1
    return c


def _oracle_logp(texts, n: int, ngram_max: int, smoothing: float) -> np.ndarray:
    c = _oracle_counts(texts, n, ngram_max).astype(np.float64)
    return np.log(c + smoothing) - math.log(c.sum() + smoothing * n)


TARGET = [
    "quantum electron orbitals shape covalent bonds in molecules",
    "the reaction yields crystalline salts when the acid neutralizes",
    "catalysts lower activation energy across the reaction pathway",
]
RAW = [
    ("r1", "quantum orbitals and covalent bonds govern the reaction"),
    ("r2", "football scores tonight were surprisingly high again"),
    ("r3", "the acid catalysts and crystalline salts in the reaction"),
    ("r4", "stream the new season of the detective drama tonight"),
    ("r5", "activation energy and electron orbitals in molecules"),
    ("r6", "recipes for quick weeknight pasta the family loves"),
    ("r7", None),
    ("r8", ""),
]
N = 1 << 12


def _weights_oracle(n=N, ngram_max=2):
    lp_t = _oracle_logp(TARGET, n, ngram_max, 1.0)
    lp_r = _oracle_logp([t for _, t in RAW], n, ngram_max, 1.0)
    delta = lp_t - lp_r
    out = {}
    for did, t in RAW:
        if t is None:
            out[did] = None
            continue
        acc = 0.0
        for g in _grams(t, ngram_max):
            acc += delta[_idx(g, n)]
        out[did] = float(round(acc, 6))
    return lp_t, lp_r, out


def test_feature_counts_match_oracle(spark):
    df = spark.createDataFrame(RAW, ["doc_id", "text"]).repartition(5)
    got = {
        r["idx"]: r["cnt"] for r in feature_counts(df, n_features=N).collect()
    }
    want = _oracle_counts([t for _, t in RAW], N, 2)
    assert got == {i: int(want[i]) for i in np.nonzero(want)[0]}


def test_fit_matches_oracle_and_layout_invariant(spark):
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    lp1 = fit_feature_dist(df.repartition(1), n_features=N)
    lp7 = fit_feature_dist(df.repartition(7), n_features=N)
    want = _oracle_logp([t for _, t in RAW], N, 2, 1.0)
    np.testing.assert_allclose(lp1, want, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(lp1, lp7)


def test_importance_weights_match_oracle(spark):
    lp_t, lp_r, want = _weights_oracle()
    df = spark.createDataFrame(RAW, ["doc_id", "text"]).repartition(3)
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in importance_weights(df, lp_t, lp_r).collect()
    }
    for did, w in want.items():
        if w is None:
            assert got[did] is None
        else:
            assert got[did] == pytest.approx(w, abs=2e-6)
    assert got["r8"] == 0.0  # token-less text: no evidence either way


def test_importance_weights_plan_is_narrow(spark):
    lp_t, lp_r, _ = _weights_oracle()
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    out = importance_weights(df, lp_t, lp_r)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan  # zero-shuffle Arrow map


def test_target_like_docs_score_higher(spark):
    lp_t, lp_r, want = _weights_oracle()
    chem = [want[d] for d in ("r1", "r3", "r5")]
    offtopic = [want[d] for d in ("r2", "r4", "r6")]
    assert min(chem) > max(offtopic)


def test_dsir_select_deterministic_and_ordered(spark):
    lp_t, lp_r, want = _weights_oracle()
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    # widen the logw gap far past the Gumbel noise scale so top-k must be
    # exactly the highest-weight docs regardless of seed; the token-less
    # r8 is excluded — its logw is exactly 0 while every text doc's raw
    # weight is negative (smoothed log-probs are ≪ 0), which is the
    # documented "no evidence" semantics, not a ranking bug
    boosted = importance_weights(df, lp_t * 50, lp_r * 50).where(
        "doc_id <> 'r8'"
    )
    top = {r["doc_id"] for r in dsir_select(boosted, 3, seed="a").collect()}
    assert top == {"r1", "r3", "r5"}
    w = importance_weights(df, lp_t, lp_r)
    a = sorted(r["doc_id"] for r in dsir_select(w, 4, seed="s1").collect())
    b = sorted(
        r["doc_id"]
        for r in dsir_select(w.repartition(7), 4, seed="s1").collect()
    )
    assert a == b  # deterministic + partition-invariant


def test_gumbel_key_duckdb_mirror(spark, duck):
    lp_t, lp_r, want = _weights_oracle()
    rows = [(d, w) for d, w in want.items() if w is not None]
    df = spark.createDataFrame(rows, ["doc_id", "dsir_logw"])
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", gumbel_key("dsir_logw", "doc_id", "sx").alias("k")
        ).collect()
    }
    sql = gumbel_key_sql("logw", "id", "sx")
    for did, w in rows:
        [(mirror,)] = duck.execute(
            f"SELECT {sql} FROM (SELECT ? AS id, ?::DOUBLE AS logw)", [did, w]
        ).fetchall()
        assert got[did] == pytest.approx(mirror, abs=1e-9)


def test_dsir_select_rate(spark):
    lp_t, lp_r, _ = _weights_oracle()
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    w = importance_weights(df, lp_t, lp_r)
    full = dsir_select_rate(w, 1.0)
    assert sorted(r["doc_id"] for r in full.collect()) == [
        f"r{i}" for i in (1, 2, 3, 4, 5, 6, 8)
    ]  # NULL-weight r7 dropped; no key column survives
    assert "__dsir_key" not in full.columns
    some = dsir_select_rate(w, 0.5, seed="t")
    n = some.count()
    assert 1 <= n <= 6
    again = sorted(r["doc_id"] for r in dsir_select_rate(w, 0.5, seed="t").collect())
    assert again == sorted(r["doc_id"] for r in some.collect())


def test_validation_errors(spark):
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    lp = np.zeros(8)
    with pytest.raises(ValueError, match="n_features"):
        feature_counts(df, n_features=0)
    with pytest.raises(ValueError, match="ngram_max"):
        feature_counts(df, ngram_max=3)
    with pytest.raises(ValueError, match="smoothing"):
        fit_feature_dist(df, n_features=8, smoothing=0.0)
    with pytest.raises(ValueError, match="equal-length"):
        importance_weights(df, lp, np.zeros(9))
    with pytest.raises(ValueError, match="already exists"):
        importance_weights(df.withColumn("dsir_logw", df.doc_id), lp, lp)
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(df.withColumn("dsir_logw", df.doc_id.cast("double")), 0)
    with pytest.raises(ValueError, match="rate must be"):
        dsir_select_rate(df.withColumn("dsir_logw", df.doc_id.cast("double")), 0.0)
    with pytest.raises(ValueError, match="reserved"):
        dsir_select_rate(
            df.withColumn("dsir_logw", F_lit0()).withColumn("__dsir_key", F_lit0()),
            0.5,
        )


def F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0.0)


def test_end_to_end_enrichment(spark):
    """fit → weight → select recovers the planted target-domain docs."""
    target = spark.createDataFrame([(t,) for t in TARGET], ["text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    lp_t = fit_feature_dist(target, n_features=N)
    lp_r = fit_feature_dist(raw, n_features=N)
    w = importance_weights(raw, lp_t * 50, lp_r * 50).where("doc_id <> 'r8'")
    picked = {r["doc_id"] for r in dsir_select(w, 3, seed="e2e").collect()}
    assert picked == {"r1", "r3", "r5"}


def test_incremental_counts_merge_equals_one_shot(spark):
    """Persisted-counts refresh: feature_counts partials merged across
    batches ≡ one-shot fit over the union (the sketch mergeability rule)."""
    from vectrekker_spark.operators.dsir import (
        log_probs_from_counts,
        merge_feature_counts,
    )

    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    b1 = df.where("doc_id <= 'r3'")
    b2 = df.where("doc_id > 'r3'")
    merged = merge_feature_counts(
        feature_counts(b1, n_features=N), feature_counts(b2, n_features=N)
    )
    lp_inc = log_probs_from_counts(merged, n_features=N)
    lp_all = fit_feature_dist(df, n_features=N)
    np.testing.assert_array_equal(lp_inc, lp_all)
    with pytest.raises(ValueError, match="feature_counts frame"):
        merge_feature_counts(df)
    with pytest.raises(ValueError, match="feature geometry"):
        log_probs_from_counts(merged, n_features=4)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
