"""Language identification (operators/langid.py): planted multilingual
fixture accuracy, independent Python scorer oracle, layout invariance,
narrow-plan assertion, NULL/empty rules, save/load guards."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.langid import (
    LangIdModel,
    char_ngrams,
    fit_langid,
    load_langid,
    predict_lang,
    save_langid,
)

_SCRIPTS = {
    "cyr": "абвгдежзиклмнопрстуфхцчшщыэюя",
    "grk": "αβγδεζηθικλμνξοπρστυφχψω",
    "cjk": "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下",
}
_ENG_VOCAB = (
    "the and of to in that it is was for with as his on be at by had this "
    "her not are but from or have an they which one you were all she there "
    "their when who will more no if out so said what its about than them"
).split()
_FIN_C = "klmnpstv"
_FIN_V = "aeiouäöy"


def _word(rng: random.Random, lang: str) -> str:
    if lang in _SCRIPTS:
        a = _SCRIPTS[lang]
        return "".join(rng.choice(a) for _ in range(rng.randint(2, 7)))
    if lang == "eng":
        return rng.choice(_ENG_VOCAB)
    # finnish-like: CVVCV(CV) with doubled vowels — same latin script as
    # eng but a distinct n-gram distribution (the hard pair in the fixture)
    parts = []
    for _ in range(rng.randint(2, 4)):
        parts.append(rng.choice(_FIN_C) + rng.choice(_FIN_V) * rng.randint(1, 2))
    return "".join(parts)


def _doc(rng: random.Random, lang: str) -> str:
    return " ".join(_word(rng, lang) for _ in range(rng.randint(15, 40)))


def _fixture(rng: random.Random, n_per_lang: int):
    langs = sorted(list(_SCRIPTS) + ["eng", "fin"])
    rows = []
    for lang in langs:
        for _ in range(n_per_lang):
            rows.append((_doc(rng, lang), lang))
    rng.shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def model(spark):
    rng = random.Random(1401)
    train = _fixture(rng, 80)
    df = spark.createDataFrame(train, "text string, lang string")
    return fit_langid(df, n_features=1 << 14, iters=150)


def test_accuracy_on_held_out_fixture(spark, model):
    """Measured accuracy on a held-out draw of the planted 5-language
    corpus (3 disjoint scripts + the eng/fin same-script pair). Gate 0.9;
    measured ~1.0 — the value is printed for SCALE.md."""
    rng = random.Random(9014)
    test = _fixture(rng, 40)
    df = spark.createDataFrame(test, "text string, lang string")
    got = predict_lang(df.select("text", F.col("lang").alias("truth")), model)
    rows = got.collect()
    acc = sum(r["lang"] == r["truth"] for r in rows) / len(rows)
    print(f"langid held-out accuracy: {acc:.4f} over {len(rows)} docs")
    assert acc >= 0.9, acc
    # confidences are probabilities, round-6
    assert all(0.0 <= r["lang_conf"] <= 1.0 for r in rows)


def test_predictions_match_independent_oracle(spark, model):
    """Re-score a sample with an INDEPENDENT implementation (hashlib +
    plain loops, no operator code) from the model arrays alone."""
    import hashlib
    from collections import Counter

    rng = random.Random(77)
    texts = [t for t, _ in _fixture(rng, 6)] + ["", "   ", "a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["text"]: (r["lang"], r["lang_conf"])
           for r in predict_lang(df, model).collect()}

    W, b, classes = model.weights, model.bias, model.classes
    nf = W.shape[1]
    for t in texts:
        s = " ".join(t[: model.max_chars].lower().split())
        grams = []
        for n in range(model.n_lo, model.n_hi + 1):
            grams += [s[i:i + n] for i in range(len(s) - n + 1)]
        z = b.copy()
        if grams:
            cnt = Counter(
                int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % nf
                for g in grams
            )
            tot = sum(cnt.values())
            for i, c in sorted(cnt.items()):
                z = z + W[:, i] * (c / tot)
        p = np.exp(z - z.max())
        p /= p.sum()
        k = int(np.argmax(p))
        lang, conf = got[t]
        assert lang == classes[k], (t[:30], lang, classes[k])
        assert abs(conf - p[k]) < 1e-6, (t[:30], conf, p[k])


def test_char_ngrams_contract():
    assert char_ngrams("Ab c", 1, 2, max_chars=10) == [
        "a", "b", " ", "c", "ab", "b ", " c"
    ]
    # whitespace runs collapse; prefix cap applies BEFORE collapsing
    assert char_ngrams("a \t\n b", 1, 1) == ["a", " ", "b"]
    assert char_ngrams("", 1, 3) == []


def test_layout_invariance(spark, model):
    rng = random.Random(5)
    docs = [(i, t) for i, (t, _) in enumerate(_fixture(rng, 10))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    one = {r["doc_id"]: (r["lang"], r["lang_conf"])
           for r in predict_lang(df.coalesce(1), model).collect()}
    many = {r["doc_id"]: (r["lang"], r["lang_conf"])
            for r in predict_lang(df.repartition(7), model).collect()}
    assert one == many


def test_plan_is_narrow(spark, model):
    df = spark.range(10).withColumn("text", F.lit("some text"))
    plan = predict_lang(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_null_and_empty_rules(spark, model):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   \t ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in predict_lang(df, model).collect()}
    assert rows[0]["lang"] is None and rows[0]["lang_conf"] is None
    # zero-gram texts score the bias prior — both get the SAME answer
    assert rows[1]["lang"] == rows[2]["lang"] is not None
    assert rows[1]["lang_conf"] == rows[2]["lang_conf"]


def test_existing_column_guard(spark, model):
    df = spark.createDataFrame([("x", "en")], "text string, lang string")
    with pytest.raises(ValueError, match="already exists"):
        predict_lang(df, model)


def test_save_load_roundtrip_and_guards(spark, model, tmp_path):
    p = str(tmp_path / "langid.npz")
    save_langid(p, model)
    m2 = load_langid(p)
    assert m2.classes == model.classes
    assert (m2.n_lo, m2.n_hi, m2.max_chars) == (
        model.n_lo, model.n_hi, model.max_chars)
    assert np.array_equal(m2.weights, model.weights)
    df = spark.createDataFrame([("hello there",)], "text string")
    assert predict_lang(df, model).collect() == predict_lang(df, m2).collect()

    # not-a-model file
    bad = tmp_path / "bad.npz"
    with open(bad, "wb") as f:
        np.savez(f, weights=np.zeros((2, 4)))
    with pytest.raises(ValueError, match="lacks"):
        load_langid(str(bad))
    # unsorted classes violate the tie policy
    with pytest.raises(ValueError, match="sorted"):
        LangIdModel(np.zeros((2, 4)), np.zeros(2), ["b", "a"])


def test_fit_guards(spark):
    df = spark.createDataFrame(
        [("text one", "en"), ("text two", "en")], "text string, lang string"
    )
    with pytest.raises(ValueError, match="at least 2"):
        fit_langid(df, n_features=64)
    with pytest.raises(ValueError, match="max_rows"):
        fit_langid(
            df.unionByName(
                spark.createDataFrame([("autre", "fr")] * 3,
                                      "text string, lang string")
            ),
            n_features=64, max_rows=3,
        )
    nulls = spark.createDataFrame(
        [(None, "en"), ("x", None)], "text string, lang string"
    )
    with pytest.raises(ValueError, match="at least 2|no usable"):
        fit_langid(nulls, n_features=64)


def test_predict_lang_rejects_same_out_and_conf_col(spark, model_fix=None):
    import pytest

    from vectrekker_spark.operators.langid import LangIdModel, predict_lang
    import numpy as np

    m = LangIdModel(np.zeros((2, 16)), np.zeros(2), ["aa", "bb"])
    df = spark.createDataFrame([("words",)], "text string")
    with pytest.raises(ValueError, match="must differ"):
        predict_lang(df, m, out_col="lang", conf_col="lang")
