"""Distributed BPE trainer (operators/bpetrainer.py) vs a from-scratch
naive oracle, a DuckDB word-frequency mirror, and round-trip properties."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectrekker_spark.functions.tokenize import BPE_ISH_PATTERN
from vectrekker_spark.operators.bpetrainer import (
    BPEModel,
    _merge_word,
    bpe_encode,
    bpe_load,
    bpe_save,
    bpe_token_count,
    bpe_train,
    word_freqs,
)

_RX = re.compile(BPE_ISH_PATTERN, re.ASCII)


def _py_word_freqs(texts, k):
    c = Counter()
    for t in texts:
        if t is None:
            continue
        for w in _RX.findall(t):
            if len(w) <= 64:
                c[w] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _naive_train(freq_rows, n_merges, min_pair_count):
    """Recompute ALL pair counts from scratch each iteration — the slow
    reference the incremental trainer must match merge-for-merge."""
    words = [(tuple(w), f) for w, f in freq_rows if w]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                counts[p] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        words = [(_merge_word(s, best), f) for s, f in words]
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_freqs_matches_python_and_duckdb(spark):
    texts = [
        "the cat sat on the mat",
        "the cat's hat, the cat's 2nd hat!",
        None,
        "x" * 80 + " short words only",  # 80-char word excluded by the cap
    ]
    df = _docs(spark, texts)
    got = [(r.word, r.freq) for r in word_freqs(df, max_word_types=100).collect()]
    assert got == _py_word_freqs(texts, 100)

    import duckdb

    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"text": [t for t in texts if t is not None]}))
    sql_pat = BPE_ISH_PATTERN.replace("'", "''")  # the split_bucket lesson
    mirror = con.execute(
        f"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(text, '{sql_pat}')) AS word
          FROM docs
        )
        SELECT word, count(*) AS freq FROM toks WHERE length(word) <= 64
        GROUP BY word ORDER BY freq DESC, word ASC LIMIT 100
        """
    ).fetchall()
    con.close()
    assert got == [(w, f) for w, f in mirror]
    # top-K determinism: ties broken word-asc
    top = word_freqs(df, max_word_types=3).collect()
    assert [(r.word, r.freq) for r in top] == _py_word_freqs(texts, 3)


def test_hand_verified_merges(spark):
    # words: aa×2, ab×1 → pair (a,a) count 2, (a,b) count 1; with
    # min_pair_count=2 exactly one merge fires
    df = _docs(spark, ["aa aa ab"])
    model = bpe_train(df, n_merges=10, min_pair_count=2)
    assert model.merges == [("a", "a")]
    model = bpe_train(df, n_merges=10, min_pair_count=1)
    # then (a,b) count 1 merges next; nothing else remains
    assert model.merges == [("a", "a"), ("a", "b")]


def test_trainer_matches_naive_oracle_on_fixture(spark):
    texts = [
        "low low low low low lower lower newest newest",
        "newest newest newest newest widest widest widest",
        "the quick brown fox jumps over the lazy dog",
        "sphinx of black quartz judge my vow",
    ]
    df = _docs(spark, texts)
    freqs = _py_word_freqs(texts, 30_000)
    want = _naive_train(freqs, 40, 2)
    got = bpe_train(df, n_merges=40, min_pair_count=2).merges
    assert got == want
    # partitioning independence: same merges from a 7-way repartition
    got7 = bpe_train(df.repartition(7), n_merges=40, min_pair_count=2).merges
    assert got7 == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["ab", "abc", "ba", "cab", "a", "bb", "abab"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_property_trainer_matches_naive(spark, texts):
    df = _docs(spark, texts)
    freqs = _py_word_freqs(texts, 30_000)
    want = _naive_train(freqs, 15, 1)
    got = bpe_train(df, n_merges=15, min_pair_count=1).merges
    assert got == want


def test_encode_roundtrip_and_counts(spark):
    texts = [
        "low lower lowest, don't stop!",
        "",
        None,
        "repetition repetition repetition",
    ]
    df = _docs(spark, texts)
    model = bpe_train(df, n_merges=30, min_pair_count=2)
    enc = {
        r.doc_id: r.bpe_tokens for r in bpe_encode(df, model).collect()
    }
    cnt = {
        r.doc_id: r.bpe_n_tokens
        for r in bpe_token_count(df, model).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert enc[i] == [] and cnt[i] == 0
            continue
        words = _RX.findall(t)
        # lossless within pre-tokens: concatenating tokens rebuilds the words
        assert "".join(enc[i]) == "".join(words)
        # Spark kernel ≡ driver-side encode_word composition
        want = [s for w in words for s in model.encode_word(w)]
        assert enc[i] == want
        assert cnt[i] == len(want)
    # the most frequent word collapses to a single learned token
    assert model.encode_word("repetition") == ("repetition",)


def test_encode_plan_is_narrow(spark):
    df = _docs(spark, ["a b c"])
    model = BPEModel(merges=[("a", "b")])
    plan = bpe_encode(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle broadcast-closure map


def test_save_load_roundtrip_and_torn_file(tmp_path):
    model = BPEModel(merges=[("a", "b"), ("ab", "c")])
    path = str(tmp_path / "model.bpe.json")
    bpe_save(model, path)
    loaded = bpe_load(path)
    assert loaded.merges == model.merges
    assert loaded.pattern == model.pattern
    assert loaded.encode_word("abc") == ("abc",)
    with open(path, "w") as f:
        f.write('{"version": 1, "merges": [["a"')  # torn write
    with pytest.raises(ValueError, match="corrupt"):
        bpe_load(path)
    bpe_save(model, path)
    import json

    with open(path) as f:
        payload = json.load(f)
    payload["version"] = 99
    with open(path, "w") as f:
        json.dump(payload, f)
    with pytest.raises(ValueError, match="version"):
        bpe_load(path)


def test_validation(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError, match="max_word_types"):
        word_freqs(df, max_word_types=0)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=-1)
    with pytest.raises(ValueError, match="min_pair_count"):
        bpe_train(df, min_pair_count=0)


def test_bpe_stats_matches_python_oracle(spark):
    texts = ["low lower lowest", "newest newest widest", None, ""]
    df = _docs(spark, texts)
    model = bpe_train(df, n_merges=20, min_pair_count=2)
    from vectrekker_spark.operators.bpetrainer import bpe_stats

    got = bpe_stats(df, model)
    words = [w for t in texts if t for w in _RX.findall(t)]
    toks = [s for w in words for s in model.encode_word(w)]
    assert got["n_words"] == len(words)
    assert got["n_tokens"] == len(toks)
    assert got["tokens_per_word"] == round(len(toks) / len(words), 4)
    assert got["chars_per_token"] == round(
        sum(len(t) for t in toks) / len(toks), 4
    )
    assert got["single_char_token_frac"] == round(
        sum(1 for t in toks if len(t) == 1) / len(toks), 4
    )
    # a model with no merges tokenizes to single chars: fertility is
    # chars/word and the single-char fraction is 1.0
    empty = BPEModel(merges=[])
    g2 = bpe_stats(df, empty)
    assert g2["single_char_token_frac"] == 1.0
    assert g2["chars_per_token"] == 1.0


def test_bpe_load_rejects_foreign_pattern_and_bad_merges(tmp_path):
    """r14s3 pins: missing fields raise ValueError (not KeyError), a
    merges entry that is a bare string is NOT reinterpreted as a char
    pair, and a model trained under a different pre-tokenizer pattern
    refuses to load (the stored pattern is a geometry pin)."""
    import json

    import pytest

    from vectrekker_spark.functions.tokenize import BPE_ISH_PATTERN
    from vectrekker_spark.operators.bpetrainer import bpe_load

    p = tmp_path / "m.json"
    p.write_text(json.dumps({"version": 1}))
    with pytest.raises(ValueError, match="no 'merges'"):
        bpe_load(str(p))
    p.write_text(json.dumps(
        {"version": 1, "pattern": BPE_ISH_PATTERN, "merges": ["ab"]}
    ))
    with pytest.raises(ValueError, match="malformed merge"):
        bpe_load(str(p))
    p.write_text(json.dumps(
        {"version": 1, "pattern": "\\S+", "merges": [["a", "b"]]}
    ))
    with pytest.raises(ValueError, match="different"):
        bpe_load(str(p))


def test_bpe_encode_out_col_collision(spark):
    import pytest
    from pyspark.sql import functions as F

    from vectrekker_spark.operators.bpetrainer import (
        BPEModel,
        bpe_encode,
        bpe_token_count,
    )

    df = spark.createDataFrame([("x y",)], "text string").withColumn(
        "bpe_tokens", F.lit("taken")
    )
    m = BPEModel(merges=[])
    with pytest.raises(ValueError, match="already exists"):
        bpe_encode(df, m)
    with pytest.raises(ValueError, match="already exists"):
        bpe_token_count(df.withColumnRenamed("bpe_tokens", "bpe_n_tokens"), m)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
