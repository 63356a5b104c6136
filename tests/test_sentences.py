"""Sentence segmentation (functions/text.sentence_split) vs a DuckDB
mirror, and sentence-aware chunking (operators/chunk.chunk_by_sentences)
vs a Python greedy-packing oracle."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import SENTENCE_BOUNDARY, sentence_split
from vectrekker_spark.operators.chunk import chunk_by_sentences

SEP = "\x1f"


def _py_sentences(text):
    if text is None:
        return None
    t = text.strip().replace(SEP, "")  # pre-existing sentinels stripped
    return re.sub(SENTENCE_BOUNDARY, "\\1" + SEP + "\\2", t).split(SEP)


def _py_chunks(text, max_chars):
    if text is None or not text.strip():
        return [] if text is None or text.strip() == "" else None
    sents = [s for s in _py_sentences(text) if len(s) > 0]
    chunks, cur = [], ""
    for s in sents:
        if not cur:
            cur = s
        elif len(cur) + len(s) + 1 <= max_chars:
            cur = cur + " " + s
        else:
            chunks.append(cur)
            cur = s
    if cur:
        chunks.append(cur)
    return chunks


CASES = [
    "First sentence. Second one! Third? 'Quoted start.' (Parens too.)",
    "Mr. Smith went home.",  # documented limit: splits after "Mr."
    "no terminal punctuation here",
    "Trailing period.",
    "Ends mid list: a. b. c. lowercase starters never split",
    "Multi!!! Bang?! Then more.",
    "",
    "   ",
    None,
    # binary-contaminated text: a literal U+001F must NOT act as a
    # sentence boundary (review finding — it is stripped first)
    "binary\x1fjunk inside. Next sentence.",
]


def test_sentence_split_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i long, text string"
    )
    got = {
        r.i: r.s for r in df.select("i", sentence_split("text").alias("s")).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == _py_sentences(t), repr(t)
    # spot contract checks
    assert got[0][:2] == ["First sentence.", "Second one!"]
    assert got[1] == ["Mr.", "Smith went home."]
    assert got[2] == ["no terminal punctuation here"]
    assert got[4] == ["Ends mid list: a. b. c. lowercase starters never split"]

    import duckdb

    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame([(i, c) for i, c in enumerate(CASES)], columns=["i", "text"])
    )
    sql_pat = SENTENCE_BOUNDARY.replace("'", "''")  # the split_bucket lesson
    mirror = {
        r[0]: r[1]
        for r in con.execute(
            f"""
            SELECT i, string_split(
              regexp_replace(replace(trim(text), chr(31), ''), '{sql_pat}',
                             '\\1' || chr(31) || '\\2', 'g'), chr(31))
            FROM t
            """
        ).fetchall()
    }
    con.close()
    for i, t in enumerate(CASES):
        if t is None:
            assert mirror[i] is None
        else:
            assert mirror[i] == got[i], repr(t)


def test_chunk_by_sentences_matches_oracle(spark):
    texts = [
        "One short. Two short. Three is a bit longer now. Four! Five ends it.",
        "A single enormously long sentence that certainly exceeds the cap "
        "because it just keeps going and going without terminal punctuation",
        "Tiny. Also tiny. Small!",
        None,
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_by_sentences(df, max_chars=40)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, t in enumerate(texts):
        want = _py_chunks(t, 40)
        if t is None or not (t or "").strip():
            assert i not in got  # no chunks for NULL/empty
            continue
        assert [c for _, c in sorted(got[i])] == want, repr(t)
    # every chunk respects the cap unless it is a single oversized sentence
    for i, chunks in got.items():
        for _, c in chunks:
            assert len(c) <= 40 or " " not in c or texts[i].startswith("A single")
    # oversized sentence became exactly one chunk
    assert len(got[1]) == 1 and got[1][0][1] == texts[1]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "Short one.",
                "A somewhat longer sentence here.",
                "Tiny!",
                "Question for you?",
                "This particular sentence is deliberately long enough to overflow.",
            ]
        ),
        min_size=1,
        max_size=8,
    )
)
def test_property_chunks_match_oracle(spark, sents):
    text = " ".join(sents)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_by_sentences(df, max_chars=50).collect()
    )
    assert [c for _, c in rows] == _py_chunks(text, 50)
    # lossless: joining chunks with spaces rebuilds the sentence stream
    assert " ".join(c for _, c in rows) == " ".join(
        s for s in _py_sentences(text) if s
    )


def test_chunk_by_sentences_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_chars"):
        chunk_by_sentences(df, max_chars=0)
    plan = (
        chunk_by_sentences(df, max_chars=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # narrow: no shuffle, no Python
    assert "Python" not in plan
