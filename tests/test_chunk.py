"""Chunking properties: full coverage + exact overlap (the fix for the
reference's 8191-token crash, vectrekker/main.py:177-178)."""

from __future__ import annotations

import pytest

from vectrekker_spark.operators.chunk import chunk_text

SIZE, OVERLAP = 100, 20
STEP = SIZE - OVERLAP


def _chunks(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = chunk_text(df, size=SIZE, overlap=OVERLAP).orderBy("chunk_id").collect()
    return [r["chunk_text"] for r in rows]


def test_reconstruction(spark):
    text = "x" * 57 + "abcdefghij" * 61  # 667 chars, non-aligned
    chunks = _chunks(spark, text)
    rebuilt = "".join(c[:STEP] for c in chunks[:-1]) + chunks[-1]
    assert rebuilt == text


def test_overlap_exact(spark):
    text = "".join(chr(97 + (i % 26)) for i in range(500))
    chunks = _chunks(spark, text)
    for a, b in zip(chunks, chunks[1:]):
        assert a[STEP:STEP + OVERLAP] == b[:OVERLAP]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "tiny") == ["tiny"]


def test_boundary_exact_multiple(spark):
    # length == size → one chunk... plus the tail start at STEP covers rest
    text = "a" * SIZE
    chunks = _chunks(spark, text)
    assert chunks[0] == text
    rebuilt = "".join(c[:STEP] for c in chunks[:-1]) + chunks[-1]
    assert rebuilt == text


def test_invalid_params(spark):
    df = None
    with pytest.raises(ValueError):
        chunk_text(df, size=10, overlap=10)


def test_null_and_empty_text_emit_no_chunks(spark):
    df = spark.createDataFrame(
        [(0, "some real content here"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    rows = chunk_text(df, size=10, overlap=2).collect()
    assert {r["doc_id"] for r in rows} == {0}
    assert all(r["chunk_text"] for r in rows)
