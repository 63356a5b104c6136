"""Hypothesis property tests over the pure-python reference implementations
of engine kernels (chunking geometry, hashing embedder, byte features) —
fast invariants that complement the Spark-vs-DuckDB oracle."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from vectrekker_spark.operators.multimodal import byte_histogram_features
from vectrekker_spark.queries.vector import hash_embed_batch

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")),
    min_size=1,
    max_size=400,
)


@settings(max_examples=50, deadline=None)
@given(TEXT)
def test_hash_embed_unit_norm_or_zero(text):
    vec = hash_embed_batch(pd.Series([text]))[0]
    nrm = math.sqrt(sum(x * x for x in vec))
    assert abs(nrm - 1.0) < 1e-9 or nrm == 0.0


@settings(max_examples=50, deadline=None)
@given(TEXT)
def test_hash_embed_deterministic_and_whitespace_insensitive(text):
    a = hash_embed_batch(pd.Series([text]))[0]
    b = hash_embed_batch(pd.Series([f"  {text}  "]))[0]  # trim-invariant
    assert a == b


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_byte_histogram_is_distribution(payload):
    h = byte_histogram_features(payload)
    assert len(h) == 16 and all(x >= 0 for x in h)
    if payload:
        assert abs(sum(h) - 1.0) < 1e-9
    else:
        assert sum(h) == 0.0


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=700), st.integers(min_value=0, max_value=50))
def test_chunk_geometry(n, overlap):
    # pure-python mirror of chunk_text's sequence arithmetic: coverage + step
    size = overlap + 50
    step = size - overlap
    starts = list(range(1, max(n, 1) + 1, step))
    # every char covered
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + size, n + 1)))
    assert covered == set(range(1, n + 1))
    # chunk starts strictly increasing, first at 1
    assert starts[0] == 1 and all(b - a == step for a, b in zip(starts, starts[1:]))
