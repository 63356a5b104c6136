"""Sequence packing (operators/packing.py): budget respected, every chunk
packed exactly once, doc-order preserved within sequences, partition
invariance, and oversize chunks isolated rather than dropped."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.packing import (
    _SEQS_PER_BUCKET,
    derive_n_buckets,
    pack_sequences,
    sequence_stats,
)

BUDGET = 100


@pytest.fixture(scope="module")
def chunks(spark):
    rows = []
    for doc in range(20):
        for ch in range(10):
            rows.append((doc, ch, f"d{doc}c{ch}", 7 + (doc * 10 + ch) % 40))
    rows.append((99, 0, "oversize", 250))  # single chunk > budget
    pdf = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk_text", "n_tokens"])
    return spark.createDataFrame(pdf).repartition(7)


def test_budget_and_coverage(chunks):
    packed = pack_sequences(chunks, BUDGET).cache()
    # every input chunk appears exactly once
    assert packed.count() == chunks.count()
    assert packed.select("doc_id", "chunk_id").distinct().count() == chunks.count()
    stats = sequence_stats(packed, BUDGET)
    # only the planted oversize chunk may exceed the budget, alone in its seq
    over = stats.filter(F.col("seq_tokens") > BUDGET).collect()
    assert len(over) == 1 and over[0]["n_chunks"] == 1
    # greedy first-fit: no two consecutive sequences could have been merged —
    # every non-final sequence of a bucket is > budget/2 full on average;
    # just sanity-check overall fill is decent
    mean_fill = stats.filter(F.col("seq_tokens") <= BUDGET).agg(
        F.avg("fill")
    ).first()[0]
    assert mean_fill > 0.5


def test_doc_order_within_sequence(chunks):
    packed = pack_sequences(chunks, BUDGET)
    rows = packed.orderBy("seq_id", "seq_pos").collect()
    by_seq: dict[int, list] = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append((r["doc_id"], r["chunk_id"]))
    for seq in by_seq.values():
        assert seq == sorted(seq)  # (doc, chunk) ascending inside a sequence


def test_partition_invariance(chunks):
    a = pack_sequences(chunks, BUDGET).orderBy("doc_id", "chunk_id").collect()
    b = (
        pack_sequences(chunks.repartition(3), BUDGET)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bfd_policy_budget_and_fill(chunks):
    ffs = pack_sequences(chunks, BUDGET, policy="ffs")
    bfd = pack_sequences(chunks, BUDGET, policy="bfd").cache()
    # coverage + budget hold for bfd too
    assert bfd.count() == chunks.count()
    stats = sequence_stats(bfd, BUDGET)
    over = stats.filter(F.col("seq_tokens") > BUDGET).collect()
    assert len(over) == 1 and over[0]["n_chunks"] == 1  # only the planted oversize

    def mean_fill(packed):
        return (
            sequence_stats(packed, BUDGET)
            .filter(F.col("seq_tokens") <= BUDGET)
            .agg(F.avg("fill"))
            .first()[0]
        )

    # best-fit-decreasing packs at least as tightly as first-fit-sequential
    assert mean_fill(bfd) >= mean_fill(ffs) - 1e-9
    # deterministic across partitionings
    a = bfd.orderBy("doc_id", "chunk_id").collect()
    b = (
        pack_sequences(chunks.repartition(3), BUDGET, policy="bfd")
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_materialize_sequences(chunks):
    from vectrekker_spark.operators.packing import materialize_sequences

    packed = pack_sequences(chunks, BUDGET)
    seqs = materialize_sequences(packed).cache()
    stats = {r["seq_id"]: r for r in sequence_stats(packed, BUDGET).collect()}
    rows = seqs.collect()
    assert len(rows) == len(stats)
    for r in rows:
        s = stats[r["seq_id"]]
        assert r["n_chunks"] == s["n_chunks"] and r["n_tokens"] == s["seq_tokens"]
        assert len(r["text"].split("\n\n")) == r["n_chunks"]
    # chunk text appears in seq_pos order regardless of partitioning
    one = (
        packed.filter(F.col("seq_id") == rows[0]["seq_id"])
        .orderBy("seq_pos")
        .collect()
    )
    assert rows[0]["text"] == "\n\n".join(c["chunk_text"] for c in one)
    again = materialize_sequences(pack_sequences(chunks.repartition(3), BUDGET))
    assert sorted(
        (r["seq_id"], r["text"]) for r in again.collect()
    ) == sorted((r["seq_id"], r["text"]) for r in rows)


# --- hypothesis property tests on the pure local packers (no Spark) -------

from hypothesis import given, settings
from hypothesis import strategies as st

from vectrekker_spark.operators.packing import fill_bfd, fill_ffs

TOKS = st.lists(st.integers(min_value=1, max_value=150), max_size=200)


def _check_invariants(toks, seq, pos, budget):
    assert len(seq) == len(pos) == len(toks)
    fills: dict[int, int] = {}
    by_seq: dict[int, list[int]] = {}
    for i, (s, p) in enumerate(zip(seq, pos)):
        fills[s] = fills.get(s, 0) + toks[i]
        by_seq.setdefault(s, []).append(p)
    for s, total in fills.items():
        # budget respected unless the sequence is a single oversize chunk
        assert total <= budget or len(by_seq[s]) == 1
    for positions in by_seq.values():
        assert sorted(positions) == list(range(len(positions)))  # dense 0..n-1


@settings(max_examples=200, deadline=None)
@given(toks=TOKS)
def test_prop_ffs_invariants(toks):
    seq, pos = fill_ffs(toks, 100)
    _check_invariants(toks, seq, pos, 100)
    # ffs additionally: seq indexes are non-decreasing in input order
    assert all(a <= b for a, b in zip(seq, seq[1:]))


@settings(max_examples=200, deadline=None)
@given(toks=TOKS)
def test_prop_bfd_invariants(toks):
    seq, pos = fill_bfd(toks, 100)
    _check_invariants(toks, seq, pos, 100)


@settings(max_examples=200, deadline=None)
@given(toks=TOKS)
def test_prop_bfd_never_more_sequences_than_ffs(toks):
    n_ffs = len(set(fill_ffs(toks, 100)[0]))
    n_bfd = len(set(fill_bfd(toks, 100)[0]))
    assert n_bfd <= n_ffs


def test_unknown_policy_raises(chunks):
    with pytest.raises(ValueError, match="policy"):
        pack_sequences(chunks, BUDGET, policy="magic")


def test_doc_chunks_share_bucket_stream(chunks):
    # all chunks of one doc land in consecutive positions of the same or
    # consecutive sequences (they are packed as one contiguous run)
    packed = pack_sequences(chunks, BUDGET)
    seqs = (
        packed.filter(F.col("doc_id") == 5)
        .orderBy("chunk_id")
        .select("seq_id")
        .collect()
    )
    ids = [r["seq_id"] for r in seqs]
    assert ids == sorted(ids)


# --- bucket-count auto-scaling (the 100 TB safety property) ---------------


def test_derive_n_buckets_pure():
    assert derive_n_buckets(0, 100) == 1  # empty corpus still packs
    assert derive_n_buckets(1, 100) == 1
    assert derive_n_buckets(100, 100) == 1
    assert derive_n_buckets(101, 100) == 2
    assert derive_n_buckets(10**13, 200_000) == 50_000_000  # 100 TB-ish
    with pytest.raises(ValueError, match="positive"):
        derive_n_buckets(10, 0)


def test_auto_buckets_scale_with_corpus(spark):
    # 400 single-chunk docs with a 10-row/bucket target must spread across
    # many buckets — the fixed-default OOM shape (everything in few giant
    # pandas groups) is the regression this pins against.
    pdf = pd.DataFrame(
        {
            "doc_id": range(400),
            "chunk_id": [0] * 400,
            "chunk_text": [f"d{i}" for i in range(400)],
            "n_tokens": [7] * 400,
        }
    )
    chunks = spark.createDataFrame(pdf).repartition(5)
    packed = pack_sequences(chunks, BUDGET, target_rows_per_bucket=10).cache()
    buckets = [
        r["b"]
        for r in packed.select(
            (F.col("seq_id") / F.lit(_SEQS_PER_BUCKET)).cast("long").alias("b")
        )
        .groupBy("b")
        .count()
        .select("b")
        .collect()
    ]
    n_buckets = derive_n_buckets(400, 10)
    assert n_buckets == 40
    assert all(0 <= b < n_buckets for b in buckets)
    assert len(buckets) > 10  # xxhash spreads docs over many buckets
    per_bucket = (
        packed.select((F.col("seq_id") / F.lit(_SEQS_PER_BUCKET)).cast("long").alias("b"))
        .groupBy("b")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_bucket <= 5 * 10  # no bucket concentrates the corpus
    # coverage is unchanged by the bucket spread
    assert packed.count() == 400
    packed.unpersist()


def test_auto_buckets_deterministic(chunks):
    # auto-derived bucket count is a pure function of the row count, so the
    # default path equals an explicit call with the same derived value
    n = chunks.count()
    auto = pack_sequences(chunks, BUDGET).orderBy("doc_id", "chunk_id").collect()
    explicit = (
        pack_sequences(chunks, BUDGET, n_buckets=derive_n_buckets(n))
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    assert [tuple(r) for r in auto] == [tuple(r) for r in explicit]
