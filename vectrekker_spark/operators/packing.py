"""Sequence packing: greedy first-fit-sequential packing of chunks into
fixed-token-budget training sequences — the step between chunking (L4) and
batch assembly in an LLM training-data pipeline. (North-star addition; the
reference stops at per-file embedding, `vectrekker/main.py:180-185`.)

Spark-first formulation: packing is inherently sequential *within* a
stream of chunks, but streams are independent *across* documents — so
shard documents into hash buckets (every chunk of a doc lands in one
bucket), run the greedy packer per bucket with ``applyInPandas``, and make
sequence ids globally unique by offsetting with the bucket id. One shuffle
(the groupBy), no driver collect, O(total chunks / n_buckets) memory per
task — at 100 TB you raise ``n_buckets`` so each bucket fits an executor.

Determinism/partition-invariance: the packer sorts each bucket by
(doc, chunk) before filling, and bucket assignment depends only on the doc
key — so the output is a pure function of the data, independent of input
partitioning (tests/test_packing.py pins this).

Packing policy (greedy first-fit-sequential, the common default for
training-data prep): walk chunks in (doc, chunk) order, start a new
sequence when the next chunk would overflow ``max_tokens``. A single chunk
larger than the budget gets its own (overflowing) sequence rather than
being dropped — the caller decides whether to re-chunk or discard
(`filter(col("seq_tokens") > budget)` finds them).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Local sequence counter can't collide across buckets as long as no bucket
# packs more than this many sequences; asserted in the packer.
_SEQS_PER_BUCKET = 1 << 33


def pack_sequences(
    chunks: DataFrame,
    max_tokens: int,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tok_col: str = "n_tokens",
    n_buckets: int = 256,
) -> DataFrame:
    """Assign every chunk to a packed sequence.

    Returns the input columns plus ``seq_id`` (global sequence id, long),
    ``seq_pos`` (0-based position of the chunk within its sequence) — one
    output row per input chunk, so downstream can group by ``seq_id`` to
    materialize sequences (e.g. ``concat_ws`` the text, ``sum`` the tokens).
    """
    in_cols = chunks.columns
    for c in (doc_col, chunk_col, tok_col):
        if c not in in_cols:
            raise ValueError(f"pack_sequences: missing required column {c!r}")
    out_schema = ", ".join(
        f"`{n}` {t}" for n, t in chunks.dtypes
    ) + ", seq_id long, seq_pos int"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([doc_col, chunk_col], kind="mergesort").reset_index(
            drop=True
        )
        bucket = int(pdf["__bucket"].iloc[0])
        toks = pdf[tok_col].to_numpy()
        seq_local = [0] * len(pdf)
        pos = [0] * len(pdf)
        cur_seq, cur_fill, cur_pos = 0, 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if cur_fill > 0 and cur_fill + t > max_tokens:
                cur_seq, cur_fill, cur_pos = cur_seq + 1, 0, 0
            seq_local[i] = cur_seq
            pos[i] = cur_pos
            cur_fill += t
            cur_pos += 1
        assert cur_seq < _SEQS_PER_BUCKET, "raise n_buckets: bucket overflow"
        out = pdf.drop(columns=["__bucket"])
        out["seq_id"] = [bucket * _SEQS_PER_BUCKET + s for s in seq_local]
        out["seq_pos"] = pos
        return out

    bucketed = chunks.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(doc_col)), F.lit(n_buckets))
    )
    return bucketed.groupBy("__bucket").applyInPandas(pack, schema=out_schema)


def sequence_stats(packed: DataFrame, max_tokens: int,
                   tok_col: str = "n_tokens") -> DataFrame:
    """Per-sequence fill report: token total, chunk count, fill ratio.
    `fill` near 1.0 everywhere means little padding waste at training time."""
    return (
        packed.groupBy("seq_id")
        .agg(
            F.sum(tok_col).alias("seq_tokens"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .withColumn("fill", F.round(F.col("seq_tokens") / F.lit(max_tokens), 4))
    )
