"""Document chunking — the feature the reference explicitly lacks
("splitting up files not yet supported", `vectrekker/main.py:177-178`, which
instead hard-crashes on >8191-token docs via assert).

Fixed-size windows with overlap, as pure Catalyst expressions: a
`sequence(1, length, step)` of start offsets built into an array, then
`posexplode`. One pass, no shuffle, no UDF — stays in whole-stage codegen
and scales linearly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Chunk i covers characters [1 + i*(size-overlap), …+size). The final chunk
    may be shorter; every character belongs to at least one chunk. Start
    offsets stop at length-overlap: a start inside the final overlap tail
    would yield a chunk wholly contained in its predecessor (pure duplicate
    rows inflating the index — e.g. length == size used to emit a second
    chunk covering only the last `overlap` chars).
    Returns (id_col, chunk_id, chunk_text).
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    step = size - overlap
    # NULL/empty text yields NO chunks: length(NULL) is NULL and Spark's
    # greatest() skips nulls, so the naive sequence bound silently emitted
    # one junk (null or empty) chunk per such document.
    # backtick-quote the identifier: a column name needing escaping
    # (spaces, reserved words) otherwise breaks the interpolated SQL at
    # plan time (r14s3 review; every other operator takes names via
    # F.col). Embedded backticks double per the Spark quoting rule.
    tq = "`" + text_col.replace("`", "``") + "`"
    chunks = F.expr(
        f"CASE WHEN {tq} IS NULL OR length({tq}) = 0 THEN "
        f"  array() "
        f"ELSE transform(sequence(1, greatest(length({tq}) - {overlap}, 1), {step}), "
        f"  s -> substring({tq}, s, {size})) END"
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )


def chunk_by_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 512,
) -> DataFrame:
    """Sentence-aware chunking: greedily pack whole sentences
    (functions/text.sentence_split) into chunks of at most ``max_chars``
    characters (single-space joined), never cutting mid-sentence — the
    chunk boundary quality fixed-window chunking can't give an embedding
    or training pipeline.

    Contract (mirrored by the tests' Python oracle):
    - sentences are packed in order; a sentence that doesn't fit starts
      the next chunk;
    - ONE sentence longer than ``max_chars`` becomes its own oversized
      chunk (honest: splitting it mid-sentence is exactly what this
      operator exists to avoid — compose with ``chunk_text`` downstream
      if hard caps are required);
    - NULL/empty text yields no chunks (the chunk_text rule);
    - whitespace between packed sentences normalizes to one space.

    Pure Catalyst: sentence_split is a regexp sentinel split and the
    packer is ONE ``F.aggregate`` higher-order fold over the per-row
    sentence array — no Python, no shuffle, linear at 100 TB (HOFs are
    interpreted CodegenFallback, the documented trade every array
    operator here makes)."""
    if max_chars < 1:
        raise ValueError("max_chars must be >= 1")
    from vectrekker_spark.functions.text import sentence_split

    sents = F.filter(
        sentence_split(F.col(text_col)), lambda s: F.length(s) > 0
    )
    init = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.lit("").alias("cur"),
    )

    def merge(acc, s):
        cur = acc.getField("cur")
        chunks = acc.getField("chunks")
        fits = (F.length(cur) == 0) | (
            F.length(cur) + F.length(s) + 1 <= max_chars
        )
        grown = F.when(F.length(cur) == 0, s).otherwise(
            F.concat(cur, F.lit(" "), s)
        )
        return F.when(
            fits, F.struct(chunks.alias("chunks"), grown.alias("cur"))
        ).otherwise(
            F.struct(
                F.array_append(chunks, cur).alias("chunks"), s.alias("cur")
            )
        )

    def finish(acc):
        cur = acc.getField("cur")
        chunks = acc.getField("chunks")
        return F.when(F.length(cur) > 0, F.array_append(chunks, cur)).otherwise(
            chunks
        )

    packed = F.when(
        F.col(text_col).isNull(), F.array().cast("array<string>")
    ).otherwise(F.aggregate(sents, init, merge, finish))
    return df.select(
        F.col(id_col), F.posexplode(packed).alias("chunk_id", "chunk_text")
    )
