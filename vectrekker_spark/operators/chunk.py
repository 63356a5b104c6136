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
    chunks = F.expr(
        f"CASE WHEN {text_col} IS NULL OR length({text_col}) = 0 THEN "
        f"  array() "
        f"ELSE transform(sequence(1, greatest(length({text_col}) - {overlap}, 1), {step}), "
        f"  s -> substring({text_col}, s, {size})) END"
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
