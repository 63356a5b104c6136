"""Cross-document paragraph deduplication (the CCNet-style unit between
whole-document dedup and token-span dedup).

Whole-document dedup (operators/dedup.py) removes near-identical documents;
span dedup (operators/spandedup.py) strips repeated >=n-token substrings.
The unit real crawl pipelines dedup FIRST, though, is the paragraph: nav
bars, cookie banners, license blocks and "subscribe" footers repeat as
whole blocks across millions of pages (CCNet, Wenzek et al. 2019, dedups
hashed paragraphs across shards before anything else). This operator keys
each paragraph by a normalized hash, keeps the corpus-canonical occurrence
(minimal ``(id, pos)`` — the same keeper rule as dedup_by_url and
duplicate_spans), and strips every other occurrence, including repeats
WITHIN one document.

Semantics (mirrored by the tests' brute-force oracle and a DuckDB mirror):
- paragraphs = ``split(text, '\\n{2,}')`` — blank-line-separated blocks,
  positions are 0-based array indices;
- the dedup key is ``md5(lower(trim(regexp_replace(para, '\\s+', ' '))))``
  — case/whitespace-insensitive, so reflowed copies of a banner match;
- paragraphs whose NORMALIZED length is < ``min_chars`` are never deduped
  (short strings like "Yes." repeat naturally; stripping them corrupts
  prose) — default 40 chars, the order of CCNet's unit;
- for every key occurring more than once, all occurrences except the
  minimal ``(id, pos)`` struct are flagged and removed;
- documents with no flagged paragraph pass through BYTE-IDENTICAL;
  documents with flags are rebuilt from their kept paragraphs joined by
  exactly ``'\\n\\n'`` (separator runs normalize — the documented rebuild
  contract, same shape as strip_duplicate_spans' whitespace rule);
- rows with a NULL id or NULL text pass through untouched (a NULL id has
  no keeper order — the quota/sampling rule).

Scale shape (the 100 TB story): the document text NEVER shuffles. The
keyed stream is narrow (id, pos, 32-char hash); the keeper aggregate is
``groupBy(h).agg(min(struct(id,pos)), count)`` — partial aggregation
collapses a hot banner's millions of occurrences map-side before the
shuffle, so shuffle volume is O(distinct paragraphs). The flag join runs
only against keys with n_occ > 1 (the duplicated minority) and its skew —
one banner hash carrying millions of rows — is exactly the splittable
shape AQE skew-join handles (the duplicate_spans argument). The rebuild
joins one SMALL per-doc drop-position list back on id and filters the
paragraph array in place — an index-aware HOF over a per-row array, pure
Catalyst, no Python.

Reference scope note: the reference (vectrekker/main.py) has no curation
surface; this is a north-star training-pipeline addition alongside
operators/dedup.py and operators/spandedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARA_SEP = r"\n{2,}"
_ID = "__pd_id"
_DROPS = "__pd_drop_pos"


def _norm_key(para: Column) -> Column:
    """Normalized dedup key text: whitespace collapsed, trimmed, lowered."""
    return F.lower(F.trim(F.regexp_replace(para, r"\s+", " ")))


def duplicate_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 40,
    sep_pattern: str = _PARA_SEP,
) -> DataFrame:
    """(id, pos, para_hash) for every NON-canonical occurrence of a
    duplicated paragraph — the rows ``dedup_paragraphs`` strips. ``pos``
    is the 0-based index into ``split(text, sep_pattern)``; the canonical
    (kept) occurrence of each hash is the minimal ``(id, pos)``."""
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")
    paras = (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "para"),
        )
    )
    key = _norm_key(F.col("para"))
    keyed = paras.select(
        "id", "pos", F.md5(key).alias("para_hash")
    ).where(F.length(key) >= min_chars)
    # keeper per hash: an AGGREGATE, not a window — partial (map-side)
    # aggregation collapses hot-paragraph occurrences before the shuffle
    dups = (
        keyed.groupBy("para_hash")
        .agg(F.min(F.struct("id", "pos")).alias("keep"), F.count("*").alias("n_occ"))
        .where(F.col("n_occ") > F.lit(1))
    )
    return (
        keyed.join(dups, "para_hash")
        .where(
            (F.col("id") != F.col("keep.id")) | (F.col("pos") != F.col("keep.pos"))
        )
        .select("id", "pos", "para_hash")
    )


def paragraph_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 40,
    sep_pattern: str = _PARA_SEP,
) -> DataFrame:
    """Distinct ``para_hash`` column over the corpus's dedup-eligible
    paragraphs — the persisted-index unit for the incremental shape.
    Narrow: the text dies at the scan; one distinct shuffle of 32-char
    hashes (partial-agg collapsed map-side)."""
    paras = (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "para")
        )
    )
    key = _norm_key(F.col("para"))
    return (
        paras.select(F.md5(key).alias("para_hash"), F.length(key).alias("__n"))
        .where(F.col("__n") >= min_chars)
        .select("para_hash")
        .distinct()
    )


def dedup_paragraphs_against(
    new: DataFrame,
    history_hashes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 40,
    out_col: str = "text_dedup",
    sep_pattern: str = _PARA_SEP,
    join_sep: str = "\n\n",
) -> DataFrame:
    """Incremental paragraph dedup: strip from ``new`` every paragraph
    whose hash exists in ``history_hashes`` (a ``paragraph_hashes`` frame
    — history already holds the keeper) AND every within-batch
    non-canonical occurrence of a history-unseen hash. With ascending ids
    across batches (the streaming-funnel feed-order rule), accumulating
    batches is row-for-row ≡ one-shot ``dedup_paragraphs`` over the union
    — property-pinned in tests. Grow the index per batch by unioning
    ``paragraph_hashes(kept_batch)`` (appending the batch's OWN keeper
    hashes is what makes the next batch's join see them)."""
    if "para_hash" not in history_hashes.columns:
        raise ValueError(
            "history_hashes must carry a 'para_hash' column "
            "(build it with paragraph_hashes)"
        )
    hist = history_hashes.select("para_hash")
    paras = (
        new.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "para"),
        )
    )
    key = _norm_key(F.col("para"))
    keyed = paras.select(
        "id", "pos", F.md5(key).alias("para_hash")
    ).where(F.length(key) >= min_chars)
    # arm 1: history hit — the keeper lives in the corpus already
    hist_flag = keyed.join(hist, "para_hash", "left_semi")
    # arm 2: history-unseen hashes dedup within the batch (keeper = min)
    fresh = keyed.join(hist, "para_hash", "left_anti")
    fresh_dups = (
        fresh.groupBy("para_hash")
        .agg(F.min(F.struct("id", "pos")).alias("keep"), F.count("*").alias("n_occ"))
        .where(F.col("n_occ") > F.lit(1))
    )
    fresh_flag = (
        fresh.join(fresh_dups, "para_hash")
        .where(
            (F.col("id") != F.col("keep.id")) | (F.col("pos") != F.col("keep.pos"))
        )
        .select("id", "pos", "para_hash")
    )
    flagged = hist_flag.select("id", "pos", "para_hash").unionByName(fresh_flag)
    return dedup_paragraphs(
        new,
        id_col=id_col,
        text_col=text_col,
        min_chars=min_chars,
        out_col=out_col,
        flagged=flagged,
        sep_pattern=sep_pattern,
        join_sep=join_sep,
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 40,
    out_col: str = "text_dedup",
    flagged: DataFrame | None = None,
    sep_pattern: str = _PARA_SEP,
    join_sep: str = "\n\n",
) -> DataFrame:
    """All input columns + ``out_col`` (text with every non-canonical
    duplicated paragraph removed; untouched docs byte-identical) +
    ``paras_dropped`` (how many were stripped; 0 for untouched/NULL rows).

    Pass ``flagged`` (a ``duplicate_paragraphs`` result, possibly filtered
    by the caller) to reuse an already-computed flag set."""
    # ALL four names are reserved: the helper columns would hit an
    # ambiguous-reference error (or be silently dropped) mid-job, which
    # the run-START contract exists to prevent (review finding: the old
    # second conjunct made the helper checks dead code)
    for reserved in (out_col, "paras_dropped", _ID, _DROPS):
        if reserved in df.columns:
            raise ValueError(f"column {reserved!r} already exists on the input")
    if flagged is None:
        flagged = duplicate_paragraphs(
            df, id_col=id_col, text_col=text_col, min_chars=min_chars,
            sep_pattern=sep_pattern,
        )
    drops = flagged.groupBy(F.col("id").alias(_ID)).agg(
        F.collect_set("pos").alias(_DROPS)
    )
    joined = df.join(drops, on=F.col(id_col).eqNullSafe(F.col(_ID)), how="left")
    arr = F.split(F.col(text_col), sep_pattern)
    kept = F.filter(arr, lambda p, i: ~F.array_contains(F.col(_DROPS), i))
    out_text = (
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(F.col(_DROPS).isNull(), F.col(text_col))
        .otherwise(F.array_join(kept, join_sep))
    )
    # size(NULL) = -1, not NULL — branch explicitly (the profile.py rule)
    n_dropped = (
        F.when(F.col(_DROPS).isNull(), F.lit(0))
        .otherwise(F.size(F.col(_DROPS)))
        .cast("int")
    )
    return (
        joined.withColumn(out_col, out_text)
        .withColumn("paras_dropped", n_dropped)
        .drop(_ID, _DROPS)
    )


_LINE_SEP = r"\n"


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Line-level cross-document dedup (the RefinedWeb / MassiveText unit —
    nav items, "read more" links and footer lines repeat per LINE, not per
    blank-line block): ``dedup_paragraphs`` with the unit = single-newline
    split and a lossless ``'\\n'`` rebuild (splitting on one character is
    exactly reversible, so untouched docs are byte-identical by
    construction, not just by the no-flag branch). The default
    ``min_chars`` drops to 20 — lines are shorter than paragraphs, and the
    floor still protects naturally-repeating short lines ("Yes.", list
    bullets) from being stripped."""
    return dedup_paragraphs(
        df,
        id_col=id_col,
        text_col=text_col,
        min_chars=min_chars,
        out_col=out_col,
        sep_pattern=_LINE_SEP,
        join_sep="\n",
    )


def duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
) -> DataFrame:
    """``duplicate_paragraphs`` at the line unit (see ``dedup_lines``)."""
    return duplicate_paragraphs(
        df,
        id_col=id_col,
        text_col=text_col,
        min_chars=min_chars,
        sep_pattern=_LINE_SEP,
    )
