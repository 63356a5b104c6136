"""Span-level exact substring deduplication: find and strip token spans that
occur more than once ACROSS the corpus (or within a document), keeping one
canonical occurrence.

Document-level dedup (exact md5, MinHash-LSH, SimHash — operators/dedup.py)
removes whole near-identical documents; this operator targets the other
well-documented contamination shape: boilerplate paragraphs, license
headers, and quoted passages repeated inside otherwise-distinct documents
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better", which removes duplicate substrings ≥50 tokens with a suffix
array). A suffix array is not a Spark-shaped structure; the Spark-first
equivalent used here seeds on fixed-length token n-grams:

1. every n-token gram occurrence becomes a narrow (id, pos, md5(gram)) row
   (the text column never shuffles). Gram hashing is a per-doc Arrow
   kernel (mapInPandas), the same choice the winnowing fingerprinter
   made and for the same measured reason: the pure-Catalyst gram chain
   (functions/text._gram_chain) is 9 interpreted zip_with passes at
   n=10 and benched 1.74 s vs the kernel's 0.55 s on the sf0.1 corpus;
   `_gram_occurrences_expr` keeps the expression form as the
   tested-identical cross-check (md5 over the identical gram strings);
2. the corpus-canonical occurrence of each duplicated gram is the minimal
   (id, pos), computed as ``groupBy(gram).agg(min(struct(id, pos)))`` — an
   aggregation, NOT a window over gram partitions, deliberately: partial
   (map-side) aggregation collapses a hot gram's millions of occurrences
   before the shuffle, and the residual skew on the probe side of the
   flag join is splittable by AQE's skew handling, where a window sort
   over the hot gram's partition could not be split;
3. every non-canonical occurrence is flagged, and per document the flagged
   gram-start positions are merged into maximal spans (gap-and-islands
   over positions, gap ≤ n-1 ⇒ the covered token ranges overlap/touch);
   a flagged-start run [s..t] covers tokens [s .. t+n-1];
4. ``strip_duplicate_spans`` rebuilds the text keeping only uncovered
   tokens (index-aware F.filter — an interpreted HOF, but per-row over
   the token array with a per-doc span list that is small by
   construction; the strip itself is pure Catalyst).

The gram stream feeds two consumers (the canonical-occurrence aggregate
and the flag join), so ``duplicate_spans`` persists it by default
(``cache_intermediate=True``) and hands the cache out on the result as
``_cached_grams`` — long-lived drivers call ``release()`` once the spans
are consumed, the same lifecycle idiom as operators/tfidf.bm25_scores.

Semantics (documented contract, mirrored by the tests' independent
brute-force oracle):

- detection is case-insensitive over whitespace tokens (grams are built
  from lowercased text); the stripped output preserves the ORIGINAL case
  of kept tokens but is whitespace-normalized (single-space joined);
- an n-gram occurrence is redundant iff it is not the corpus-minimal
  (id, pos) occurrence of that gram, so the first document (by id) keeps
  its copy and self-repetition within one document is caught too;
- n is the minimum duplicate length detectable; ``min_tokens`` (default
  n) additionally drops merged spans shorter than the threshold;
- a document with fewer than n tokens yields no grams and is never
  flagged; NULL text passes through (NULL cleaned text); a document that
  is entirely duplicated strips to the empty string.

Like all seed-gram span dedup, removal can join text across a stripped
region, creating token adjacencies that did not exist in the original —
acceptable for training-data curation (the join point is a document the
pipeline already decided to mutate), stated here for honesty.

Reference scope note: no span-level dedup exists in the reference
(vectrekker/main.py); north-star training-pipeline addition alongside
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import tokens, word_grams


def _gram_occurrences(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gh): every n-gram occurrence, gram hashed to 32 hex chars
    (md5 — 128 bits, so a hash collision silently merging two distinct
    grams stays negligible even at 100 TB gram counts; a 64-bit key would
    see millions of expected collisions there) so the shuffled rows stay
    narrow regardless of n. Arrow kernel — see the module docstring for
    the measured rationale; emits exactly the values of
    ``_gram_occurrences_expr`` (tested)."""
    import hashlib

    import pandas as pd

    # java_tokens, NOT str.split(): a doc with U+00A0/U+2028/U+3000
    # (common in scraped web text) would otherwise tokenize differently
    # here than in strip_duplicate_spans' tokens() indexing, stripping
    # the WRONG positions (see functions/pytokens docstring).
    from vectrekker_spark.functions.pytokens import java_tokens

    def gen(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if not t:
                    continue
                tk = [w.encode("utf-8") for w in java_tokens(t.lower())]
                m = len(tk) - n + 1
                for p in range(m if m > 0 else 0):
                    ids.append(i)
                    poss.append(p)
                    hs.append(hashlib.md5(b" ".join(tk[p : p + n])).hexdigest())
            yield pd.DataFrame({id_col: ids, "pos": poss, "gh": hs})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, pos int, gh string"
    )


def _gram_occurrences_expr(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Pure-Catalyst twin of ``_gram_occurrences`` (functions/text.word_grams
    + F.md5). Value-identical by construction and by test; kept as the
    cross-check for the kernel's tokenize/join/hash semantics."""
    return df.select(
        F.col(id_col),
        F.posexplode(word_grams(F.col(text_col), n)).alias("pos", "gram"),
    ).select(F.col(id_col), "pos", F.md5("gram").alias("gh"))


def duplicate_spans(
    df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int | None = None,
    cache_intermediate: bool = True,
) -> DataFrame:
    """(id, span_start, span_end, span_tokens) for every maximal redundant
    span — 0-based inclusive token positions in the whitespace
    tokenization of the document. See the module docstring for the
    precise redundancy contract and the ``_cached_grams``/``release``
    cache lifecycle.
    """
    if n < 2:
        raise ValueError(f"duplicate_spans: n must be >= 2, got {n}")
    min_tokens = n if min_tokens is None else min_tokens

    g = _gram_occurrences(df, n, id_col, text_col)
    if cache_intermediate:
        g = g.persist()
    # Canonical occurrence per duplicated gram: min (id, pos), as a
    # partial-aggregating groupBy (skew-tolerant — module docstring §2).
    # struct comparison is lexicographic over (id, pos), exactly the
    # "first document, then first position" contract.
    dup = (
        g.groupBy("gh")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") > 1)
        .select("gh", "first")
    )
    flagged = (
        g.join(dup, "gh")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"first.{id_col}"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .select(F.col(id_col), "pos")
    )

    # Gap-and-islands per document over the flagged gram-start positions:
    # starts s and t with t - s <= n-1 cover overlapping/adjacent token
    # ranges and merge into one span. Per-doc windows shuffle only the
    # flagged rows (narrow, duplicate-proportional).
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        flagged.withColumn(
            "brk",
            F.when(
                F.col("pos") - F.lag("pos").over(w) <= n - 1, F.lit(0)
            ).otherwise(F.lit(1)),  # lag NULL (first row) → new island
        )
        .withColumn(
            "isl",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    out = (
        isl.groupBy(id_col, "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
        .withColumn(
            "span_tokens", F.col("span_end") - F.col("span_start") + 1
        )
        .filter(F.col("span_tokens") >= min_tokens)
        .select(id_col, "span_start", "span_end", "span_tokens")
    )
    out._cached_grams = g if cache_intermediate else None
    return out


def release(result: DataFrame) -> None:
    """Unpersist the cached gram stream a ``duplicate_spans`` result holds
    (no-op on DataFrames with nothing tracked — the tfidf/knn idiom)."""
    cached = getattr(result, "_cached_grams", None)
    if cached is not None:
        cached.unpersist()


def strip_duplicate_spans(
    df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int | None = None,
    out_col: str = "text_clean",
    spans: DataFrame | None = None,
) -> DataFrame:
    """All input columns + ``out_col``: the text with every redundant span
    removed (kept tokens in original case, single-space joined — see the
    module docstring for the normalization contract). Documents without
    redundant spans still get whitespace-normalized output, so the column
    is uniformly "the post-dedup training text".

    Pass ``spans=`` (a ``duplicate_spans`` result, e.g. one already
    collected for an audit report) to strip against it directly instead
    of re-deriving the gram stream; n/min_tokens are ignored for
    detection then (the caller owns consistency and the cache release).
    """
    derived_here = spans is None
    if derived_here:
        spans = duplicate_spans(
            df, n=n, id_col=id_col, text_col=text_col, min_tokens=min_tokens
        )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    tok = tokens(F.col(text_col))
    covered = lambda t, i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
    )
    kept = F.when(F.col("__spans").isNull(), tok).otherwise(
        F.filter(tok, lambda t, i: ~covered(t, i))
    )
    clean = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat_ws(" ", kept))
    out = (
        df.join(per_doc, id_col, "left")
        .withColumn(out_col, clean)
        .drop("__spans")
    )
    # thread the gram cache through so release(strip_result) works when the
    # spans were derived here; a caller-passed spans frame keeps ownership
    # of its own cache (None here — the caller releases)
    out._cached_grams = (
        getattr(spans, "_cached_grams", None) if derived_here else None
    )
    return out
