"""Repetition-based quality filtering (Gopher-style rules) for training-data
curation: documents dominated by repeated lines or repeated word n-grams are
boilerplate/spam far more often than prose, and dropping them is one of the
highest-leverage quality gates in an LLM data pipeline.

Three metrics per document:
- ``dup_line_frac``   — fraction of '\\n'-lines that repeat an earlier line
  (pure Catalyst expression, no shuffle).
- ``top{k}gram_frac`` — share of word k-grams taken by the single most
  frequent k-gram (default k=2): catches "buy now buy now buy now".
- ``dup{k}gram_frac`` — share of word k-grams that occur more than once
  (default k=3): catches templated/looping text with several phrases.

Scale shape (the 100 TB story):
- ONE text scan total: the line metric (split + array_distinct + size — a
  pure row expression) rides the gram stream as a functionally-dependent
  group key, so there is no second scan and no join to attach it.
- The n-gram metrics explode to a narrow (doc_id, k, gram) stream — the raw
  text dies at the scan — with BOTH k-streams produced by a single pass
  (one generator over a concat of tagged structs, not two scans/unions),
  plus one sentinel row per document so empty/gram-less docs reach the
  final aggregate without a zero-fill join (the bm25_scores pattern).
- Count→fraction is two partial-aggregating groupBys: (doc, k, gram) counts,
  then ONE conditional aggregate per doc for both k-families (not one
  groupBy per family) — map-side combine collapses each doc's grams before
  the shuffle, so shuffle volume is O(distinct grams per doc). No driver
  state, no collects, no joins.

Thresholded dropping (``filter_repetitive``) anti-joins the flagged ids back
— the same set-oriented pattern as operators/decontaminate.py.

Reference scope note: the reference (vectrekker/main.py) has no quality
filtering; north-star training-pipeline addition. Default thresholds follow
the published Gopher rules (dup-line 0.30, top-2-gram 0.20) with a looser
dup-3-gram bound since short n-grams repeat naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import dup_line_fraction, word_grams


def repetition_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 2,
    dup_k: int = 3,
) -> DataFrame:
    """Per-doc repetition metrics: (id, dup_line_frac, top{top_k}gram_frac,
    dup{dup_k}gram_frac), all in [0,1], 0.0 when the doc has no k-grams.
    All ratios are single IEEE double divisions of exact integer counts, so
    a DuckDB oracle running the same ops agrees bit-for-bit (see d23)."""
    if top_k == dup_k:
        raise ValueError("top_k and dup_k must differ (tagged single-pass stream)")
    top_name = f"top{top_k}gram_frac"
    dup_name = f"dup{dup_k}gram_frac"

    def tagged(k: int):
        return F.transform(
            word_grams(text_col, k),
            lambda s: F.struct(F.lit(k).alias("k"), s.alias("gram")),
        )

    # one sentinel (k=0) row per doc: every document — empty, gram-less, or
    # NULL text (where concat of the gram arrays is NULL) — reaches the
    # final aggregate, so no zero-fill join is needed; dup_line_frac rides
    # the group keys (functionally dependent on the id) so the line metric
    # costs no second scan and no join
    sentinel = F.array(F.struct(F.lit(0).alias("k"), F.lit("").alias("gram")))
    stream = F.coalesce(F.concat(tagged(top_k), tagged(dup_k), sentinel), sentinel)
    g = df.select(
        F.col(id_col),
        dup_line_fraction(text_col).alias("dup_line_frac"),
        F.explode(stream).alias("kg"),
    ).select(
        id_col, "dup_line_frac", F.col("kg.k").alias("k"), F.col("kg.gram").alias("gram")
    )
    counts = g.groupBy(id_col, "dup_line_frac", "k", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_top, is_dup = F.col("k") == top_k, F.col("k") == dup_k
    wide = counts.groupBy(id_col, "dup_line_frac").agg(
        F.max(F.when(is_top, F.col("cnt"))).alias("__top_top"),
        F.sum(F.when(is_top, F.col("cnt"))).alias("__top_total"),
        F.sum(F.when(is_dup & (F.col("cnt") >= 2), F.col("cnt")).otherwise(0)).alias(
            "__dup_dup"
        ),
        F.sum(F.when(is_dup, F.col("cnt"))).alias("__dup_total"),
    )
    return wide.select(
        id_col,
        "dup_line_frac",
        F.coalesce(
            F.round(F.col("__top_top").cast("double") / F.col("__top_total"), 6),
            F.lit(0.0),
        ).alias(top_name),
        F.coalesce(
            F.round(F.col("__dup_dup").cast("double") / F.col("__dup_total"), 6),
            F.lit(0.0),
        ).alias(dup_name),
    )


def filter_repetitive(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_top2gram_frac: float = 0.20,
    max_dup3gram_frac: float = 0.60,
) -> DataFrame:
    """Drop docs breaching any repetition threshold (Gopher-style gate).
    Set a threshold to None to skip that rule."""
    rep = repetition_report(df, id_col, text_col)
    cond = F.lit(False)
    if max_dup_line_frac is not None:
        cond = cond | (F.col("dup_line_frac") > max_dup_line_frac)
    if max_top2gram_frac is not None:
        cond = cond | (F.col("top2gram_frac") > max_top2gram_frac)
    if max_dup3gram_frac is not None:
        cond = cond | (F.col("dup3gram_frac") > max_dup3gram_frac)
    bad = rep.filter(cond).select(id_col)
    return df.join(bad, id_col, "left_anti")
