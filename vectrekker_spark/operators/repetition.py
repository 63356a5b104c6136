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

from vectrekker_spark.functions.text import dup_line_fraction


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
    a DuckDB oracle running the same ops agrees bit-for-bit (see d23).

    Contract: ids must be unique (one row per document — the same PRIMARY
    KEY contract ``bm25_scores_pivot`` documents). Since the r14 kernel
    rewrite the metrics are computed per ROW; duplicate ids yield one
    output row per input row, where the pre-r14 groupBy(id) shape merged
    their gram counts (advisor r14)."""
    if top_k == dup_k:
        raise ValueError("top_k and dup_k must differ (single-pass kernel)")
    top_name = f"top{top_k}gram_frac"
    dup_name = f"dup{dup_k}gram_frac"

    # r14 optimization (guide §2.3/§2.4 + §4.2): every metric here is
    # PER-DOCUMENT — no gram ever needs to cross documents — so the old
    # explode → groupBy(id, k, gram) → per-doc re-aggregate shape shuffled
    # a narrow but corpus-tokens-sized (id, k, gram-STRING) stream twice
    # for state that is row-local. The gram counting now runs as one Arrow
    # kernel per row (java_tokens twin of tokens(), identical k-gram joins,
    # a Counter per family), emitting exact INTEGER counts; the fractions
    # below are the same Spark cast/divide/round expressions as before, so
    # every double is bit-identical to the exploded form (property-pinned
    # in tests/test_repetition.py). Plan: scan → MapInPandas, ZERO
    # shuffles (was 2 gram-stream exchanges); the line metric stays the
    # pure-Catalyst expression, computed before the kernel and passed
    # through. Per-task memory is bounded by one document's distinct
    # grams. sf0.1 bench row (d23): 1.58 → 1.26 s (ratio vs DuckDB
    # 0.27 → 0.22; single-session A/B measured down to ~0.5 s on quiet
    # windows — this box's absolute seconds swing ±20-40%).
    import pandas as pd

    from vectrekker_spark.functions.pytokens import java_tokens

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            tts, ttls, dds, dtls = [], [], [], []
            for text in pdf[text_col]:
                toks = java_tokens((text or "").lower())
                n = len(toks)
                g_top = (
                    Counter(
                        " ".join(toks[i : i + top_k]) for i in range(n - top_k + 1)
                    )
                    if n >= top_k
                    else None
                )
                g_dup = (
                    Counter(
                        " ".join(toks[i : i + dup_k]) for i in range(n - dup_k + 1)
                    )
                    if n >= dup_k
                    else None
                )
                tts.append(max(g_top.values()) if g_top else 0)
                ttls.append(sum(g_top.values()) if g_top else 0)
                dds.append(
                    sum(v for v in g_dup.values() if v >= 2) if g_dup else 0
                )
                dtls.append(sum(g_dup.values()) if g_dup else 0)
            out = pdf[[c for c in pdf.columns if c != text_col]].copy()
            out["__top_top"] = pd.array(tts, dtype="int64")
            out["__top_total"] = pd.array(ttls, dtype="int64")
            out["__dup_dup"] = pd.array(dds, dtype="int64")
            out["__dup_total"] = pd.array(dtls, dtype="int64")
            yield out

    id_t = dict(df.dtypes)[id_col]
    staged = df.select(
        F.col(id_col),
        dup_line_fraction(text_col).alias("dup_line_frac"),
        F.col(text_col),
    )
    wide = staged.mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, dup_line_frac double, __top_top long, "
            "__top_total long, __dup_dup long, __dup_total long"
        ),
    )
    # gram-less docs carry 0 counts; 0.0/0 divides to NULL (non-ANSI), so
    # the same coalesce restores the exploded form's 0.0
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
