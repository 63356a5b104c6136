"""N-gram language-model perplexity filtering — the CCNet/KenLM-shaped
curation stage (SURVEY.md §2.2 C17): score documents by how "language-like"
they are under a small LM trained on a reference corpus (e.g. Wikipedia),
drop the high-perplexity tail.

Public recipe: CCNet (Wenzek et al. 2019) filters Common Crawl by KenLM
perplexity; RedPajama/FineWeb carry the same stage. A full KenLM is out of
scope for a dependency-free engine; the model here is a bounded
bigram + unigram table with STUPID BACKOFF (Brants et al. 2007, "Large
Language Models in Machine Translation") — the scheme designed exactly for
web-scale corpora because it needs no discounting pass, only counts:

    s(w2 | w1) = count(w1 w2) / count(w1)        if the bigram is kept
               = 0.4 * p(w2)                     else if w2 in vocab
               = 0.4 * p_oov                     else

    doc score  = cross-entropy H = -mean log2 s over the doc's token
    transitions (+ the first token scored by its unigram); ppl = 2^H.

Scale shape (train-distributed, apply-narrow):
- FIT: two count aggregations over the reference corpus — unigrams
  (explode + groupBy(token), map-side partial agg) and bigrams (adjacent
  pairs built per row with JVM array functions — no self-join, no
  positional shuffle — then one groupBy(w1, w2)). The DRIVER collects only
  the top-``vocab_size`` / top-``max_bigrams`` rows (explicit caps with
  deterministic count-desc, token-asc tie-breaks), never the full
  distribution.
- APPLY: the capped model (a few MB) broadcasts; scoring the 100 TB
  corpus is ONE zero-shuffle Arrow map (plan-asserted in tests).
  Tokenization is functions/pytokens.java_words — the exact executor twin
  of the engine's JVM tokens() family, so fit and apply can never split
  differently.

Reference scope note: the reference (vectrekker/main.py) has no quality or
filtering surface; north-star training-pipeline addition.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import tokens

_LOG2 = math.log(2.0)
_BACKOFF = 0.4  # stupid backoff's published constant


@dataclass(frozen=True)
class NgramLM:
    """Bounded bigram LM with stupid backoff.

    - ``unigram_logp``: token → log2 p(token) over the reference corpus
      (counts / total tokens, full-corpus total — the cap drops rare
      tokens from the TABLE, not from the denominator).
    - ``cond_logp``: (w1, w2) → log2 (count(w1 w2) / count(w1)).
    - ``oov_logp``: log2 (1 / total_tokens) — one pseudo-occurrence for a
      token outside the vocab. The 0.4 stupid-backoff factor is NOT folded
      in here: logp_next applies it to every backed-off transition, while
      logp_first scores an OOV first token by this value alone.
    """

    unigram_logp: dict
    cond_logp: dict
    oov_logp: float
    total_tokens: int

    def logp_first(self, w: str) -> float:
        lp = self.unigram_logp.get(w)
        return lp if lp is not None else self.oov_logp

    def logp_next(self, w1: str, w2: str) -> float:
        lp = self.cond_logp.get((w1, w2))
        if lp is not None:
            return lp
        lp = self.unigram_logp.get(w2)
        if lp is not None:
            return lp + math.log2(_BACKOFF)
        return self.oov_logp + math.log2(_BACKOFF)


def fit_ngram_lm(
    ref: DataFrame,
    text_col: str = "text",
    vocab_size: int = 65_536,
    max_bigrams: int = 500_000,
) -> NgramLM:
    """Fit the bounded LM on a reference corpus. Two aggregations, both
    map-side-combinable; the driver holds only the capped tables (the
    collect guards ARE vocab_size/max_bigrams — deterministic top-K with
    (count desc, token asc) tie-breaks, layout-invariant)."""
    if vocab_size < 1 or max_bigrams < 0:
        raise ValueError("fit_ngram_lm: vocab_size >= 1 and max_bigrams >= 0")
    words = F.filter(tokens(F.col(text_col)), lambda x: x != "")
    # persisted: the tokenized corpus feeds the unigram AND bigram passes,
    # and the grouped unigram table feeds the total agg AND the top-K
    # collect — uncached, the dominant tokenize/explode/aggregate work
    # would run twice (unigrams) plus a third corpus tokenize (bigrams)
    toks = ref.where(F.col(text_col).isNotNull()).select(words.alias("w")).persist()
    uni = toks.select(F.explode("w").alias("t")).groupBy("t").count().persist()
    try:
        total = int(uni.agg(F.sum("count")).first()[0] or 0)
        if total == 0:
            raise ValueError("fit_ngram_lm: reference corpus has no tokens")
        # toPandas, not collect: the capped tables are the two big driver
        # transfers here and collect() builds row-path pickled Row objects;
        # the Arrow path moves the same data as columnar batches (guide §6
        # — measured 20.5 → ~13 s on the sf1 LM fit). Values identical.
        top_uni = uni.orderBy(F.col("count").desc(), F.col("t").asc()).limit(
            vocab_size
        ).toPandas()
        counts = {
            t: int(c) for t, c in zip(top_uni["t"], top_uni["count"])
        }
        unigram_logp = {t: math.log2(c / total) for t, c in counts.items()}

        cond_logp: dict = {}
        if max_bigrams:
            # adjacent pairs per row via array functions: slice+zip, no
            # positional self-join — the pair stream shuffles only as the
            # (w1, w2) partial-aggregated counts
            pairs = toks.where(F.size("w") >= 2).select(
                F.explode(
                    F.arrays_zip(
                        F.slice("w", 1, F.size("w") - 1).alias("w1"),
                        F.slice("w", 2, F.size("w") - 1).alias("w2"),
                    )
                ).alias("p")
            ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            # conditionals need count(w1), so only vocab-headed bigrams may
            # enter the capped table — pruned BEFORE the limit via a
            # broadcast semi-join on the collected vocab (never a
            # 65k-literal isin expression: giant literal lists blow up the
            # expression tree, the F.lit(list) lesson), so out-of-vocab
            # heads can't waste capped slots
            import pandas as pd

            # Arrow-backed local relation (the d17 idiom): a tuple-list
            # createDataFrame pays per-element Python→JVM conversion
            # explicit schema: correctness must not rest on pandas
            # object-dtype inference (advisor r14)
            vocab_df = ref.sparkSession.createDataFrame(
                pd.DataFrame({"w1": list(counts)}), "w1 string"
            )
            top_bi = (
                pairs.groupBy("w1", "w2")
                .count()
                .join(F.broadcast(vocab_df), "w1", "left_semi")
                .orderBy(
                    F.col("count").desc(), F.col("w1").asc(), F.col("w2").asc()
                )
                .limit(max_bigrams)
                .toPandas()
            )
            for w1, w2, c in zip(
                top_bi["w1"], top_bi["w2"], top_bi["count"]
            ):
                cond_logp[(w1, w2)] = math.log2(int(c) / counts[w1])
    finally:
        uni.unpersist()
        toks.unpersist()
    return NgramLM(
        unigram_logp=unigram_logp,
        cond_logp=cond_logp,
        oov_logp=math.log2(1.0 / total),
        total_tokens=total,
    )


def perplexity_py(text, lm: NgramLM):
    """Python reference scorer (shared by the Arrow kernel and the test
    oracle): 2^(-mean log2 s) over first-token unigram + transitions.
    None for NULL text and for token-less text (no evidence)."""
    from vectrekker_spark.functions.pytokens import java_words

    if text is None:
        return None
    ws = java_words(text)
    if not ws:
        return None
    lp = lm.logp_first(ws[0])
    for a, b in zip(ws, ws[1:]):
        lp += lm.logp_next(a, b)
    h = -lp / len(ws)
    return float(round(2.0 ** h, 6))


def score_perplexity(
    df: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    out_col: str = "perplexity",
) -> DataFrame:
    """All input columns + ``out_col`` = stupid-backoff perplexity,
    round(6). NULL/token-less text scores NULL. One zero-shuffle Arrow
    map; the model rides a Spark broadcast."""
    if out_col in df.columns:
        raise ValueError(f"score_perplexity: column {out_col!r} already exists")
    bc = df.sparkSession.sparkContext.broadcast(lm)
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [perplexity_py(t, model) for t in pdf[text_col]],
                index=pdf.index,
                dtype=object,
            )
            yield pdf

    return df.mapInPandas(gen, schema=f"{fields}, `{out_col}` double")


def perplexity_filter(
    df: DataFrame,
    lm: NgramLM,
    max_ppl: float,
    text_col: str = "text",
) -> DataFrame:
    """Rows whose perplexity is at/below ``max_ppl`` (the CCNet keep rule:
    low perplexity = reference-like text). NULL/token-less rows drop —
    no evidence of language is not evidence of language."""
    scored = score_perplexity(df, lm, text_col=text_col)
    return scored.where(F.col("perplexity") <= float(max_ppl)).drop("perplexity")


def lm_save(lm: NgramLM, path: str) -> None:
    """Persist the model as two parquet tables + a meta commit marker
    (written LAST — a torn save fails loudly at load, the bloom_save
    contract)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("lm_save: no active SparkSession")
    os.makedirs(path, exist_ok=True)
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        os.remove(meta_path)  # un-commit first: overwrite crashes read as torn
    spark.createDataFrame(
        [(t, lp) for t, lp in lm.unigram_logp.items()], "t string, logp double"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "unigrams"))
    spark.createDataFrame(
        [(w1, w2, lp) for (w1, w2), lp in lm.cond_logp.items()] or [],
        "w1 string, w2 string, logp double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "bigrams"))
    with open(meta_path, "w") as f:
        json.dump(
            {"oov_logp": lm.oov_logp, "total_tokens": lm.total_tokens,
             "backoff": _BACKOFF, "version": 1},
            f,
        )


def lm_load(spark: SparkSession, path: str) -> NgramLM:
    """Load an lm_save directory; a missing meta marker (torn save) raises."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"lm_load: {path!r} has no meta.json — not an lm_save directory "
            "or a torn save; refit with fit_ngram_lm"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    uni = {
        r["t"]: r["logp"]
        for r in spark.read.parquet(os.path.join(path, "unigrams")).collect()
    }
    bi = {
        (r["w1"], r["w2"]): r["logp"]
        for r in spark.read.parquet(os.path.join(path, "bigrams")).collect()
    }
    return NgramLM(
        unigram_logp=uni,
        cond_logp=bi,
        oov_logp=float(meta["oov_logp"]),
        total_tokens=int(meta["total_tokens"]),
    )
