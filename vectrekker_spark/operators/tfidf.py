"""Corpus-level term weighting (TF-IDF family) for vocabulary building and
keyword extraction in training-data pipelines.

Shape at scale: one explode of whitespace tokens (narrow (doc_id, term)
stream — the raw text never shuffles), one partial-aggregating groupBy on
term for (total_tf, df), and a broadcast of the single-row corpus-size
aggregate. No collects, no second scan of the text.

Determinism note (why sqrt and not log): the idf damping uses
`sqrt(n_docs / df)` instead of the textbook `ln(n_docs / df)`. sqrt is
IEEE-754 correctly-rounded in every engine, so Spark (JVM Math.sqrt) and the
DuckDB oracle produce bit-identical doubles; `ln` is only ~1-ulp across libms
(JVM intrinsic vs glibc), which breaks hash-equality at rounding boundaries.
The ranking behavior (rare terms up-weighted, monotone in 1/df) is the same.
Both factors of the score are exact: total_tf is an integer and the division
+ sqrt + multiply are single IEEE ops.

Reference scope note: no term-weighting exists in the reference
(vectrekker/main.py); north-star training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import tokens


def term_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(term, df, total_tf, tfidf) per distinct lowercased whitespace token.

    tfidf = total_tf * sqrt(n_docs / df) — corpus-summed TF with sqrt-damped
    inverse document frequency (see module docstring for why sqrt).
    """
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("total_tf"),
        F.countDistinct(id_col).alias("df"),
    )
    if min_df > 1:
        tf = tf.filter(F.col("df") >= min_df)
    n = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    return tf.crossJoin(F.broadcast(n)).select(
        "term",
        "df",
        "total_tf",
        F.round(
            F.col("total_tf")
            * F.sqrt(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )


def top_terms(docs: DataFrame, k: int = 100, **kw) -> DataFrame:
    """Top-k corpus terms by tfidf (ties broken by term for determinism)."""
    return term_scores(docs, **kw).orderBy(
        F.desc("tfidf"), F.asc("term")
    ).limit(k)
