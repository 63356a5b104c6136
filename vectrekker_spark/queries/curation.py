"""Training-data curation queries d18–d21 (north-star pipeline surface):
deterministic train/val/test splitting, benchmark decontamination, TF-IDF
term weighting, and PII redaction. The reference (vectrekker/main.py) has no
curation surface at all — these are the operations a 100 TB pretraining
pipeline runs between raw scrape and tokenizer, each expressed as narrow
scans + one aggregation so they survive cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectrekker_spark.functions import text as T
from vectrekker_spark.operators.decontaminate import (
    contamination_report_dedup_first,
)
from vectrekker_spark.operators.split import hash_split, split_case_sql
from vectrekker_spark.operators.tfidf import top_terms
from vectrekker_spark.queries import QuerySpec
from vectrekker_spark.queries.util import (
    ordered,
    tb1,
    tbp,
    token_hash_sql,
    tokens_sql,
)

LTOKS = tokens_sql("lower(text)")


def d18_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    # Salted-hash split assignment (operators/split.py) + per-split stats.
    # The assignment itself is a pure narrow map — the only shuffle here is
    # the 3-group rollup for the check.
    d = tbp(spark, sf, "documents")
    s = hash_split(d, "doc_id")
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


D18_SQL = f"""
WITH s AS (
  SELECT doc_id, lang, n_chars, {split_case_sql('doc_id')} AS split
  FROM documents)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM s GROUP BY split ORDER BY split
"""


def d19_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    # Word-3-gram shingle-hash overlap between a synthetic "benchmark" slice
    # (doc_id % 20 == 0) and the rest of the corpus as training side.
    # Registered scale policy (r12 verdict #1): the DEDUP-FIRST composition
    # — identical output by construction (exact dup ⇒ identical shingle
    # set ⇒ identical report row), but the shingle join runs at
    # distinct-text scale, so the R²-in-duplication shuffle blowup that
    # hit the sf30 disk wall (SCALE.md: FAIL → 9.4 s) collapses to 1×.
    # Same oracle SQL: semantics are unchanged, only the plan shape is —
    # which is why the single-small-file regime may take the plain join
    # (the standard small_local plan gate: the rep-mapping passes are a
    # ~0.7 s scheduling floor at toy scale and free at cluster scale;
    # scale_validation exercises the dedup-first plan on every multi-split
    # layout, where the gate disengages).
    from vectrekker_spark.operators.decontaminate import contamination_report
    from vectrekker_spark.queries.util import small_local

    d = tbp(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    train = d.filter(F.col("doc_id") % 20 != 0)
    fn = (
        contamination_report
        if small_local(sf, "documents")
        else contamination_report_dedup_first
    )
    return ordered(fn(train, bench), "train_id")


_SHINGLES = (
    f"list_distinct(list_transform(generate_series(0, greatest(len({LTOKS}) - 3, 0)), "
    f"i -> array_to_string(({LTOKS})[i+1:i+3], ' ')))"
)
D19_SQL = f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform({_SHINGLES}, s -> {token_hash_sql('s')}))
           AS shingle_hash
  FROM documents),
t AS (SELECT doc_id AS train_id, shingle_hash FROM sh WHERE doc_id % 20 <> 0),
b AS (SELECT doc_id AS bench_id, shingle_hash FROM sh WHERE doc_id % 20 = 0)
SELECT train_id, COUNT(DISTINCT t.shingle_hash) AS n_shared_shingles,
       COUNT(DISTINCT bench_id) AS n_bench_docs
FROM t JOIN b USING (shingle_hash)
GROUP BY train_id ORDER BY train_id
"""


def d27_bloom_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """C13 as a driver-oracle row (VERDICT r10 #6 — it was pytest-verified
    but invisible to CORRECTNESS_r*.json; slot freed by merging
    d16_map_fns into d12_bpe_tokens): the ZERO-SHUFFLE bloom
    decontamination path. A benchmark bloom is built over the bench
    slice's distinct word-3-gram shingles with FIXED geometry
    (m_bits=2^16, k=4 — explicit so sizing runs no count job and the
    oracle can reconstruct the identical bitmap), then every train doc's
    shingle array is probed in one narrow Arrow map (no join, no explode
    shuffle — array_hit_counts). Output: per-doc maybe-hit count + the
    keep decision at max_shared=2. Everything is md5-prefix integer math,
    so the DuckDB oracle matches bit-exactly — including the false
    positives, which are a deterministic property of the hash family, not
    noise. Contrast with d19_decontaminate, the EXACT join form of the
    same gate."""
    from vectrekker_spark.operators.bloom import bloom_build, shingle_hit_counts
    from vectrekker_spark.queries.util import small_local, tb

    # r14 optimization (guide §2.3 — shuffle fewer bytes): the bench side is
    # 5% of the corpus, so filter BEFORE any pre-spread — the old
    # tbp-then-filter shape round-robin-shuffled 100% of the text column to
    # keep 5% of it (measured 0.62 → 0.35 s on the build at sf0.1). The
    # small spread (8) parallelizes the shingle explode of the one-file
    # fixture; at scale the scan splits naturally and the gate is off.
    bench = tb(spark, sf, "documents").filter(F.col("doc_id") % 20 == 0)
    if small_local(sf, "documents"):
        bench = bench.repartition(8)
    # direct bloom_build, not benchmark_bloom: that wrapper's `k` is the
    # SHINGLE k (3, the default we want), and the bloom's own hash count
    # must ALSO be pinned (k=4) or sizing auto-picks one the oracle can't
    # know — the two k's collide in the wrapper's signature
    # no .distinct() on the shingle stream: insertion is idempotent (bit_or)
    # and FIXED geometry means no sizing count — the distinct was a full
    # shuffle of the shingle set that only dedup'd what the bitmap dedups
    # for free (r12: the build dominated d27's toy-scale ratio, VERDICT #4)
    sh = bench.select(F.explode(T.word_shingles("text")).alias("__sh"))
    bf = bloom_build(sh, "__sh", m_bits=1 << 16, k=4)
    # parts=8 (r15): the fused probe kernel over ~9.5k fixture docs was
    # 32-way task overhead — A/B 1.12 → 1.06 s (small but consistent),
    # byte-equal.
    train = tbp(spark, sf, "documents", parts=8).filter(F.col("doc_id") % 20 != 0)
    # fused shingle+probe kernel (r14): only the text crosses Arrow, the
    # shingle arrays never materialize as a column, per-shingle probe
    # results memoize per task — 0.76 → 0.55 s on the probe at sf0.1 and
    # bit-identical (see shingle_hit_counts docstring + tests/test_bloom.py)
    hits = shingle_hit_counts(train, "text", bf, id_cols=["doc_id"], out_col="n_hits")
    return ordered(
        hits.select(
            "doc_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") <= 2).alias("kept"),
        ),
        "doc_id",
    )


# the bitmap build + probe in ANSI SQL: same md5-prefix double-hash family
# as operators/bloom.py (proven bit-for-bit in tests/test_bloom.py), same
# word-3-gram shingles as D19 plus word_shingles' short-text rule (fewer
# than 3 tokens -> the single all-token join; NULL text -> [''])
_SHINGLES_FULL = (
    f"CASE WHEN len({LTOKS}) >= 3 THEN {{inner}} "
    f"ELSE [coalesce(array_to_string({LTOKS}, ' '), '')] END"
).format(
    inner=(
        f"list_distinct(list_transform(generate_series(0, len({LTOKS}) - 3), "
        f"i -> array_to_string(({LTOKS})[i+1:i+3], ' ')))"
    )
)
D27_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_FULL} AS shingles FROM documents),
bench_sh AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0),
bench_pos AS (
  SELECT DISTINCT (('0x'||substr(md5(s),1,8))::BIGINT
          + r.i * (('0x'||substr(md5(s),9,8))::BIGINT | 1)) % 65536 AS pos
  FROM bench_sh CROSS JOIN range(4) r(i)),
words AS (
  SELECT pos // 64 AS word_idx,
         bit_or(CASE WHEN pos % 64 = 63 THEN (-9223372036854775807 - 1)
                ELSE (1::BIGINT << (pos % 64)::INT) END) AS bits
  FROM bench_pos GROUP BY 1),
train AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 20 <> 0),
probe AS (
  SELECT doc_id, s,
         (('0x'||substr(md5(s),1,8))::BIGINT
          + r.i * (('0x'||substr(md5(s),9,8))::BIGINT | 1)) % 65536 AS pos
  FROM train CROSS JOIN range(4) r(i)),
checked AS (
  SELECT doc_id, s,
         min(CASE WHEN w.bits IS NULL THEN 0
                  ELSE (w.bits >> (p.pos % 64)::INT) & 1 END) AS hit
  FROM probe p LEFT JOIN words w ON w.word_idx = p.pos // 64
  GROUP BY doc_id, s)
SELECT doc_id, SUM(hit)::BIGINT AS n_hits, SUM(hit) <= 2 AS kept
FROM checked GROUP BY doc_id ORDER BY doc_id
"""


def d20_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    # Top-100 corpus terms by sqrt-damped TF-IDF (operators/tfidf.py explains
    # why sqrt idf and not ln: cross-engine IEEE determinism). tb1, not tbp:
    # spreading would push the full TEXT column through a round-robin
    # exchange just to parallelize the explode, and on the single-row-group
    # fixture the serial plan (explode + both aggs in one task, AQE-coalesced
    # exchanges) measures fastest (0.46 s vs 0.59 tb / 0.70 tbp at sf0.1);
    # at real scale tb1 is a no-op and the scan splits naturally.
    return top_terms(tb1(spark, sf, "documents"), k=100, min_df=2)


D20_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({LTOKS}) AS term FROM documents),
tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS total_tf,
              COUNT(DISTINCT doc_id) AS df
       FROM tok WHERE term <> '' GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT term, df, total_tf,
       ROUND(total_tf * sqrt(n_docs::DOUBLE / df), 6) AS tfidf
FROM tf CROSS JOIN n
WHERE df >= 2
ORDER BY tfidf DESC, term LIMIT 100
"""


def d21_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    # The fixture corpus is synthetic and PII-free, so the query plants a
    # deterministic email+phone on every 7th doc IN BOTH ENGINES, then
    # redacts — making the scrub observable (counts > 0, md5s change) while
    # staying oracle-checkable.
    # parts=8 (r15): regexp redaction is light per fixture doc — A/B
    # 0.50 → 0.40 s, byte-equal.
    d = tbp(spark, sf, "documents", parts=8)
    injected = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1 202 555 0199 now"),
        ),
    ).otherwise(F.col("text"))
    base = d.select("doc_id", injected.alias("__t"))
    n_emails, n_phones = T.pii_counts(F.col("__t"))
    return base.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(T.redact_pii(F.col("__t"))).alias("redacted_md5"),
    ).transform(lambda d: ordered(d, "doc_id"))


D21_SQL = f"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || doc_id
                   || '@example.com or call +1 202 555 0199 now'
              ELSE text END AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{T.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{T.PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{T.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{T.PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM inj ORDER BY doc_id
"""


_BM25_TERMS = sorted({"vector", "merge", "scan", "data"})
_BM25_K1, _BM25_B = 1.2, 0.75


def d24_bm25(spark: SparkSession, sf: str) -> DataFrame:
    # Okapi BM25 relevance of every document to a fixed query — the curate
    # CLI's --query/--min-bm25 gate, registered so the operator carries a
    # driver oracle row (r6 verdict #6). r14 optimization: the registered
    # form is the PIVOTED plan (operators/tfidf.bm25_scores_pivot) — the
    # fixed 4-term query rides each document row as per-term tf columns,
    # corpus stats collapse into one broadcast single-row aggregate, and
    # the per-doc score is the SAME term-sorted IEEE fold as the exploded
    # form's stable_sum (unrolled; absent terms add an exact +0.0), so the
    # scores are bit-identical (property-pinned vs bm25_scores in
    # tests/test_curation_ops.py, oracle SQL unchanged). Guide §2.3/§2.4:
    # the explode shuffle, the 3-key groupBy, the per-doc
    # collect_list+array_sort ObjectHashAggregate, and one of three text
    # scans all drop out — bench row 2.02 → 0.99 s at sf0.1 (ratio vs
    # DuckDB 7.4 → 4.3; quiet-window A/Bs measured ~0.77 s).
    # The generic bm25_scores (exploded, arbitrary |query|) remains the
    # operator the CLI uses for unbounded queries.
    from vectrekker_spark.operators.tfidf import bm25_scores_pivot
    from vectrekker_spark.queries.util import tb

    d = tb(spark, sf, "documents")
    out = bm25_scores_pivot(d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B)
    return ordered(out, "doc_id")


_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
D24_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len(regexp_extract_all(trim(text), '\\S+')) AS dl,
         list_filter({LTOKS}, t -> t IN ({_TERMS_SQL})) AS hit_toks
  FROM documents),
stats AS (
  SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM base WHERE dl IS NOT NULL),
tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(hit_toks) AS term FROM base)
  GROUP BY doc_id, dl, term),
dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
idf AS (
  -- every numeric literal is CAST to DOUBLE so DuckDB mirrors Spark's IEEE
  -- op-for-op evaluation instead of exact DECIMAL arithmetic (a bare 1.2
  -- parses as DECIMAL here); the .5 offsets are dyadic so the casts are
  -- value-exact
  SELECT term,
         ln(1.0 + CAST(n_docs - df + 0.5 AS DOUBLE) / CAST(df + 0.5 AS DOUBLE))
           AS idf,
         avgdl
  FROM dfx CROSS JOIN stats),
parts AS (
  SELECT tf.doc_id AS doc_id, tf.term AS term,
         idf.idf * (tf.tf * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
           / (tf.tf + CAST({_BM25_K1!r} AS DOUBLE)
              * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                 + (CAST({_BM25_B!r} AS DOUBLE) * tf.dl) / idf.avgdl))
           AS part
  FROM tf JOIN idf USING (term)),
scored AS (
  SELECT doc_id,
         ROUND(list_aggregate(list(part ORDER BY term), 'sum'), 6) AS score
  FROM parts GROUP BY doc_id)
SELECT b.doc_id AS doc_id, COALESCE(s.score, 0.0) AS score
FROM base b LEFT JOIN scored s USING (doc_id)
ORDER BY doc_id
"""


def d25_sample_mixture(spark: SparkSession, sf: str) -> DataFrame:
    # C9/C10 assembly surface as a driver-oracle row (r7 verdict #6):
    # stratified mixture sampling (per-language rates — the data-mixture
    # weighting step) + the deterministic training-order shuffle, both pure
    # salted-md5 bucket math (operators/sampling.py reuses split.py's
    # bucket derivation, so the DuckDB oracle mirrors it bit-exactly —
    # SURVEY C10's "same md5 math"). Everything before the final order is
    # a NARROW map: no join, no shuffle, stable under corpus growth — the
    # shape that lets a 100 TB mixture re-sample incrementally. The output
    # rides shuf_bucket order = seeded_shuffle's training order.
    from vectrekker_spark.operators.sampling import (
        sample_bucket,
        stratified_hash_sample,
    )
    from vectrekker_spark.queries.util import small_local

    rates = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1, "zh": 0.05}
    # parts=8 (r15): the salted-md5 maps are a few ns per row — A/B
    # 0.51 → 0.31 s, byte-equal.
    d = tbp(spark, sf, "documents", parts=8)
    s = stratified_hash_sample(d, rates, strata_col="lang", seed="mix1")
    out = s.select(
        "doc_id",
        "lang",
        "source",
        sample_bucket("doc_id", "mix1").alias("smp_bucket"),
        sample_bucket("doc_id", "epoch0").alias("shuf_bucket"),
    )
    if small_local(sf, "documents"):
        return out.coalesce(1).sortWithinPartitions("shuf_bucket", "doc_id")
    return ordered(out, "shuf_bucket", "doc_id")


def _rate_case_sql() -> str:
    return (
        "CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000 "
        "WHEN 'fr' THEN 250000 WHEN 'es' THEN 100000 WHEN 'zh' THEN 50000 "
        "ELSE 0 END"
    )


from vectrekker_spark.operators.split import split_bucket_sql  # noqa: E402

D25_SQL = f"""
WITH s AS (
  SELECT doc_id, lang, source,
         {split_bucket_sql('doc_id', 'mix1', 1_000_000)} AS smp_bucket,
         {split_bucket_sql('doc_id', 'epoch0', 1_000_000)} AS shuf_bucket
  FROM documents)
SELECT doc_id, lang, source, smp_bucket, shuf_bucket
FROM s WHERE smp_bucket < {_rate_case_sql()}
ORDER BY shuf_bucket, doc_id
"""


SPECS = [
    QuerySpec("d18_hash_split", d18_hash_split, D18_SQL, ("curation",),
              "deterministic salted-hash train/val/test split + stats"),
    QuerySpec("d25_sample_mixture", d25_sample_mixture, D25_SQL,
              ("curation", "assembly"),
              "stratified mixture sampling + seeded training-order shuffle"),
    QuerySpec("d19_decontaminate", d19_decontaminate, D19_SQL,
              ("curation", "dedup"),
              "benchmark decontamination via word-3-gram shingle overlap"),
    QuerySpec("d27_bloom_decontam", d27_bloom_decontam, D27_SQL,
              ("curation", "dedup"),
              "C13 zero-shuffle bloom decontamination, bit-exact bitmap "
              "oracle (d16 merged into d12 to free the slot)"),
    QuerySpec("d20_tfidf", d20_tfidf, D20_SQL, ("curation",),
              "top-100 corpus terms by sqrt-damped TF-IDF"),
    QuerySpec("d21_pii_redact", d21_pii_redact, D21_SQL, ("curation",),
              "regex PII scrub (emails/phones) with planted fixtures"),
    QuerySpec("d24_bm25", d24_bm25, D24_SQL, ("curation", "relevance"),
              "Okapi BM25 relevance scores (order-deterministic fold)"),
]
