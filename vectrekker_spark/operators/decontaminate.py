"""Benchmark decontamination: flag training documents that share word n-gram
shingles with a held-out benchmark/eval set.

This is the standard guard against train/test contamination in LLM data
pipelines: an eval example whose n-grams appear in the training corpus can be
memorized rather than generalized, so curation drops (or at least flags)
training docs with shingle overlap against every benchmark suite.

Scale shape (the part that matters at 100 TB):
- Each side explodes to (doc_id, shingle_hash) rows — a narrow 16-byte
  stream; the raw text never shuffles.
- Shingles are hashed to 64-bit ints (md5-prefix, shared with the MinHash
  kernel) BEFORE the join, so the shuffle key is fixed-width and the join is
  a plain shuffled hash join on longs. The benchmark side is normally tiny
  relative to training (GBs vs TBs) → Spark broadcasts it and the training
  side never shuffles at all.
- Dedup per (doc, shingle) happens map-side via array_distinct inside the
  shingle expression, before the explode, so hot shingles don't amplify rows.
- Output is per-training-doc counts (distinct shared shingles, distinct
  benchmark docs hit) — the caller joins it back as an anti-join to drop, or
  keeps it as an audit table.

Hash-collision caveat: overlap is computed on 32-bit md5-prefix hashes, so a
collision can flag a false shared shingle (~n²/2³² per doc pair) — fine for
contamination screening, where false positives only over-drop. The DuckDB
oracle uses the identical hash, so both engines agree bit-for-bit.

Reference scope note: the reference (vectrekker/main.py) has no dedup or
decontamination surface; north-star training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import token_hash32, word_shingles


def shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, shingle_hash) rows: distinct word k-gram shingles per doc, hashed
    to 64-bit ints map-side. The only wide column (text) dies before any
    shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, k)).alias("__sh"),
    ).select(id_col, token_hash32(F.col("__sh")).alias("shingle_hash"))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-training-doc contamination counts vs the benchmark set.

    Returns (train_id, n_shared_shingles, n_bench_docs) for training docs with
    ≥1 shared shingle. The benchmark side is the small one — Spark's size
    estimate broadcasts it; at cluster scale pass a pre-aggregated benchmark
    shingle table and the training side stays shuffle-free.
    """
    t = shingle_hashes(train, id_col, text_col, k).withColumnRenamed(
        id_col, "train_id"
    )
    b = shingle_hashes(bench, id_col, text_col, k).withColumnRenamed(
        id_col, "bench_id"
    )
    # size(collect_set(..)) instead of two countDistinct: a MIXED distinct
    # aggregate (two DISTINCT columns in one agg) makes Catalyst Expand
    # every joined row ×2 and run a two-level distinct aggregation (3
    # exchanges) — the same planner behavior tfidf.term_scores works
    # around. Per-group sets partial-merge map-side, values are identical
    # (neither column is nullable here), and the plan is one ordinary
    # partial+final aggregate: no Expand, one exchange.
    return (
        t.join(b, "shingle_hash")
        .groupBy("train_id")
        .agg(
            F.size(F.collect_set("shingle_hash")).cast("long").alias(
                "n_shared_shingles"
            ),
            F.size(F.collect_set("bench_id")).cast("long").alias("n_bench_docs"),
        )
    )


def contamination_report_dedup_first(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """contamination_report with EXACT-DEDUP-FIRST composition — identical
    output, join volume collapsed on duplicate-heavy corpora.

    Why: the plain report's (train_shingle ⋈ bench_shingle) output is
    QUADRATIC in corpus duplication — on a verbatim-R×-replicated corpus
    every shingle match multiplies by R² across replica pairs (measured:
    R=300 exceeded 77 GB of shuffle disk at sf30, SCALE.md). But exact
    text duplicates have IDENTICAL shingle sets, so the report rows for
    replicas are identical too: compute the join on ONE representative
    per distinct text on each side and map back.

      - train side: group by md5(text) (NULL → sentinel; NULL and ''
        shingle identically but keeping them as distinct groups only
        costs one extra rep, never correctness), rep = min(id). The join
        runs at distinct-text scale; every member inherits its rep's row.
      - bench side: same grouping, but n_bench_docs counts REPLICAS —
        if any member of a bench text-group is hit, every member is hit
        (identical shingle set), so per hit group the contribution is
        the group's member count, summed per train rep.

    Exactness is structural (duplicate ⇒ same shingle set ⇒ same counts),
    not approximate — property-tested equal to contamination_report on
    replicated corpora including NULL/empty texts. The narrow
    (id, text_hash) mapping streams are the only extra shuffles, linear
    in corpus size. This is the registered d19 form; the plain report
    remains the audit tool for already-deduped corpora.
    """
    tkey = F.when(F.col(text_col).isNull(), F.lit("∅null")).otherwise(
        F.md5(F.col(text_col))
    )
    tmap = train.select(F.col(id_col).alias("train_id"), tkey.alias("__tkey"))
    treps = tmap.groupBy("__tkey").agg(F.min("train_id").alias("__rep"))
    train_rep = train.join(
        treps.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    bmap = bench.select(F.col(id_col).alias("bench_id"), tkey.alias("__bkey"))
    breps = bmap.groupBy("__bkey").agg(
        F.min("bench_id").alias("__brep"),
        F.count(F.lit(1)).alias("__nrep"),
    )
    bench_rep = bench.join(
        breps.select(F.col("__brep").alias(id_col)), id_col, "left_semi"
    )
    t = shingle_hashes(train_rep, id_col, text_col, k).withColumnRenamed(
        id_col, "__rep"
    )
    b = shingle_hashes(bench_rep, id_col, text_col, k).withColumnRenamed(
        id_col, "__brep"
    )
    joined = t.join(b, "shingle_hash")
    sh_cnt = joined.groupBy("__rep").agg(
        F.size(F.collect_set("shingle_hash")).cast("long").alias(
            "n_shared_shingles"
        )
    )
    bd_cnt = (
        joined.select("__rep", "__brep")
        .distinct()
        .join(breps.select("__brep", "__nrep"), "__brep")
        .groupBy("__rep")
        .agg(F.sum("__nrep").cast("long").alias("n_bench_docs"))
    )
    return (
        tmap.join(treps, "__tkey")
        .select("train_id", "__rep")
        .join(sh_cnt.join(bd_cnt, "__rep"), "__rep")
        .select("train_id", "n_shared_shingles", "n_bench_docs")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_shared: int = 0,
) -> DataFrame:
    """Drop training docs sharing more than `max_shared` distinct shingles
    with the benchmark set (default: any overlap drops). Anti-join on the
    report keeps the pipeline set-oriented — no collects."""
    bad = (
        contamination_report(train, bench, id_col, text_col, k)
        .filter(F.col("n_shared_shingles") > max_shared)
        .select(F.col("train_id").alias(id_col))
    )
    return train.join(bad, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Bloom route — the zero-shuffle variant for when even the shingle join is
# too much movement: compress the benchmark shingle set into a broadcast
# bitmap once, then decontaminating the corpus is a single narrow map (no
# explode survives the plan, no join, no shuffle — asserted in tests).
# One-sided error: a bloom false positive (rate ≈ fpp) OVER-drops a clean
# training doc, never under-drops a contaminated one — the safe direction
# for decontamination. The exact join above stays the audit/report path.


def benchmark_bloom(
    bench: DataFrame,
    text_col: str = "text",
    k: int = 3,
    fpp: float = 0.001,
    expected_shingles: int | None = None,
    **bloom_kw,
):
    """Build a BloomFilter over the benchmark set's distinct word k-gram
    shingles (the raw shingle STRINGS — build and probe share the bloom's
    own md5 hash family, so there is no cross-kernel hash parity to keep).
    Pass ``expected_shingles`` to skip the sizing count job; save/merge via
    operators.bloom for reuse across pipeline runs.

    The exploded stream is deduplicated CROSS-corpus ONLY when the builder
    must run a sizing count: word_shingles dedups only within a doc, and
    sizing on the raw stream would count every cross-doc repetition
    (5-50× for common trigrams), over-sizing the bitmap by the same factor
    and mis-reporting n_items. That distinct is a shuffle of the benchmark
    side only — the bounded side by the operator's premise. With
    ``expected_shingles`` or explicit m_bits+k there is no count job, and
    bit_or insertion is idempotent, so the distinct is skipped (r12: it
    dominated the fixed-geometry build at small scale). The filter records
    its shingle_k and text_col in ``attrs`` so decontaminate_bloom can
    refuse a mismatched probe instead of silently finding no overlaps."""
    from vectrekker_spark.operators.bloom import bloom_build

    sh = bench.select(F.explode(word_shingles(text_col, k)).alias("__sh"))
    needs_sizing_count = expected_shingles is None and not (
        bloom_kw.get("m_bits") is not None and bloom_kw.get("k") is not None
    )
    if needs_sizing_count:
        sh = sh.distinct()
    bf = bloom_build(sh, "__sh", expected=expected_shingles, fpp=fpp, **bloom_kw)
    bf.attrs.update({"kind": "shingles", "shingle_k": k, "text_col": text_col})
    return bf


def decontaminate_bloom(
    train: DataFrame,
    bench_bloom,
    text_col: str = "text",
    k: int = 3,
    max_shared: int = 0,
    strategy: str = "auto",
) -> DataFrame:
    """Drop training docs whose distinct shingles hit the benchmark bloom
    more than ``max_shared`` times. Matches `decontaminate`'s semantics
    (word_shingles is per-doc distinct; ``k`` must equal the build's
    shingle k) modulo bloom false positives, which only over-drop —
    property-tested: every doc the exact join drops, this drops too.
    NULL/empty/short text follows word_shingles' single-shingle rule in
    BOTH paths (null and '' both shingle to [''], so an empty train doc
    matches an empty benchmark doc — tested).

    A filter built by benchmark_bloom carries its shingle_k in ``attrs``;
    a mismatch with ``k`` raises instead of silently probing disjoint
    hashes (which would pass every contaminated doc)."""
    from vectrekker_spark.operators.bloom import array_hit_counts

    if max_shared < 0:
        raise ValueError(
            f"max_shared must be >= 0, got {max_shared} — hit counts are "
            f"never negative, so this gate would drop EVERY document"
        )
    # ABSENT provenance must fail too (not just mismatched): a raw
    # bloom_build filter with empty attrs previously skipped both checks
    # and decontamination became a silent no-op — the unsafe under-drop
    # direction this module's docstring claims it cannot have (r14s3)
    kind = bench_bloom.attrs.get("kind")
    if kind != "shingles":
        raise ValueError(
            f"bloom provenance kind={kind!r} is not a shingle filter — "
            f"probing shingles against it matches nothing (build with "
            f"benchmark_bloom / bloom-build --kind shingles)"
        )
    built_k = bench_bloom.attrs.get("shingle_k")
    if built_k != k:
        raise ValueError(
            f"bloom was built with shingle_k={built_k} but the probe uses "
            f"k={k}: the hashes are disjoint and decontamination would be "
            f"a silent no-op — pass matching k"
        )
    from vectrekker_spark.operators.bloom import _reserve

    _reserve(train, "__sh", "__n_hits", what="decontaminate_bloom temp columns")
    hits = array_hit_counts(
        train.withColumn("__sh", word_shingles(text_col, k)),
        "__sh",
        bench_bloom,
        out_col="__n_hits",
        strategy=strategy,
    )
    return hits.where(F.col("__n_hits") <= max_shared).drop("__sh", "__n_hits")
