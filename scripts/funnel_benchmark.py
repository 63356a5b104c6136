"""End-to-end training-data assembly benchmark: EVERY curation stage on.

Exercises the full product path a pretraining-data team would run —
    model prep (fit quality classifier, fit n-gram LM, build benchmark
    bloom, attach doc embeddings)
  → curate() with every opt-in stage enabled (exact dedup, MinHash
    near-dedup, SemDeDup semantic dedup, span-level substring strip,
    heuristic + learned quality gates, LM perplexity gate, benchmark
    decontamination, per-stratum domain cap)
  → greedy sequence packing → seeded shuffle → sharded parquet export
and prints one JSON line with wall times + the funnel's survivor counts.

Usage: python scripts/funnel_benchmark.py [data_dir] [out_dir]
       data_dir defaults to /root/repo/.scale/sf1 (make_scale_data.py);
       out_dir defaults to a temp dir (removed afterwards unless given).

Record the numbers in SCALE.md — this is the "would the whole funnel run
at 100 TB" evidence, not a per-operator microbenchmark: every stage here
is the same narrow-map / bounded-shuffle shape the per-operator SCALE.md
rows argue for, and this script proves they compose.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectrekker_spark.session import get_spark  # noqa: E402


def main() -> int:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    keep_out = len(sys.argv) > 2
    out = sys.argv[2] if keep_out else tempfile.mkdtemp(prefix="funnel_bench_")
    work = tempfile.mkdtemp(prefix="funnel_models_")

    from vectrekker_spark.curation import (
        AssemblyConfig,
        CurationConfig,
        assemble_training_set,
    )
    from vectrekker_spark.operators.bloom import bloom_save
    from vectrekker_spark.operators.decontaminate import benchmark_bloom
    from vectrekker_spark.operators.ngramlm import fit_ngram_lm, lm_save
    from vectrekker_spark.operators.qualityscore import (
        fit_linear_quality,
        save_model,
    )
    from vectrekker_spark.operators.sampling import hash_sample
    from vectrekker_spark.queries.vector import hash_embed_batch

    spark = get_spark()
    t_start = time.time()
    docs = spark.read.parquet(f"{data}/documents.parquet")

    report: dict = {"data": data, "input_docs": docs.count()}

    # ---- model prep (train small, apply at scale) --------------------
    t0 = time.time()
    # learned quality classifier on a deterministic ~20% sample. The
    # synthetic corpus saturates the heuristic score (every doc is 1.0 —
    # measured), so labels come from document length instead: a real
    # two-class problem for the fit + a gate with actual selectivity.
    # The fit and apply paths are the production ones either way.
    med_chars = docs.approxQuantile("n_chars", [0.5], 0.01)[0]
    sample = hash_sample(docs, 0.2, id_col="doc_id", seed="fit")
    labeled = sample.withColumn(
        "label", (F.col("n_chars") >= F.lit(med_chars)).cast("int")
    )
    w, b = fit_linear_quality(labeled, label_col="label", text_col="text")
    qpath = os.path.join(work, "quality.npz")
    save_model(qpath, w, b)
    report["t_fit_quality_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    # n-gram LM on an independent ~10% hash sample (different seed →
    # independent of, not disjoint from, the quality-fit sample; it also
    # overlaps the corpus it later scores — acceptable for a THROUGHPUT
    # benchmark, but a real CCNet setup fits on a held-out clean reference)
    ref = hash_sample(docs, 0.1, id_col="doc_id", seed="lmref")
    lm = fit_ngram_lm(ref, text_col="text")
    lmpath = os.path.join(work, "ngram_lm")
    lm_save(lm, lmpath)
    report["t_fit_ngram_lm_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    # benchmark bloom: a ~2% sample plays the held-out eval suite
    bench = hash_sample(docs, 0.02, id_col="doc_id", seed="bench")
    bf = benchmark_bloom(bench, text_col="text", k=3)
    bpath = os.path.join(work, "bench_bloom")
    bloom_save(bf, bpath)
    report["t_build_bloom_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    # doc-level embeddings for the semantic stage (deterministic hashing
    # embedder — the same Arrow-batched stand-in the chunk embed uses)
    embed = F.pandas_udf(lambda s: hash_embed_batch(s), "array<double>")
    docs_e = docs.withColumn("embedding", embed(F.col("text"))).persist()
    docs_e.count()  # materialize so assembly timing is the funnel, not embed
    report["t_doc_embed_sec"] = round(time.time() - t0, 2)

    # ---- the full funnel + pack + shuffle + export -------------------
    t0 = time.time()
    cfg = AssemblyConfig(
        curation=CurationConfig(
            embed=False,
            # line-level boilerplate strip runs FIRST (C19, r10): the
            # synthetic corpus is prose without nav chrome, so the stage
            # mostly passes everything — what this proves is the
            # COMPOSITION (cleaned text feeds every downstream hash/gate)
            strip_boilerplate_min_words=3,
            min_quality=0.5,
            near_dup_threshold=0.7,
            semantic_dedup_threshold=0.95,
            strip_span_ngram=8,
            quality_model_path=qpath,
            min_model_quality=0.5,
            ngram_lm_path=lmpath,
            # sits at ~the 90th percentile of the synthetic corpus's
            # perplexity distribution (measured ~30.5-43.8) — the gate
            # actually filters instead of waving everything through
            max_perplexity=31.2,
            bench_bloom_path=bpath,
            decontaminate_shingle_k=3,
            decontaminate_max_shared=40,
            # FineWeb-style domain cap on the final survivors: the sf1
            # corpus has 20 sources and ~21 survivors each at this point,
            # so 15 actually binds (423 → 300 measured) instead of waving
            # everything through
            max_docs_per_stratum=15,
            stratum_col="source",
        ),
        max_tokens=2048,
        shuffle_seed="epoch0",
        rows_per_shard=100_000,
    )
    funnel = assemble_training_set(docs_e, out, cfg)
    report["t_assemble_sec"] = round(time.time() - t0, 2)
    report["t_total_sec"] = round(time.time() - t_start, 2)
    report["funnel"] = funnel
    shard_files = [
        f for f in os.listdir(out) if f.endswith(".parquet")
    ] if os.path.isdir(out) else []
    report["shard_files"] = len(shard_files)

    docs_e.unpersist()
    shutil.rmtree(work, ignore_errors=True)
    if not keep_out:
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
