"""Round-14 session-2 scale measurements for SCALE.md: paragraph dedup,
BPE training/encode, text normalization and the compression-ratio gate at
sf1 (the new-this-session components the bench registry doesn't cover).

Usage: python scripts/r14s2_scale_measure.py [sf_dir]  (default .scale/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectrekker_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_spark(app_name="r14s2-scale")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs from {sf_dir}")

    # ---- paragraph dedup --------------------------------------------
    # the sf corpus is single-paragraph; build the fuzz family's shape:
    # each doc pairs its text with doc_id % 1000's text — 2 paragraphs
    # per doc, a 1000-doc shared pool => ~49k cross-doc repeats
    from vectrekker_spark.operators.paradedup import dedup_paragraphs

    b = docs.select(
        F.col("doc_id").alias("__bid"), F.col("text").alias("__btext")
    )
    built = (
        docs.join(b, (F.col("doc_id") % 1000) == F.col("__bid"), "left")
        .select("doc_id", F.concat_ws("\n\n", "text", "__btext").alias("text"))
        .persist()
    )
    built.count()
    t0 = time.monotonic()
    out = dedup_paragraphs(built, min_chars=20)
    row = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("paras_dropped").alias("dropped")
    ).first()
    t1 = time.monotonic()
    print(
        f"paradedup: {row['n']} docs, {row['dropped']} paragraphs stripped "
        f"in {t1 - t0:.2f}s ({n_docs / (t1 - t0):.0f} docs/s)"
    )
    built.unpersist()

    # ---- BPE train + encode -----------------------------------------
    from vectrekker_spark.operators.bpetrainer import (
        bpe_token_count,
        bpe_train,
        word_freqs,
    )

    t0 = time.monotonic()
    freqs = word_freqs(docs, max_word_types=30_000).persist()
    n_types = freqs.count()
    t1 = time.monotonic()
    model = bpe_train(docs, n_merges=1000, freqs=freqs)
    t2 = time.monotonic()
    cnt = bpe_token_count(docs, model)
    total_tokens = cnt.agg(F.sum("bpe_n_tokens")).first()[0]
    t3 = time.monotonic()
    freqs.unpersist()
    print(
        f"bpe: word_freqs {n_types} types in {t1 - t0:.2f}s; "
        f"{len(model.merges)} merges trained in {t2 - t1:.2f}s; "
        f"encode-count {total_tokens} tokens over {n_docs} docs in "
        f"{t3 - t2:.2f}s ({n_docs / (t3 - t2):.0f} docs/s)"
    )

    # ---- normalization tiers ----------------------------------------
    from vectrekker_spark.functions.normalize import (
        compression_ratio,
        normalize_text_exact,
        normalize_ws,
    )

    t0 = time.monotonic()
    docs.select(
        F.sum(F.length(normalize_ws("text"))).alias("s")
    ).first()
    t1 = time.monotonic()
    normalize_text_exact(docs, out_col="__n").agg(
        F.sum(F.length("__n"))
    ).first()
    t2 = time.monotonic()
    compression_ratio(docs).agg(F.avg("compression_ratio")).first()
    t3 = time.monotonic()
    print(
        f"normalize: JVM ws tier {t1 - t0:.2f}s "
        f"({n_docs / (t1 - t0):.0f} docs/s); exact NFKC+mojibake tier "
        f"{t2 - t1:.2f}s ({n_docs / (t2 - t1):.0f} docs/s); "
        f"compression_ratio {t3 - t2:.2f}s ({n_docs / (t3 - t2):.0f} docs/s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
