"""Round-14 session-3 scale measurements for SCALE.md: DSIR importance
selection, line-level dedup, and the quality-aware near-dup keeper at sf1
(the new-this-session components the bench registry doesn't cover).

Usage: python scripts/r14s3_scale_measure.py [sf_dir]  (default .scale/sf1)
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
    spark = get_spark(app_name="r14s3-scale")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs from {sf_dir}")

    # ---- DSIR: fit both dists, weight the corpus, select 10% ----------
    from vectrekker_spark.operators.dsir import (
        dsir_select_rate,
        fit_feature_dist,
        importance_weights,
    )

    target = docs.where(F.col("doc_id") % 50 == 0)  # planted "domain"
    t0 = time.time()
    lp_t = fit_feature_dist(target)
    t_fit_target = time.time() - t0
    t0 = time.time()
    lp_r = fit_feature_dist(docs)
    t_fit_raw = time.time() - t0
    t0 = time.time()
    w = importance_weights(docs, lp_t, lp_r)
    picked = dsir_select_rate(w, 0.1, seed="scale")
    n_picked = picked.count()
    t_weight_select = time.time() - t0
    print(
        f"dsir: fit_target {t_fit_target:.2f}s ({target.count()} docs), "
        f"fit_raw {t_fit_raw:.2f}s, weight+select(0.1) "
        f"{t_weight_select:.2f}s -> {n_picked} docs "
        f"({n_docs / max(t_fit_raw + t_weight_select, 1e-9):.0f} docs/s "
        f"fit+weight+select)"
    )

    # ---- line-level dedup --------------------------------------------
    from vectrekker_spark.operators.paradedup import dedup_lines

    t0 = time.time()
    out = dedup_lines(docs, min_chars=20)
    stripped = out.agg(F.sum("paras_dropped")).collect()[0][0]
    t_lines = time.time() - t0
    print(
        f"dedup_lines: {stripped} lines stripped in {t_lines:.2f}s "
        f"({n_docs / max(t_lines, 1e-9):.0f} docs/s)"
    )

    # ---- per-stratum token budget ------------------------------------
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    strat = docs.withColumn("source", (F.col("doc_id") % 20).cast("string"))
    t0 = time.time()
    capped = cap_tokens_per_stratum(
        strat, 100_000, order_cols=["doc_id"],
    )
    n_capped = capped.count()
    t_cap = time.time() - t0
    print(
        f"cap_tokens_per_stratum: {n_capped} of {n_docs} docs within "
        f"100k-token budgets across 20 strata in {t_cap:.2f}s "
        f"({n_docs / max(t_cap, 1e-9):.0f} docs/s)"
    )

    # ---- quality-aware near-dup keeper -------------------------------
    from vectrekker_spark.operators.components import near_dedup_keep_best

    scored = docs.withColumn(
        "q", (F.col("doc_id") % 101).cast("double") / 101.0
    )
    t0 = time.time()
    kb = near_dedup_keep_best(scored, "q", threshold=0.7)
    n_kept = kb.where("keep").count()
    t_kb = time.time() - t0
    print(
        f"near_dedup_keep_best: {n_kept} keepers of {n_docs} in "
        f"{t_kb:.2f}s ({n_docs / max(t_kb, 1e-9):.0f} docs/s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
