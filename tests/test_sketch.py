"""Count-Min sketch properties: never underestimates, overestimate bounded,
partition-invariant merge, heavy hitters recovered."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import tokens
from vectrekker_spark.operators.sketch import build_sketch, estimate, heavy_hitters


def _exact_counts(spark, docs):
    rows = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    return {r["t"]: r["count"] for r in rows}


def test_cms_bounds_and_heavy_hitters(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sketch = build_sketch(docs)
    exact = _exact_counts(spark, docs)
    total = sum(exact.values())

    # CM property: estimate >= exact, and <= exact + eps*N (eps = e/width)
    eps_n = int(np.ceil(np.e / sketch.shape[1] * total))
    for tok, c in exact.items():
        est = estimate(sketch, tok)
        assert est >= c, f"{tok}: underestimate {est} < {c}"
        assert est <= c + eps_n, f"{tok}: overestimate {est} > {c}+{eps_n}"

    # heavy hitters: the true top tokens survive the sketch filter
    top_true = sorted(exact.items(), key=lambda x: (-x[1], x[0]))[:5]
    hh = dict(heavy_hitters(sketch, list(exact), min_count=top_true[-1][1]))
    for tok, _ in top_true:
        assert tok in hh


def test_cms_merge_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = build_sketch(docs)
    b = build_sketch(docs.repartition(9))
    assert (a == b).all()


def test_cms_distributed_merge_equals_driver_fold(spark, sf_dir):
    # same commutative monoid either path → bit-identical sketch, at any
    # partitioning
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = build_sketch(docs, merge="driver")
    b = build_sketch(docs, merge="distributed")
    c = build_sketch(docs.repartition(7), merge="distributed")
    assert (a == b).all() and (a == c).all()


def test_cms_rejects_unknown_merge(spark, sf_dir):
    import pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    with pytest.raises(ValueError, match="merge"):
        build_sketch(docs, merge="nope")


def test_cms_estimate_zero_for_absent_token(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    sketch = build_sketch(docs)
    # token that cannot appear; collisions may give a small overcount but
    # never more than eps*N of a 5-doc corpus
    assert estimate(sketch, "zzz-never-in-corpus-zzz") <= 5


# --- one-pass top-k (candidates + CM estimates) -----------------------------


def test_top_tokens_finds_planted_heavies(spark):
    from vectrekker_spark.operators.sketch import top_tokens

    rows = []
    for i in range(300):
        rows.append((i, "alpha " * 10 + "beta " * 5 + f"rare{i} tail{i % 7}"))
    df = spark.createDataFrame(rows, "id long, text string")
    top = top_tokens(df, k=3, width=4096)
    tokens = [t for t, _ in top]
    assert tokens[0] == "alpha" and tokens[1] == "beta"
    est = dict(top)
    # CM estimates are upper bounds of the true counts
    assert est["alpha"] >= 3000 and est["beta"] >= 1500
    # ... and not wildly off on a lightly-loaded sketch
    assert est["alpha"] <= 3000 * 1.05


def test_top_tokens_matches_exact_on_fixture(spark, sf_dir):
    import pyspark.sql.functions as F

    from vectrekker_spark.functions.text import tokens as tok_expr
    from vectrekker_spark.operators.sketch import top_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = dict(
        docs.select(F.explode(tok_expr(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t").count().orderBy(F.desc("count"), "t").limit(10)
        .collect()
    )
    got = top_tokens(docs, k=10, width=8192)
    got_tokens = {t for t, _ in got}
    # the exact top-10 must appear in the sketched top-10 when counts are
    # well separated; allow 2 boundary swaps for ties/CM noise
    assert len(set(exact) & got_tokens) >= 8
    for t, e in got:
        if t in exact:
            assert e >= exact[t]  # never under the true count


def test_top_tokens_partition_invariant_for_heavies(spark):
    from vectrekker_spark.operators.sketch import top_tokens

    rows = [(i, "hot " * 20 + f"noise{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, text string")
    a = top_tokens(df.repartition(1), k=1, width=4096)
    b = top_tokens(df.repartition(13), k=1, width=4096)
    assert a[0] == b[0] and a[0][0] == "hot"


def test_top_tokens_validation(spark):
    import pytest

    from vectrekker_spark.operators.sketch import top_tokens

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="local_candidates"):
        top_tokens(df, k=10, local_candidates=5)
