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
