"""Deterministic sampling / shuffle (operators/sampling.py): rate accuracy,
determinism, partition invariance, stability under corpus growth, stratified
mixture rates, and seeded-shuffle permutation properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.sampling import (
    hash_sample,
    seeded_shuffle,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang"
    )


def test_rate_and_determinism(docs):
    n = docs.count()
    s = hash_sample(docs, 0.3, seed="a")
    k = s.count()
    assert abs(k / n - 0.3) < 0.1  # binomial tolerance at n=500
    # deterministic: same seed → identical set; different seed → different set
    assert s.count() == hash_sample(docs, 0.3, seed="a").count()
    ids_a = {r["doc_id"] for r in s.collect()}
    ids_b = {r["doc_id"] for r in hash_sample(docs, 0.3, seed="b").collect()}
    assert ids_a != ids_b
    # partition invariance
    ids_rp = {
        r["doc_id"] for r in hash_sample(docs.repartition(7), 0.3, seed="a").collect()
    }
    assert ids_rp == ids_a


def test_stable_under_growth(docs):
    # sampling half the corpus then the full corpus keeps every previously
    # selected row — the incremental-corpus property
    half = docs.filter(F.col("doc_id") < 250)
    ids_half = {r["doc_id"] for r in hash_sample(half, 0.4, seed="g").collect()}
    ids_full = {r["doc_id"] for r in hash_sample(docs, 0.4, seed="g").collect()}
    assert ids_half <= ids_full


def test_rate_monotone(docs):
    # a higher rate strictly extends the sample (nested samples)
    lo = {r["doc_id"] for r in hash_sample(docs, 0.2, seed="m").collect()}
    hi = {r["doc_id"] for r in hash_sample(docs, 0.5, seed="m").collect()}
    assert lo <= hi


def test_stratified_rates(docs):
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    keep, drop = srcs[0], srcs[1] if len(srcs) > 1 else None
    rates = {keep: 1.0}
    out = stratified_hash_sample(docs, rates, strata_col="source", default_rate=0.0)
    got_srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert got_srcs == {keep}
    assert out.count() == docs.filter(F.col("source") == keep).count()
    if drop is not None:
        out2 = stratified_hash_sample(
            docs, {keep: 1.0, drop: 0.5}, strata_col="source"
        )
        n_drop = out2.filter(F.col("source") == drop).count()
        n_drop_total = docs.filter(F.col("source") == drop).count()
        assert 0 < n_drop < n_drop_total


def test_boundary_rates(docs):
    n = docs.count()
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == n
    # default_rate applies to strata missing from the rate map
    assert (
        stratified_hash_sample(docs, {}, strata_col="source", default_rate=1.0).count()
        == n
    )
    assert (
        stratified_hash_sample(docs, {}, strata_col="source", default_rate=0.0).count()
        == 0
    )


def test_invalid_rates_raise(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, {"x": -0.1})


def test_sampling_is_narrow(docs):
    # both sampling ops must stay shuffle-free (pure filter over the scan) —
    # the property that makes them free at 100 TB
    from vectrekker_spark.plans import shuffle_count

    assert shuffle_count(hash_sample(docs, 0.3)) == 0
    assert (
        shuffle_count(stratified_hash_sample(docs, {"web": 0.5}, default_rate=0.1))
        == 0
    )


def test_seeded_shuffle_permutation(docs):
    base = [r["doc_id"] for r in docs.orderBy("doc_id").collect()]
    shuf = [r["doc_id"] for r in seeded_shuffle(docs, seed="e1").collect()]
    assert sorted(shuf) == base  # permutation: nothing lost or duplicated
    assert shuf != base  # actually shuffled
    # deterministic + partition-invariant
    again = [r["doc_id"] for r in seeded_shuffle(docs.repartition(5), seed="e1").collect()]
    assert again == shuf
    other = [r["doc_id"] for r in seeded_shuffle(docs, seed="e2").collect()]
    assert other != shuf and sorted(other) == base


def test_mixture_rates_for_token_budget(spark):
    from vectrekker_spark.operators.sampling import (
        mixture_rates_for_token_budget,
        stratified_hash_sample,
    )

    # wiki: 10 docs x 10 tokens = 100; crawl: 100 docs x 10 tokens = 1000
    rows = [(i, "w " * 9 + "w", "wiki") for i in range(10)]
    rows += [(100 + i, "c " * 9 + "c", "crawl") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # 50/50 of 200 tokens: wiki wants 100 (its whole supply → rate 1.0),
    # crawl wants 100 of 1000 → rate 0.1
    rates = mixture_rates_for_token_budget(
        df, {"wiki": 0.5, "crawl": 0.5}, token_budget=200
    )
    assert rates == {"wiki": 1.0, "crawl": 0.1}

    # redistribution: 80/20 of 500 → wiki wants 400 but has 100 (capped);
    # the 300-token shortfall refills crawl: (100 + 300)/1000 = 0.4
    rates = mixture_rates_for_token_budget(
        df, {"wiki": 0.8, "crawl": 0.2}, token_budget=500
    )
    assert rates == {"wiki": 1.0, "crawl": 0.4}

    # total supply short of the budget: everything rate-1
    rates = mixture_rates_for_token_budget(
        df, {"wiki": 0.5, "crawl": 0.5}, token_budget=10_000
    )
    assert rates == {"wiki": 1.0, "crawl": 1.0}

    # the rates feed the stratified sampler; realized tokens approximate
    # the target (Bernoulli — exactness is not the contract)
    rates = mixture_rates_for_token_budget(
        df, {"wiki": 0.5, "crawl": 0.5}, token_budget=200
    )
    sampled = stratified_hash_sample(df, rates)
    got = sampled.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    assert by["wiki"] == 10            # rate 1.0 is exact
    assert 4 <= by.get("crawl", 0) <= 20  # ~10 of 100 docs

    # guards
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        mixture_rates_for_token_budget(df, {"wiki": 0.5}, 100)
    with pytest.raises(ValueError, match="token_budget"):
        mixture_rates_for_token_budget(df, {"wiki": 1.0}, -1)
    # a stratum named in shares but absent from the data: rate 0, budget
    # redistributed to the present strata
    rates = mixture_rates_for_token_budget(
        df, {"wiki": 0.5, "books": 0.5}, token_budget=200
    )
    assert rates["books"] == 0.0 and rates["wiki"] == 1.0
