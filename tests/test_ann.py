"""Approximate-NN recall properties (SURVEY.md §2.2 V5): IVF and MLlib LSH
vs the exact brute-force result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.ann import ivf_build, ivf_search, lsh_model, lsh_nn
from vectrekker_spark.operators.knn import knn_join, topk_nn

K = 10
N_QUERIES = 10


@pytest.fixture(scope="module")
def em(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _exact(spark, em):
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res = knn_join(q, em, k=K).collect()
    out: dict[int, set[int]] = {}
    for r in res:
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_vs_exact(spark, em):
    exact = _exact(spark, em)
    centroids, assign = ivf_build(em, n_centroids=10)
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    approx = ivf_search(q, em, centroids, assign, k=K, n_probe=3).collect()
    got: dict[int, set[int]] = {}
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recall = sum(len(got.get(q_, set()) & exact[q_]) for q_ in exact) / (K * len(exact))
    assert recall >= 0.5, f"IVF recall@{K} = {recall}"


def test_lsh_recall_vs_exact(spark, em):
    qvec = em.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact_ids = {r["vec_id"] for r in topk_nn(em, qvec, k=K).collect()}
    model, prepared = lsh_model(em, bucket_length=1.0, num_hash_tables=5)
    approx_ids = {r["vec_id"] for r in lsh_nn(model, prepared, qvec, k=K).collect()}
    recall = len(exact_ids & approx_ids) / K
    assert recall >= 0.5, f"LSH recall@{K} = {recall}"


def test_ivf_assignment_covers_corpus(spark, em):
    _, assign = ivf_build(em, n_centroids=10)
    assert assign.count() == em.count()
    assert assign.select("vec_id").distinct().count() == em.count()


def test_ivf_kmeans_recall(spark, em):
    exact = _exact(spark, em)
    centroids, assign = ivf_build(em, n_centroids=10, method="kmeans")
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    approx = ivf_search(q, em, centroids, assign, k=K, n_probe=3).collect()
    got = {}
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recall = sum(len(got.get(q_, set()) & exact[q_]) for q_ in exact) / (K * len(exact))
    assert recall >= 0.6, f"kmeans-IVF recall@{K} = {recall}"
