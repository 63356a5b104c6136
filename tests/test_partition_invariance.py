"""Results must be invariant to physical partitioning — the property that
makes local[N] correctness transfer to a 1000-executor cluster. Exercises the
operators with per-partition logic (local top-k heaps, Arrow kernels)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.dedup import minhash_signatures, simhash16
from vectrekker_spark.operators.knn import knn_join, similarity_join_blas


@pytest.fixture(scope="module")
def em(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_knn_join_partition_invariant(spark, em):
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = _rows(knn_join(q, em, k=5))
    b = _rows(knn_join(q.repartition(7), em.repartition(13), k=5))
    c = _rows(knn_join(q, em.coalesce(1), k=5))
    assert a == b == c


def test_blas_join_partition_invariant(spark, em):
    kw = dict(left_id="vec_id", left_vec="embedding",
              right_id="vec_id", right_vec="embedding")
    a = _rows(similarity_join_blas(em, em, 0.40, **kw))
    b = _rows(similarity_join_blas(em.repartition(11), em, 0.40, **kw))
    assert a == b


def test_minhash_partition_invariant(spark, docs):
    a = _rows(minhash_signatures(docs))
    b = _rows(minhash_signatures(docs.repartition(9)))
    assert a == b


def test_simhash_partition_invariant(spark, docs):
    a = _rows(simhash16(docs))
    b = _rows(simhash16(docs.repartition(9)))
    assert a == b


def test_repeat_run_determinism(spark, em, docs):
    # same plan executed twice → identical rows (shuffle order must not leak)
    q = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert _rows(knn_join(q, em, k=10)) == _rows(knn_join(q, em, k=10))
    assert _rows(minhash_signatures(docs)) == _rows(minhash_signatures(docs))
