from __future__ import annotations

import math

from pyspark.sql import functions as F

from vectrekker_spark.functions.vector import cosine_sim, dim_ok, l2_normalize, norm
from vectrekker_spark.operators.knn import knn_join, similarity_join, topk_nn


def test_l2_normalize_zero_vector_no_nan(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [3.0, 4.0])], "id long, v array<double>")
    out = {r["id"]: r["n"] for r in df.select("id", l2_normalize("v").alias("n")).collect()}
    assert out[1] == [0.0, 0.0]
    assert [round(x, 6) for x in out[2]] == [0.6, 0.8]


def test_norm_and_cosine(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 1.0], [1.0, 1.0])],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id", norm("a").alias("na"), cosine_sim("a", "b").alias("cs")
        ).collect()
    }
    assert rows[1]["cs"] == 0.0
    assert abs(rows[2]["cs"] - 1.0) < 1e-12
    assert abs(rows[2]["na"] - math.sqrt(2)) < 1e-12


def test_dim_ok(spark):
    df = spark.createDataFrame([(1, [1.0] * 4), (2, [1.0] * 3)], "id long, v array<double>")
    ok = {r["id"]: r["ok"] for r in df.select("id", dim_ok("v", 4).alias("ok")).collect()}
    assert ok == {1: True, 2: False}


def test_topk_deterministic_ties(spark):
    # Three identical corpus vectors: ties must break by id ascending.
    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in (5, 3, 9)], "vec_id long, embedding array<double>"
    )
    out = topk_nn(df, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in out] == [3, 5]


def test_knn_join_self_match_first(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res = knn_join(q, em, k=1).collect()
    assert {r["qid"]: r["vec_id"] for r in res} == {0: 0, 1: 1, 2: 2}
    assert all(abs(r["score"] - 1.0) < 1e-9 for r in res)


def test_similarity_join_ordering_and_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = similarity_join(
        df, df, threshold=0.9,
        left_id="vec_id", left_vec="embedding", right_id="vec_id", right_vec="embedding",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["l_id"], r["r_id"]) == (1, 2) and r["score"] > 0.99


def test_topk_dim_mismatch_raises(spark, sf_dir):
    import pytest as _pytest

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with _pytest.raises(ValueError, match="dim"):
        topk_nn(em, [1.0, 2.0], k=3)


def test_q28_exact_cap_registry_policy(spark, tmp_path, monkeypatch):
    """VERDICT r11 #8: past Q28_EXACT_CAP the registered q28 runs the SAME
    exact kernel over the deterministic vec_id < cap slice; at/below the
    cap it is the full exact join. Equivalence is exactness on the slice:
    the capped result must equal the full run's result restricted to
    l_id/r_id < cap."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vectrekker_spark.queries import vector as V

    rng = np.random.default_rng(11)
    n, dim = 60, 8
    vecs = rng.standard_normal((n, dim))
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "doc_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    d = tmp_path / "sfP"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")

    full = {(r.l_id, r.r_id): r.score
            for r in V.q28_sim_dedup(spark, str(d)).collect()}

    monkeypatch.setattr(V, "Q28_EXACT_CAP", 40)
    capped = {(r.l_id, r.r_id): r.score
              for r in V.q28_sim_dedup(spark, str(d)).collect()}
    expected = {k: v for k, v in full.items() if k[0] < 40 and k[1] < 40}
    assert capped == expected and len(capped) < len(full)

    # at/below the cap: untouched full exact join
    monkeypatch.setattr(V, "Q28_EXACT_CAP", n)
    assert {(r.l_id, r.r_id): r.score
            for r in V.q28_sim_dedup(spark, str(d)).collect()} == full
