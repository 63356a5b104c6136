"""Engine facade: the three entry points (sql / table / operator sugar)
converge on the same catalog and return consistent results."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrekker_spark.engine import Engine


def test_engine_entry_points_agree(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    via_sql = eng.sql("SELECT COUNT(*) AS n FROM embeddings").collect()[0]["n"]
    via_table = eng.table("embeddings").count()
    assert via_sql == via_table > 0


def test_engine_knn_and_approx_agree_on_top_hit(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    em = eng.table("embeddings")
    qvec = em.filter(F.col("vec_id") == 0).collect()[0]["embedding"]

    exact = eng.knn(qvec, k=5).collect()
    assert exact[0]["vec_id"] == 0  # self-match first

    q = em.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    approx = eng.approx_knn(q, k=5, n_centroids=4, n_probe=4).collect()
    # probing every cell makes IVF exhaustive → must find the self-match
    assert approx[0]["vec_id"] == 0 and approx[0]["rank"] == 1


def test_engine_ivf_build_is_cached(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    b1 = eng.ivf_index(n_centroids=4)
    b2 = eng.ivf_index(n_centroids=4)
    assert b1 is b2  # one KMeans fit + assignment join per session, not per query
    b3 = eng.ivf_index(n_centroids=8)
    assert b3 is not b1  # different dials → different index


def test_engine_embed_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    df = spark.createDataFrame([(1, "alpha beta gamma")], "id long, text string")
    out = eng.embed(df).collect()
    assert len(out[0]["embedding"]) == 64
