"""Approximate nearest-neighbor search (SURVEY.md §2.2 V5) — the scale path
for the reference's top-k cosine query when brute force (operators/knn.py)
is too expensive.

Two strategies:
- IVF (inverted-file): deterministic coarse centroids → assign every corpus
  vector to its nearest centroid (one kNN join against ~√N centroids) →
  at query time probe only the n_probe nearest cells. The partition-pruning
  idea applied to vector search: at 100 TB the assignment table is written
  partitioned by centroid_id, so a probe reads only its cells' files.
- LSH via Spark MLlib BucketedRandomProjectionLSH on L2-normalized vectors
  (cosine ≡ euclidean on the unit sphere): hash-bucket join, no training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.functions.vector import l2_normalize
from vectrekker_spark.operators.knn import knn_join


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    assign_k: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Build IVF centroids + assignments.

    method="kmeans" (default): seeded MLlib KMeans on L2-normalized vectors
    (spherical-ish) — measurably better cells than stride on every fixture
    (recall@10 0.67-0.83 vs 0.43-0.75 across probe settings), deterministic
    per Spark version (seed=42). method="stride": every ⌈N/k⌉-th id as
    centroid — fully deterministic across engines/versions, used by the
    bench/registry query d10 so BENCH numbers never shift with MLlib.

    assign_k > 1 = multi-assignment: each corpus vector is indexed into its
    assign_k nearest cells. Index grows ×assign_k but boundary vectors stop
    falling between probed cells — measured on the sf0.1 fixture this beats
    spending the same candidate budget on more probes (recall@10 0.90 at
    ~0.64 candidate fraction with k=25/assign 2/probe 8, vs 0.86 at ~0.70
    with single assignment and probe 7 of 10).

    Returns (centroids(cid, cvec), assignments(vec_id, cid); assign_k rows
    per vector when multi-assigned).
    """
    if method == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        prepared = corpus.withColumn(
            "features", array_to_vector(l2_normalize(F.col(vec_col)).cast("array<double>"))
        )
        model = KMeans(k=n_centroids, seed=42, maxIter=20).fit(prepared)
        rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        centroids = corpus.sparkSession.createDataFrame(
            rows, "cid long, cvec array<double>"
        )
    else:
        n = corpus.count()
        stride = max(n // n_centroids, 1)
        centroids = (
            corpus.filter(
                (F.col(id_col) % stride == 0) & (F.col(id_col) / stride < n_centroids)
            )
            .select(
                (F.col(id_col) / stride).cast("long").alias("cid"),
                F.col(vec_col).alias("cvec"),
            )
        )
    assign = knn_join(
        corpus.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
        centroids,
        k=assign_k,
        id_col="cid",
        vec_col="cvec",
    ).select("qid", "vec_id").toDF(id_col, "cid")
    return centroids, assign


def ivf_search(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells per query, brute-force within them.

    Candidate set is only the probed cells' vectors — the crossJoin blowup
    never happens. Returns (qid, vec_id, score, rank)."""
    probes = knn_join(queries, centroids, k=n_probe, id_col="cid", vec_col="cvec").select(
        "qid", F.col("vec_id").alias("cid")
    )
    cand_ids = probes.join(assignments, "cid").select("qid", id_col).distinct()
    cands = cand_ids.join(corpus, id_col).join(
        queries, "qid"
    )  # (qid, vec_id, embedding, qvec) — only probed-cell rows survive
    from vectrekker_spark.functions.vector import cosine_sim
    from pyspark.sql import Window

    scored = cands.select(
        "qid",
        F.col(id_col),
        F.round(cosine_sim(vec_col, "qvec"), 6).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "score", "rank")
    )


def quantized_rerank_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    coarse_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage kNN: int8 coarse search, full-precision re-rank.

    Stage 1 scans the 4×-smaller quantized corpus (operators/quantize) for
    each query's top coarse_factor·k candidates — at 100 TB this is the scan
    whose IO the quantization exists to cut. Stage 2 joins only those
    candidates back to the full-precision vectors and re-ranks to the final
    top-k, so the reported scores are exact. Recall loss is bounded by the
    int8 rounding error (~1e-3 cosine on 64-dim fixtures) against a
    coarse_factor× headroom — measured ≥0.95 recall@10 at coarse_factor=4.

    Returns (qid, id_col, score, rank) with exact full-precision scores.
    """
    from vectrekker_spark.functions.vector import cosine_sim
    from vectrekker_spark.operators.quantize import dequantize_int8, quantize_int8
    from pyspark.sql import Window

    deq = dequantize_int8(
        quantize_int8(corpus.select(id_col, vec_col), vec_col=vec_col)
    ).select(id_col, F.col("embedding_deq").alias(vec_col))
    coarse = knn_join(
        queries, deq, k=k * coarse_factor, id_col=id_col, vec_col=vec_col
    ).select("qid", F.col("vec_id").alias(id_col))
    cands = coarse.join(corpus.select(id_col, vec_col), id_col).join(queries, "qid")
    scored = cands.select(
        "qid",
        F.col(id_col),
        F.round(cosine_sim(vec_col, "qvec"), 6).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "score", "rank")
    )


def lsh_model(
    corpus: DataFrame,
    bucket_length: float = 0.5,
    num_hash_tables: int = 10,
    vec_col: str = "embedding",
):
    """Fit a seeded BucketedRandomProjectionLSH on L2-normalized vectors.
    Returns (model, transformed_corpus) with a `features` ml-vector column.

    Defaults tuned on the 64-dim fixtures: 10 hash tables gives recall@10 =
    1.0 vs exact top-k for every bucket_length in [0.5, 2.0] (3 tables gave
    ~0.5-0.9). More tables = more candidate-union work per query, the usual
    LSH recall/cost dial."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    prepared = corpus.withColumn(
        "features", array_to_vector(l2_normalize(F.col(vec_col)).cast("array<double>"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    return lsh.fit(prepared), prepared


def lsh_nn(model, prepared: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id") -> DataFrame:
    """Approx top-k via LSH; cosine similarity recovered from the euclidean
    distance on the unit sphere: cos = 1 - d²/2."""
    import numpy as np
    from pyspark.ml.linalg import Vectors

    q = np.asarray(query_vec, dtype=np.float64)
    nrm = np.sqrt((q * q).sum())
    if nrm > 0:
        q = q / nrm
    res = model.approxNearestNeighbors(prepared, Vectors.dense(q), k)
    return res.select(
        F.col(id_col),
        F.round(1.0 - F.col("distCol") * F.col("distCol") / 2.0, 6).alias("score"),
    )
