"""Engine facade: one object tying session + catalog + operators together.

Entry points (SURVEY.md §3.2): ``Engine.sql`` (Catalyst parser), ``Engine.table``
(DataFrame builder), and the operator helpers re-exported from
``vectrekker_spark.operators``. All three converge on the same logical-plan
pipeline; there is no engine-private IR — Spark's analyzed/optimized plan *is*
the IR (inspect with ``df.explain(True)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectrekker_spark.catalog import DEFAULT_SF_DIR, load_tables, register_views


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._tables = load_tables(spark, sf_dir)
        register_views(spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- operator sugar ---------------------------------------------------
    def knn(self, query_vec, k: int = 10) -> DataFrame:
        from vectrekker_spark.operators.knn import topk_nn

        return topk_nn(self.table("embeddings"), query_vec, k=k)

    def knn_join(self, queries_df: DataFrame, k: int = 5) -> DataFrame:
        from vectrekker_spark.operators.knn import knn_join

        return knn_join(queries_df, self.table("embeddings"), k=k)

    def approx_knn(
        self, queries_df: DataFrame, k: int = 10, n_centroids: int = 16, n_probe: int = 6
    ) -> DataFrame:
        """IVF approximate kNN join (the scale path): kmeans cells with
        multi-assignment; see operators/ann for the recall/cost dials."""
        from vectrekker_spark.operators.ann import ivf_build, ivf_search

        em = self.table("embeddings")
        centroids, assign = ivf_build(em, n_centroids=n_centroids, assign_k=2)
        return ivf_search(queries_df, em, centroids, assign, k=k, n_probe=n_probe)

    def embed(self, df: DataFrame, embedder_factory=None, text_col: str = "text") -> DataFrame:
        """Append an `embedding` column via the pluggable Embedder protocol
        (deterministic hashing embedder unless a factory is given)."""
        from vectrekker_spark.embedder import HashingEmbedder, embed_column

        return embed_column(
            df, embedder_factory or (lambda: HashingEmbedder()), text_col=text_col
        )
