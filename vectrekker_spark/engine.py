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
