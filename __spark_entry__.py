"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: top-10 cosine NN of vector 0 (the query the
                reference's Pinecone index exists to answer; SURVEY.md §0, M1).
queries()     — every implemented operator from SURVEY.md §2, one callable per
                name, backed by vectrekker_spark.queries registry.
oracle_sql()  — matching DuckDB SQL for each registered query (all 50 —
                even the stride-IVF ANN pipeline is expressed as
                window/join SQL since r5).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectrekker_spark.queries import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_specs()["q22_topk_nn"]
    return spec.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
