"""Remaining UDF-surface coverage (SURVEY.md §2.2 'UDF surface'): the
row-at-a-time python udf (exists, deliberately off the hot path) and the
GROUPED_AGG pandas_udf, each checked against the equivalent expression."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_python_udf_matches_expression(spark, sf_dir):
    # slow-path scalar udf — correct, but the engine uses expressions for
    # this everywhere (see functions/text.py); this pins the API works.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    py_rev = F.udf(lambda s: s[::-1], "string")
    rows = docs.select(
        "doc_id",
        py_rev("text").alias("u"),
        F.reverse("text").alias("e"),
    ).collect()
    assert all(r["u"] == r["e"] for r in rows)


def test_grouped_agg_pandas_udf(spark, sf_dir):
    @F.pandas_udf("double")
    def char_weighted_mean(n_chars: pd.Series) -> float:
        return float(n_chars.astype("float64").mean())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["lang"]: round(r["m"], 6)
        for r in docs.groupBy("lang").agg(char_weighted_mean("n_chars").alias("m")).collect()
    }
    want = {
        r["lang"]: round(r["m"], 6)
        for r in docs.groupBy("lang").agg(F.avg("n_chars").alias("m")).collect()
    }
    assert got == want

import pytest  # noqa: E402  (slow marker below)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
