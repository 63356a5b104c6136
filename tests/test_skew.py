"""Salted aggregation equals plain aggregation (values), with the hot key
spread across salt partitions (mechanism), and non-decomposable aggregates
rejected loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/orders.parquet")
    aggs = {
        "cnt": (F.count(F.lit(1)), "sum"),
        "total": (F.sum(F.col("o_totalprice").cast("decimal(18,2)")), "sum"),
        "lo": (F.min("o_totalprice"), "min"),
        "hi": (F.max("o_totalprice"), "max"),
    }
    salted = {
        r["o_orderpriority"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in salted_agg(e, "o_orderpriority", aggs, salt=8).collect()
    }
    plain = {
        r["o_orderpriority"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in e.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    hot = spark.range(0, 10000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    out = salted_agg(hot, "k", {"cnt": (F.count(F.lit(1)), "sum")}, salt=8).collect()
    assert out[0]["cnt"] == 10000


def test_non_decomposable_combiner_raises(spark):
    df = spark.range(10).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(df, "k", {"m": (F.avg("v"), "avg")})
