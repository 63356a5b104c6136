"""approx_count_distinct property (SURVEY.md §2.2): within 5% of exact."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = o.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.05


def test_approx_count_distinct_grouped(spark, sf_dir):
    from vectrekker_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) <= 0.05


def test_percentile_approx_close_to_exact(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.01
