"""Bucketed-table plan assertions: the write-once-join-forever shuffle
elimination that carries fact-fact joins at 100 TB (sources/sinks.py
write_bucketed/colocated_join). Complements test_sinks.py's self-join check
with cross-table co-location, agg distribution reuse, bucket pruning, and a
value-parity check against the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.plans import formatted_plan, shuffle_count
from vectrekker_spark.sources.sinks import colocated_join, write_bucketed

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(o, "b_orders", "o_custkey", N_BUCKETS, path=str(base / "o"))
    write_bucketed(c, "b_customer", "c_custkey", N_BUCKETS, path=str(base / "c"))
    yield {"orders": "b_orders", "customer": "b_customer"}
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    j = colocated_join(
        spark,
        bucketed["customer"],
        bucketed["orders"],
        on=F.col("c_custkey") == F.col("o_custkey"),
    )
    plan = formatted_plan(j)
    assert "SortMergeJoin" in plan, plan
    assert shuffle_count(j) == 0, plan


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed):
    agg = (
        spark.table(bucketed["orders"])
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert shuffle_count(agg) == 0, formatted_plan(agg)


def test_bucket_pruning_on_point_filter(spark, bucketed):
    # autoBucketedScan drops the bucketed layout when no join/agg needs the
    # distribution — which also forfeits pruning. A key-lookup workload at
    # scale disables it to read 1/N of the files; mirror that here.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        probe = spark.table(bucketed["orders"]).filter(F.col("o_custkey") == 42)
        plan = formatted_plan(probe)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    got = (
        spark.table(bucketed["customer"])
        .hint("merge")
        .join(
            spark.table(bucketed["orders"]),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(got.collect()) == sorted(want.collect())

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
