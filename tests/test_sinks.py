"""Partitioned/bucketed sink layout tests: pruning visible in the plan,
bucketed self-join without a shuffle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vectrekker_spark.plans import formatted_plan, shuffle_count
from vectrekker_spark.sources.sinks import write_bucketed, write_partitioned


def test_partitioned_write_enables_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    )  # hive-style layout on disk

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = formatted_plan(back)
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_test")
    write_bucketed(docs, "docs_bucketed_test", bucket_col="doc_id", n_buckets=4)
    t = spark.table("docs_bucketed_test")
    joined = t.alias("a").join(t.alias("b"), "doc_id").filter(F.col("a.lang") == "en")
    # same-bucketed self-join: no Exchange for the join
    assert shuffle_count(joined) == 0, formatted_plan(joined)
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS docs_bucketed_test")


def test_compact_parquet(spark, sf_dir, tmp_path):
    from vectrekker_spark.sources.sinks import compact_parquet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "frag.parquet")
    docs.repartition(37).write.parquet(out)  # fragment into many small files
    before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    n = compact_parquet(spark, out, target_file_mb=256)
    after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert before == 37 and after == n == 1
    assert spark.read.parquet(out).count() == docs.count()


def test_write_manifest_counts_and_idempotence(spark, tmp_path):
    import json

    from vectrekker_spark.sources.sinks import write_manifest, write_shards

    df = spark.createDataFrame([(i, f"t{i}") for i in range(250)], "id long, t string")
    out = str(tmp_path / "shards")
    write_shards(df.repartition(1), out, rows_per_shard=100)
    totals = write_manifest(spark, out)
    assert totals["rows"] == 250 and totals["files"] == 3  # 100+100+50

    lines = [json.loads(x) for x in open(f"{out}/_manifest.json")]
    assert lines[-1] == dict(totals)
    assert sum(e["rows"] for e in lines[:-1]) == 250
    assert all(e["bytes"] > 0 for e in lines[:-1])

    # re-running never counts its own manifest (or _SUCCESS) as a shard
    totals2 = write_manifest(spark, out)
    assert totals2 == totals


def test_write_manifest_handles_spaces_in_path(spark, tmp_path):
    from vectrekker_spark.sources.sinks import write_manifest, write_shards

    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    out = str(tmp_path / "my shards")  # input_file_name percent-encodes this
    write_shards(df.repartition(1), out, rows_per_shard=100)
    totals = write_manifest(spark, out)
    assert totals["rows"] == 10 and totals["bytes"] > 0  # sizes resolved

import pytest  # noqa: E402  (slow marker below)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
