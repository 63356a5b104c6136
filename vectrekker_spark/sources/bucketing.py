"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
clicks ⋈ impressions) is the shuffle of both sides. Bucketing eliminates it:
each table is written once, pre-hash-partitioned into N buckets on the join
key (and optionally sorted within buckets), so a later join on that key can
zip bucket i with bucket i — no exchange of either side, ever again. One
write-time shuffle is amortized over every subsequent join/aggregation on
the key; for tables joined daily this is the single biggest shuffle win
available on Spark.

Mechanics used here (all public Spark API):
- ``df.write.bucketBy(n, key).sortBy(key).saveAsTable(name)`` — V1 bucketed
  parquet write; metadata (bucket count/cols) lives in the session catalog
  (or a real metastore on a cluster).
- Join of two tables bucketed on the join key with the SAME bucket count →
  SortMergeJoin with zero Exchange (Spark requires matching counts; write
  cooperating tables with one shared N).
- ``groupBy(bucket_key)`` on a bucketed table → aggregation with zero
  Exchange (hash partitioning already satisfies the distribution).
- Point/IN filters on the bucket key prune buckets at scan time
  (``SelectedBucketsCount`` in the plan): a key lookup reads 1/N of files.

Sizing guidance for the 100 TB case: pick N ≈ table_bytes / 256 MB rounded
to the cluster's task parallelism; all tables that join together must share
N (or a divisor, via ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

tests/test_bucketing.py asserts the zero-Exchange plans; the helpers return
plain DataFrames so callers compose them like any other source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a bucketed parquet table registered as ``table``.

    ``path`` makes it an external table (data at the given location);
    omitted, it lands in the session warehouse dir. ``sort=True`` sorts
    within buckets by the bucket column, letting later merge joins skip
    their sort. Returns the table name for chaining.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    The merge hint pins SortMergeJoin so the bucket layout is actually used:
    on the small local fixtures Spark would otherwise pick a broadcast join
    (also shuffle-free, but proving nothing about co-location); at real
    scale neither side fits broadcast and SMJ is what the optimizer picks
    anyway, with zero Exchange thanks to the matching bucketing.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on, how)
