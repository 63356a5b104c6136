"""Sink writers with the partitioning/bucketing layout a 100 TB corpus needs.

- `write_partitioned`: hive-style partition directories → partition pruning
  on read (queries filtering the partition column scan only their dirs).
- `write_bucketed`: bucketed+sorted table on the join key → co-located,
  shuffle-free joins between tables bucketed the same way.
- `write_index`: the vector-index layout — embeddings bucketed by id so the
  MERGE upsert and point lookups shuffle nothing (the engine's analog of the
  reference's Pinecone index, vectrekker/main.py:162-167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed, sorted managed table. Joins/aggregations on
    `bucket_col` between same-bucketed tables skip the shuffle entirely."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_index(df: DataFrame, table: str, n_buckets: int = 16) -> None:
    write_bucketed(df, table, bucket_col="id", n_buckets=n_buckets)
