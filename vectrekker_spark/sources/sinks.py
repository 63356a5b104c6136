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


def compact_parquet(
    spark, path: str, target_file_mb: int = 256, sort_col: str | None = None
) -> int:
    """Rewrite a parquet dataset into ~target-sized files (small-files
    compaction — incremental MERGE runs accrete small files; at 100 TB
    unmanaged small files destroy scan throughput). Optionally sort for
    better column compression + row-group pruning. Returns new file count."""
    import math
    import os as _os

    from vectrekker_spark.pipeline import _atomic_replace

    df = spark.read.parquet(path)
    size_b = sum(
        _os.path.getsize(_os.path.join(dp, f))
        for dp, _, fs in _os.walk(path)
        for f in fs
    )
    n_files = max(1, math.ceil(size_b / (target_file_mb * 1024 * 1024)))
    out = (
        df.sort(sort_col).coalesce(n_files)
        if sort_col
        else df.repartition(n_files)
    )
    _atomic_replace(out, path)
    return n_files
