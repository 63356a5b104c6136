"""Incremental change detection and upsert — the reference's core semantic
loop made set-oriented (SURVEY.md §2.1 D1–D3, K2; §2.2 P1/P2).

Reference semantics preserved exactly (`vectrekker/main.py:106-111,143-147`):
- unknown path ⇒ cached mtime 0 (every new file selected)
- strictly-greater comparison (`>`, not `>=`) on int-second mtimes
- state written only after the sink write succeeds (at-least-once)

At scale: the state table is keyed by path; the delta join broadcasts state
when small, otherwise it's a shuffle-hash join on the key. With streaming
(vectrekker_spark.streaming) the file-source checkpoint replaces the state
table natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_changes(
    scan: DataFrame,
    state: DataFrame,
    key: str = "path",
    scan_ts: str = "mtime",
    state_ts: str = "last_edit_time",
) -> DataFrame:
    """Rows of `scan` that are new or strictly newer than `state`.

    ≙ `scan LEFT JOIN state ON key WHERE coalesce(state.ts, 0) < scan.ts`
    (the reference's per-file loop at `vectrekker/main.py:143-147`,
    set-oriented). Output: all scan columns + `cached_ts`.
    """
    st = state.select(F.col(key), F.col(state_ts).alias("__cached_ts"))
    return (
        scan.join(st, key, "left")
        .withColumn("cached_ts", F.coalesce(F.col("__cached_ts"), F.lit(0)))
        .drop("__cached_ts")
        .where(F.col("cached_ts") < F.col(scan_ts))
    )


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins MERGE: update rows replace base rows on `key`;
    unmatched update rows are inserts (`INSERT OR REPLACE` semantics of
    `vectrekker/main.py:113-123`).

    Implemented as union + per-key row_number so it works on plain parquet
    (no Delta dependency); on a real lakehouse this maps 1:1 to
    ``MERGE INTO base USING updates``. One shuffle on the key.
    """
    tagged = updates.withColumn("__pri", F.lit(0)).unionByName(
        base.withColumn("__pri", F.lit(1))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("__pri")
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__pri", "__rn")
    )


def merge_upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int = 64,
) -> list[int]:
    """Partition-aware MERGE into a hash-bucketed parquet table.

    The table lives partitioned by `__bucket = pmod(xxhash64(key), n_buckets)`.
    A merge then:
      1. computes the buckets the updates touch (distinct over the delta),
      2. reads ONLY those partitions of the base (partition pruning),
      3. merges last-writer-wins within them,
      4. rewrites ONLY those partition directories (dynamic partition
         overwrite) — untouched buckets are never read or written.

    Merge cost scales with the delta, not the table: the property that makes
    continuous ingestion into a 100 TB index viable without Delta/Iceberg.
    Returns the list of rewritten buckets.
    """
    upd = updates.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets))
    )
    import os

    if not os.path.exists(path):
        upd.write.mode("overwrite").partitionBy("__bucket").parquet(path)
        return sorted(r[0] for r in upd.select("__bucket").distinct().collect())

    buckets = [int(r[0]) for r in upd.select("__bucket").distinct().collect()]
    base_subset = spark.read.parquet(path).filter(F.col("__bucket").isin(buckets))
    merged = merge_upsert(base_subset, upd, key)
    # Break lineage before overwriting partitions we just read from.
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("__bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(buckets)


def read_partitioned_table(spark, path: str) -> DataFrame:
    """Read a bucketed table written by merge_upsert_partitioned, hiding the
    internal __bucket column."""
    return spark.read.parquet(path).drop("__bucket")


def write_state(df: DataFrame, path: str, key: str, ts_col: str) -> None:
    """Persist the (key, ts) state table. Overwrite of a compact table —
    the batch analog of the reference's per-file SQLite write-back, committed
    once per run *after* the sink write (at-least-once ordering)."""
    df.select(F.col(key), F.col(ts_col)).write.mode("overwrite").parquet(path)
