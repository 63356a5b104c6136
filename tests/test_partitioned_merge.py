"""Partition-aware MERGE: correctness + the only-touched-buckets-rewritten
property (delta-proportional merge cost)."""

from __future__ import annotations

import os

from vectrekker_spark.operators.delta import (
    merge_upsert_partitioned,
    read_partitioned_table,
)


def _bucket_mtimes(path):
    return {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("__bucket=")
    }


def test_partitioned_merge_values(spark, tmp_path):
    path = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "id long, v string"
    )
    merge_upsert_partitioned(spark, path, base, key="id", n_buckets=16)
    upd = spark.createDataFrame(
        [(5, "NEW5"), (999, "NEW999")], "id long, v string"
    )
    touched = merge_upsert_partitioned(spark, path, upd, key="id", n_buckets=16)
    out = {r["id"]: r["v"] for r in read_partitioned_table(spark, path).collect()}
    assert out[5] == "NEW5" and out[999] == "NEW999" and out[6] == "v6"
    assert len(out) == 201
    assert 1 <= len(touched) <= 2


def test_only_touched_buckets_rewritten(spark, tmp_path):
    path = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], "id long, v string"
    )
    merge_upsert_partitioned(spark, path, base, key="id", n_buckets=16)
    before = _bucket_mtimes(path)
    assert len(before) == 16  # 500 keys cover all 16 buckets

    import time

    time.sleep(1.1)  # ensure mtime resolution separates the writes
    upd = spark.createDataFrame([(42, "CHANGED")], "id long, v string")
    touched = merge_upsert_partitioned(spark, path, upd, key="id", n_buckets=16)
    after = _bucket_mtimes(path)

    rewritten = {d for d in after if after[d] != before[d]}
    assert rewritten == {f"__bucket={b}" for b in touched}
    assert len(touched) == 1  # one key → one bucket rewritten, 15 untouched
