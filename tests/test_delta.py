"""Reference-parity semantics for incremental delta + merge
(vectrekker/main.py:106-111, :143-147, :113-123 — see SURVEY.md §2.1)."""

from __future__ import annotations

from vectrekker_spark.operators.delta import detect_changes, merge_upsert


def test_detect_changes_reference_semantics(spark):
    scan = spark.createDataFrame(
        [("a", 100), ("b", 200), ("c", 300), ("d", 400)], "path string, mtime long"
    )
    state = spark.createDataFrame(
        [("a", 100), ("b", 150), ("c", 350)], "path string, last_edit_time long"
    )
    out = {r["path"]: r["cached_ts"] for r in detect_changes(scan, state).collect()}
    # a: equal mtime → NOT selected (strict >, main.py:146)
    # b: newer → selected; c: older than cache → not; d: unknown → cached 0, selected
    assert out == {"b": 150, "d": 0}


def test_merge_upsert_last_writer_wins(spark):
    base = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    updates = spark.createDataFrame([("b", 20), ("c", 30)], "id string, v int")
    out = {r["id"]: r["v"] for r in merge_upsert(base, updates, "id").collect()}
    assert out == {"a": 1, "b": 20, "c": 30}


def test_merge_upsert_idempotent(spark):
    base = spark.createDataFrame([("a", 1)], "id string, v int")
    updates = spark.createDataFrame([("a", 5)], "id string, v int")
    once = merge_upsert(base, updates, "id")
    twice = merge_upsert(once, updates, "id")
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))
