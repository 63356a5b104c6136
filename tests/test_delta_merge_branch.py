"""Exercise the lakehouse (Delta MERGE) branch of P2 (r7 verdict #5).

delta-spark is absent here, so `merge_upsert_delta` runs against
tests/fake_delta.py — a thin fake of the exact DeltaTable.merge builder
surface the operator touches. The tests assert (a) the generated
condition/clauses are the canonical upsert MERGE, (b) under textbook MERGE
semantics (implemented independently in the fake) the result row-set equals
the parquet fallback `merge_upsert` on the q29 fixture shape, for BOTH
fallback strategies, and (c) the operator's pre-merge dedup is load-bearing
(Delta raises on multiple source rows matching one target row — the fake
mirrors that).
"""

from __future__ import annotations

import sys
import types

import pytest

import fake_delta


@pytest.fixture()
def with_fake_delta(monkeypatch):
    try:
        import delta.tables  # noqa: F401

        pytest.skip("real delta-spark present; run the branch for real")
    except ImportError:
        pass
    pkg = types.ModuleType("delta")
    tables = types.ModuleType("delta.tables")
    tables.DeltaTable = fake_delta.DeltaTable
    pkg.tables = tables
    monkeypatch.setitem(sys.modules, "delta", pkg)
    monkeypatch.setitem(sys.modules, "delta.tables", tables)
    fake_delta.DeltaTable.last = None
    yield


def _q29_fixture(spark, sf_dir):
    """The q29 shape: orders base minus every 7th key; every 3rd key updated
    with bumped totalprice and status 'U' — PLUS duplicate update keys (two
    conflicting rows for some keys) so the dedup rule is exercised."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    upd1 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    # conflicting second version for every 6th key (subset of every 3rd)
    upd2 = o.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("V").alias("o_orderstatus"),
        (F.col("o_totalprice") + 2000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return base, upd1.unionByName(upd2)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_merge_matches_parquet_fallback(spark, sf_dir, tmp_path, with_fake_delta):
    from vectrekker_spark.operators.delta import (
        delta_available,
        merge_upsert,
        merge_upsert_delta,
    )

    assert delta_available()  # the injected package satisfies the probe

    base, updates = _q29_fixture(spark, sf_dir)
    path = str(tmp_path / "delta_table")
    base.write.parquet(path)

    merge_upsert_delta(spark, path, updates, "o_orderkey")

    got = _rows(spark.read.parquet(path))
    want_anti = _rows(merge_upsert(base, updates, "o_orderkey", strategy="anti"))
    want_window = _rows(merge_upsert(base, updates, "o_orderkey", strategy="window"))
    assert got == want_anti
    assert got == want_window  # and the two fallback strategies agree

    # the generated statement is the canonical upsert MERGE
    tbl = fake_delta.DeltaTable.last
    assert tbl is not None and tbl.path == path
    assert tbl.executed_merges == [
        {
            "condition": "b.o_orderkey = u.o_orderkey",
            "clauses": ["whenMatchedUpdateAll", "whenNotMatchedInsertAll"],
        }
    ]


def test_premerge_dedup_is_load_bearing(spark, sf_dir, tmp_path, with_fake_delta):
    # updates_unique=True skips the dedup; with actually-duplicate keys the
    # merge must then raise exactly as Delta would — proving the default
    # path's dedup is what makes duplicate-key deltas mergeable
    from vectrekker_spark.operators.delta import merge_upsert_delta

    base, updates = _q29_fixture(spark, sf_dir)
    path = str(tmp_path / "delta_table2")
    base.write.parquet(path)

    with pytest.raises(fake_delta.MultipleSourceRowsError):
        merge_upsert_delta(spark, path, updates, "o_orderkey", updates_unique=True)

    # target untouched after the failed merge
    assert _rows(spark.read.parquet(path)) == _rows(base)


@pytest.fixture()
def parquet_append(monkeypatch):
    """Route the grouped merge's transaction 2 through a parquet append —
    DataFrameWriter.format('delta') needs the real JVM extension the fake
    can't intercept; everything MERGE-shaped still runs through the fake
    builder."""
    import vectrekker_spark.operators.delta as dmod

    monkeypatch.setattr(
        dmod, "_delta_append",
        lambda df, path: df.write.mode("append").parquet(path),
    )
    yield


def test_grouped_delta_merge_matches_partitioned_sink(
    spark, tmp_path, with_fake_delta, parquet_append
):
    """REPLACE-GROUP semantics across both branches: same base, same new
    rows (doc B re-chunked from 3 rows to 1, doc D quarantined away, doc E
    new) must leave the identical index row-set."""
    from vectrekker_spark.operators.delta import (
        merge_upsert_delta_grouped,
        merge_upsert_partitioned,
        read_partitioned_table,
    )

    base = spark.createDataFrame(
        [("a#0", "a", [1.0]), ("b#0", "b", [2.0]), ("b#1", "b", [2.1]),
         ("b#2", "b", [2.2]), ("c#0", "c", [3.0]), ("d#0", "d", [4.0])],
        "id string, doc_path string, embedding array<double>",
    )
    new_rows = spark.createDataFrame(
        [("b#0", "b", [9.0]), ("e#0", "e", [5.0])],
        "id string, doc_path string, embedding array<double>",
    )
    delete_groups = spark.createDataFrame([("d",)], "doc_path string")

    dpath = str(tmp_path / "delta_idx")
    base.write.parquet(dpath)
    merge_upsert_delta_grouped(
        spark, dpath, new_rows, group_col="doc_path", delete_groups=delete_groups
    )
    got = sorted(tuple(r) for r in spark.read.parquet(dpath).collect())

    ppath = str(tmp_path / "parquet_idx")
    merge_upsert_partitioned(spark, ppath, base, key="id", group_col="doc_path")
    merge_upsert_partitioned(
        spark, ppath, new_rows, key="id", group_col="doc_path",
        delete_groups=delete_groups,
    )
    want = sorted(tuple(r) for r in read_partitioned_table(spark, ppath).collect())

    assert got == want
    # stale chunk ids b#1/b#2 and the quarantined doc d are gone
    ids = {r[0] for r in got}
    assert ids == {"a#0", "b#0", "c#0", "e#0"}

    # the delete-merge used the distinct touched-group set on doc_path
    tbl = fake_delta.DeltaTable.last
    assert tbl.executed_merges == [
        {"condition": "b.doc_path = u.doc_path", "clauses": ["whenMatchedDelete"]}
    ]


def test_pipeline_delta_branch_equals_parquet_branch(
    spark, tmp_path, with_fake_delta, parquet_append
):
    """run_pipeline(index_format='delta') drives the lakehouse sink through
    the product surface and must build the same index as the parquet
    branch — including incremental re-embedding of a touched file."""
    import os

    from vectrekker_spark.operators.delta import read_partitioned_table
    from vectrekker_spark.pipeline import PipelineConfig, run_pipeline

    content = tmp_path / "content"
    content.mkdir()
    (content / "a.md").write_text("alpha document about sparks and vectors")
    (content / "b.md").write_text("beta document with different words")

    def cfg(sub: str, fmt: str) -> PipelineConfig:
        d = tmp_path / sub
        d.mkdir()
        return PipelineConfig(
            content_dir=str(content),
            state_path=str(d / "state.parquet"),
            index_path=str(d / "index.parquet"),
            quarantine_path=str(d / "quarantine.parquet"),
            index_format=fmt,
        )

    cd, cp = cfg("delta", "delta"), cfg("parquet", "parquet")
    r1d, r1p = run_pipeline(spark, cd), run_pipeline(spark, cp)
    assert r1d == r1p and r1d["indexed"] == 2

    # touch a file → exactly one re-embed through BOTH sinks
    a = content / "a.md"
    st = a.stat()
    a.write_text("alpha document rewritten with new content")
    os.utime(a, (st.st_atime, st.st_mtime + 2))
    r2d, r2p = run_pipeline(spark, cd), run_pipeline(spark, cp)
    assert r2d == r2p and r2d["indexed"] == 1

    rows_d = sorted(
        (r["id"], tuple(r["embedding"]))
        for r in spark.read.parquet(cd.index_path).collect()
    )
    rows_p = sorted(
        (r["id"], tuple(r["embedding"]))
        for r in read_partitioned_table(spark, cp.index_path).collect()
    )
    assert rows_d == rows_p and len(rows_d) == 2


def test_delta_format_without_library_fails_fast(spark, tmp_path):
    """index_format='delta' without delta-spark must raise ImportError at
    run START — before any scan/embed work or quarantine side effect, and
    not as a raw DATA_SOURCE_NOT_FOUND from the writer (review finding)."""
    try:
        import delta.tables  # noqa: F401

        pytest.skip("real delta-spark present")
    except ImportError:
        pass
    from vectrekker_spark.pipeline import PipelineConfig, run_pipeline

    content = tmp_path / "content"
    content.mkdir()
    (content / "a.md").write_text("doc")
    cfg = PipelineConfig(
        content_dir=str(content),
        state_path=str(tmp_path / "state.parquet"),
        index_path=str(tmp_path / "index.parquet"),
        index_format="delta",
    )
    with pytest.raises(ImportError, match="delta-spark"):
        run_pipeline(spark, cfg)
    assert not (tmp_path / "state.parquet").exists()  # nothing committed

    cfg2 = PipelineConfig(
        content_dir=str(content),
        state_path=str(tmp_path / "state.parquet"),
        index_path=str(tmp_path / "index.parquet"),
        index_format="iceberg",
    )
    with pytest.raises(ValueError, match="index_format"):
        run_pipeline(spark, cfg2)


def test_grouped_delta_merge_keys_delete_groups_by_name(
    spark, tmp_path, with_fake_delta, parquet_append
):
    # a delete_groups frame with an extra leading column must still key on
    # the NAMED group column (review finding: positional columns[0])
    from vectrekker_spark.operators.delta import merge_upsert_delta_grouped

    base = spark.createDataFrame(
        [("a#0", "a", [1.0]), ("d#0", "d", [4.0])],
        "id string, doc_path string, embedding array<double>",
    )
    new_rows = spark.createDataFrame(
        [], "id string, doc_path string, embedding array<double>"
    )
    delete_groups = spark.createDataFrame(
        [(9001, "d")], "n_tokens long, doc_path string"
    )
    path = str(tmp_path / "byname")
    base.write.parquet(path)
    merge_upsert_delta_grouped(
        spark, path, new_rows, group_col="doc_path", delete_groups=delete_groups
    )
    ids = {r["id"] for r in spark.read.parquet(path).collect()}
    assert ids == {"a#0"}  # doc d retired; 9001 never misread as a group

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
