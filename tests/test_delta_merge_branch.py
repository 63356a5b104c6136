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
