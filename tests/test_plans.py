"""Physical-plan assertions (SURVEY.md §4.2): these encode the 100 TB scale
requirements the value-oracle can't see — pushdown reaching the scan, column
pruning, small dims broadcast, no superfluous shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrekker_spark.plans import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    shuffle_count,
    uses_broadcast_join,
)
from vectrekker_spark.queries.relational import (
    q02_filter,
    q03_agg,
    q05_broadcast_join,
    q12_rank_window,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = q02_filter(spark, sf_dir)
    assert has_pushed_filters(df), formatted_plan(df)


def test_column_pruning(spark, sf_dir):
    df = q03_agg(spark, sf_dir)
    cols = read_schema_columns(df)
    # 16-col lineitem scan must read only the 5 referenced columns
    assert set(cols) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"
    }, cols


def test_small_dim_join_is_broadcast(spark, sf_dir):
    df = q05_broadcast_join(spark, sf_dir)
    assert uses_broadcast_join(df)
    # the join itself must not sort-merge (no shuffle of either side)
    assert "SortMergeJoin" not in formatted_plan(df)


def test_projection_only_scan_prunes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    assert set(read_schema_columns(li)) == {"l_orderkey", "l_quantity"}


def test_window_single_shuffle(spark, sf_dir):
    # ranking window should shuffle once on the partition key, not more
    df = q12_rank_window(spark, sf_dir)
    assert shuffle_count(df) <= 2  # partitionBy exchange + final orderBy


def test_range_join_is_bucket_equi_not_nested_loop(spark, sf_dir):
    # q09's bounded interval join must compile to a hash equi join on
    # (key, bucket) — a BroadcastNestedLoopJoin/CartesianProduct here is the
    # O(per-key^2) plan that dies at 100 TB
    from vectrekker_spark.queries.relational import q09_range_join

    plan = formatted_plan(q09_range_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_asof_join_single_key_shuffle(spark, sf_dir):
    # d22's as-of join is union + ONE hash shuffle on the key + window; a
    # second join-shaped shuffle would mean the plan regressed to range join
    from vectrekker_spark.queries.relational import d22_asof_join

    df = d22_asof_join(spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    # key exchange + final orderBy exchange (+ AQE may add a coalesce read)
    assert shuffle_count(df) <= 3, plan


def test_agg_has_no_roundrobin_prespread(spark, sf_dir):
    # q03's partial aggregation shrinks the scan map-side; a round-robin
    # pre-spread would shuffle 600k full rows to save nothing (measured 2×
    # slower). Pin the plan: agg exchange + final sort only, no
    # RoundRobinPartitioning anywhere.
    df = q03_agg(spark, sf_dir)
    plan = formatted_plan(df)
    assert "RoundRobinPartitioning" not in plan, plan
    assert shuffle_count(df) <= 2  # groupBy hash exchange + range sort


def test_tpch_joins_have_no_roundrobin_prespread(spark, sf_dir):
    from vectrekker_spark.queries.tpch import t03_shipping_priority

    plan = formatted_plan(t03_shipping_priority(spark, sf_dir))
    assert "RoundRobinPartitioning" not in plan, plan


def test_d12_serial_plan_has_zero_exchanges(spark, sf_dir):
    # On a single small local file d12 picks the serial plan: one scan task
    # computes both regexp counts and sorts in-task — no shuffle at all.
    from vectrekker_spark.queries.text import d12_bpe_tokens

    df = d12_bpe_tokens(spark, sf_dir)
    assert shuffle_count(df) == 0, formatted_plan(df)


def test_ordered_barrier_sits_below_sort(spark, sf_dir):
    # util.ordered must put a hash exchange (the barrier) BELOW the range
    # sort so sampling reads materialized shuffle output instead of
    # re-running the chain. formatted_plan's detail section lists nodes
    # bottom-up by id, so the hash exchange (deeper) must appear BEFORE the
    # range exchange; a regression that sorts first and repartitions after
    # (re-introducing the sampling double-execution) reverses the order.
    from vectrekker_spark.queries.relational import q16_string_fns

    plan = formatted_plan(q16_string_fns(spark, sf_dir)).lower()
    assert "hashpartitioning" in plan and "rangepartitioning" in plan, plan
    assert plan.index("hashpartitioning") < plan.index("rangepartitioning"), plan


def test_small_local_false_for_directory_tables(tmp_path):
    # a directory-backed (multi-split) table must NEVER engage the serial
    # gates: tb1's coalesce(1) on a real multi-file table would serialize a
    # distributed scan. (Found by the sf1 validation run — os.path.getsize
    # on a directory returned the tiny dir-entry size and read as "small".)
    import os

    from vectrekker_spark.queries.util import small_local

    d = tmp_path / "orders.parquet"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"x")
    assert not small_local(str(tmp_path), "orders")
    # a small single FILE still engages the serial plans
    f = tmp_path / "nation.parquet"
    f.write_bytes(b"x")
    assert small_local(str(tmp_path), "nation")
    assert not small_local(str(tmp_path), "missing")


def test_ordered_barrier_width_follows_session(spark, sf_dir):
    # the barrier must be as wide as the session's shuffle setting — a fixed
    # small constant would funnel a corpus-sized result (one row per doc at
    # 100 TB) through a handful of tasks. AQE coalesces it back down when
    # the result is small, so width is free locally.
    import re

    from vectrekker_spark.queries.util import ordered

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = ordered(
        spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey"),
        "p_partkey",
    )
    plan = formatted_plan(df).lower()
    assert re.search(rf"hashpartitioning\([^)]*,\s*{parts}\)", plan), plan


def test_bm25_scans_text_once(spark, sf_dir):
    """A bare bm25_scores call must scan the TEXT column exactly once — the
    skinny (id, dl, hit_toks) intermediate is persisted by default, so the
    avgdl/N aggregate, the tf branch, and the zero-fill id join all read the
    in-memory block instead of re-scanning a 100 TB corpus (VERDICT r5 #6).
    The one real scan stays pruned to (doc_id, text)."""
    from vectrekker_spark.operators.tfidf import bm25_scores, release
    from vectrekker_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bm25_scores(docs, "data model")
    plan = formatted_plan(out)
    schemas = sorted(
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    )
    with_text = [s for s in schemas if "text" in s]
    assert len(with_text) == 1, schemas
    assert set(with_text[0].split("<")[1].rstrip(">").split(",")) <= {
        "doc_id:bigint", "text:string"
    }, schemas
    # the other consumers read the persisted intermediate
    assert plan.lower().count("inmemorytablescan") >= 2, plan
    release(out)


def test_bm25_has_no_zero_fill_join(spark, sf_dir):
    """The sentinel-term zero-fill (r7) removed the corpus-sized id join:
    even uncached, the plan must contain no join of two corpus-sized sides
    (the only joins are broadcasts of the tiny idf/stats tables) and at
    most two pruned text scans (stats + tf branches)."""
    from vectrekker_spark.operators.tfidf import bm25_scores
    from vectrekker_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = formatted_plan(bm25_scores(docs, "data model", cache_intermediate=False))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    schemas = [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
    # uncached consumers: stats, tf, df_t (df_t shares tf's exchange at
    # runtime via AQE stage reuse; with the default cache all three read
    # the in-memory block and text is scanned ONCE — see the cached test)
    with_text = [s for s in schemas if "text" in s]
    assert 1 <= len(with_text) <= 3, schemas
    assert all(
        set(s.split("<")[1].rstrip(">").split(",")) <= {"doc_id:bigint", "text:string"}
        for s in with_text
    ), schemas


def test_q19_single_scan_single_parse(spark, sf_dir):
    # the merged JSON spec must read and parse `props` exactly once: one
    # events FileScan, one from_json, and the grouping-sets Expand sitting
    # ABOVE the parse so only skinny parsed rows are duplicated (r6 verdict:
    # the old two-branch form paid the dominant JSON-parse cost twice).
    from vectrekker_spark.queries.relational import q19_json

    df = q19_json(spark, sf_dir)
    plan = formatted_plan(df)
    scans = [
        ln for ln in plan.splitlines()
        if "Scan parquet" in ln or ("Location:" in ln and "events" in ln)
    ]
    event_scans = [ln for ln in scans if "events" in ln]
    assert len(event_scans) == 1, plan
    assert plan.count("from_json") == 1, plan
    # the grouping-sets Expand is present (it duplicates parsed rows only)
    assert "Expand" in plan, plan


def _final_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )


def test_q06_q11_fact_shuffle_reused_at_runtime(spark, sf_dir):
    # both arms of the merged union specs hang off ONE pre-aggregated fact
    # lineage; AQE's stage cache must dedupe the identical exchanges so the
    # fact (orders) is scanned and shuffled once per query, not per arm
    # (r6 verdict "double-scan union specs").
    from vectrekker_spark.queries.relational import q06_outer_joins, q11_grouping_sets

    for fn in (q06_outer_joins, q11_grouping_sets):
        df = fn(spark, sf_dir)
        df.collect()
        final = _final_plan(df)
        final_section = final.split("== Initial Plan ==")[0]
        assert "ReusedExchange" in final_section, (fn.__name__, final)


def test_q07_serial_plan_has_zero_exchanges(spark, sf_dir):
    # on one-file local fixtures the semi+anti union runs as two
    # single-partition broadcast probes + one in-task sort — no shuffles;
    # the distributed plan at scale is untouched (small_local gate).
    from vectrekker_spark.queries.relational import q07_semi_anti_join

    df = q07_semi_anti_join(spark, sf_dir)
    assert shuffle_count(df) == 0, formatted_plan(df)


def test_d26_serial_plan_has_zero_exchanges(spark, sf_dir):
    # single-partition input satisfies the cid groupBy's required
    # distribution and the final sort runs in-task — on one-file fixtures
    # the whole decisions pipeline (assign mapInPandas → applyInPandas →
    # sort) is one exchange-free task chain; the distributed plan (one cid
    # shuffle) is untouched at scale.
    from vectrekker_spark.queries.vector import d26_semantic_dedup

    df = d26_semantic_dedup(spark, sf_dir)
    assert shuffle_count(df) == 0, formatted_plan(df)


def test_tpch_fact_table_never_broadcast(spark, sf_dir):
    # lineitem is the fact: it must be the stream side of every join. A
    # BroadcastExchange over it is a plan that only works while the fact
    # fits the broadcast threshold — i.e. never at 100 TB. (Regression: the
    # original c⋈o⋈li order made Catalyst build-side lineitem in all three
    # TPC-H queries.)
    from vectrekker_spark.plans import broadcast_subtrees
    from vectrekker_spark.queries.tpch import (
        t03_shipping_priority,
        t05_local_supplier_volume,
        t10_returned_items,
    )

    for q in (t03_shipping_priority, t05_local_supplier_volume, t10_returned_items):
        subs = broadcast_subtrees(q(spark, sf_dir))
        assert subs, "expected dim broadcasts in the TPC-H join plans"
        for sub in subs:
            assert "lineitem" not in sub, (q.__name__, sub)


def test_sample_mixture_is_narrow(spark, sf_dir):
    # d25: stratified sampling + shuffle-bucket assignment must be a pure
    # narrow map over the scan — no join, no aggregation; the only allowed
    # exchange is the final order's range partitioning (absent on the
    # serial one-file plan)
    from vectrekker_spark.queries.curation import d25_sample_mixture

    df = d25_sample_mixture(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert "HashAggregate" not in plan, plan
    assert shuffle_count(df) <= 1, plan
    # column pruning: text (the wide column) must never be read
    assert "text" not in set(read_schema_columns(df)), read_schema_columns(df)
