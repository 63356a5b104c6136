"""Connected components + near-dup clustering (operators/components.py):
hand-checked graphs (chain, star, disjoint, self-loop), determinism under
repartitioning, and the end-to-end cluster-dedup on planted duplicates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectrekker_spark.operators.components import (
    connected_components,
    near_dedup_clusters,
)


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, ["l_id", "r_id"])
    out = connected_components(edges, **kw)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_chain_and_star(spark):
    # chain 1-2-3-4 plus star 10-{11,12,13}: two components, min-id labels.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_direction_and_self_loops(spark):
    # edges arrive in arbitrary direction; self-loops are ignored.
    got = _cc(spark, [(5, 2), (2, 2), (7, 5), (9, 9)])
    assert got == {2: 2, 5: 2, 7: 2}  # 9 only self-loops → not in edge set


def test_long_chain_converges(spark):
    n = 12  # diameter 11: exercises multi-round propagation + checkpoints
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_adversarial_chain_converges_logarithmically(spark):
    # diameter 60: plain propagation would need 60 rounds; pointer jumping
    # must converge within ~log2(60)+slack. Two disjoint chains keep
    # separate roots, proving jumps never cross components.
    pairs = [(i, i + 1) for i in range(60)] + [(100 + i, 101 + i) for i in range(20)]
    got = _cc(spark, pairs, max_iter=10)
    assert all(got[i] == 0 for i in range(61))
    assert all(got[100 + i] == 100 for i in range(21))


def test_max_iter_raises(spark):
    # reach after 2 jump-rounds is ~6 hops — a 40-chain cannot converge
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(40)], max_iter=2)


def test_partition_invariance(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)]
    a = connected_components(spark.createDataFrame(pairs, ["l_id", "r_id"]))
    b = connected_components(
        spark.createDataFrame(pairs, ["l_id", "r_id"]).repartition(7)
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_near_dedup_clusters(spark):
    # three exact copies + one unrelated doc: copies cluster under the min id,
    # only the representative is kept, the loner is its own singleton.
    base = "spark shuffles the narrow stream of tokens across the cluster"
    rows = [
        (1, base),
        (2, base),
        (5, base),
        (9, "completely different words about database query optimizers"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dedup_clusters(df, threshold=0.9).collect()
    }
    assert got == {1: (1, True), 2: (1, False), 5: (1, False), 9: (9, True)}


def test_near_dedup_keep_best(spark):
    from vectrekker_spark.operators.components import near_dedup_keep_best

    base = "spark shuffles the narrow stream of tokens across the cluster"
    rows = [
        (1, base, 0.20),
        (2, base, 0.95),   # best quality in the cluster — must be kept
        (5, base, 0.95),   # score tie with 2 → min id (2) wins
        (9, "completely different words about database query optimizers", 0.01),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "q"])
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dedup_keep_best(df, "q", threshold=0.9).collect()
    }
    assert got == {1: (1, False), 2: (1, True), 5: (1, False), 9: (9, True)}


def test_near_dedup_keep_best_null_scores_and_ids(spark):
    from vectrekker_spark.operators.components import near_dedup_keep_best

    base = "spark shuffles the narrow stream of tokens across the cluster"
    rows = [
        (3, base, None),   # unscored loses to any scored member
        (4, base, 0.10),
        (7, base, None),
        (None, base, 0.99),  # NULL id: excluded entirely
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "q"])
    out = near_dedup_keep_best(df, "q", threshold=0.9).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out}
    assert got == {3: (3, False), 4: (3, True), 7: (3, False)}
    # all-NULL-score cluster falls back to min id
    rows2 = [(6, base, None), (8, base, None)]
    df2 = spark.createDataFrame(rows2, "doc_id bigint, text string, q double")
    got2 = {
        r["doc_id"]: r["keep"]
        for r in near_dedup_keep_best(df2, "q", threshold=0.9).collect()
    }
    assert got2 == {6: True, 8: False}


def test_near_dedup_keep_best_reserved_columns(spark):
    import pytest
    from pyspark.sql import functions as F

    from vectrekker_spark.operators.components import near_dedup_keep_best

    df = spark.createDataFrame(
        [(1, "text here", 0.5)], ["doc_id", "text", "q"]
    ).withColumn("__nb_neg", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        near_dedup_keep_best(df, "q")

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
