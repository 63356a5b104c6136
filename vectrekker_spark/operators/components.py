"""Connected components on an edge list — the missing link between pair
generation (MinHash/SimHash/embedding near-dup pairs) and actual corpus
deduplication: near-duplicate pairs form CLUSTERS (a is ~b, b is ~c), and a
dedup that only drops the right element of each pair both under-deletes
(transitive dups survive) and over-deletes (cluster representatives get
dropped by some other pair). The standard pipeline is pairs → connected
components → keep ONE representative per component.

Algorithm: iterative min-label propagation with pointer jumping. Every node
starts labeled with itself; each round every node takes the min of its own
and its neighbors' labels, then compresses one pointer-chasing step
(``comp(v) ← comp(comp(v))`` — the label map is itself a parent forest, and
one extra self-join per round doubles how far a small label has travelled).
Converged when no label changes. Rounds = O(log diameter) — near-dup
clusters (dense, 2-4 hops) converge in the same 2-4 rounds they did under
plain propagation, and an adversarial million-node chain needs ~20 rounds
instead of a million, so the default ``max_iter`` covers every real graph
without the large-star/small-star machinery (Kiveris et al., "Connected
Components in MapReduce") — same asymptotics, one kernel, DataFrame-only.

Scale shape per round: one shuffled join (edges ⋈ labels on node id) + one
groupBy-min + one label update join — all narrow-key long/long shuffles with
map-side combine, no driver data. ``localCheckpoint`` truncates the lineage
each round (iterative plans otherwise grow exponentially in Catalyst), and
the per-round convergence count is a cheap action on the already-materialized
checkpoint. State is O(|V| + |E|) across the cluster.

Reference scope note: the reference (vectrekker/main.py) has no graph or
clustering surface; north-star training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "l_id",
    dst: str = "r_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; ``component``
    is the smallest node id in the node's connected component. Deterministic.

    Pointer jumping makes rounds O(log diameter), so the default
    ``max_iter`` covers graphs of diameter ~2^25; the raise is a safety
    net for genuinely pathological input, not a dial users must tune."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()  # reused every round: cut off upstream plan
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("comp").alias("old_comp"),
                F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint()  # the jump reads stepped twice; materialize
            # once so the edges-join + groupBy-min don't execute twice/round
        )
        # pointer jump: comp(v) ← comp(comp(v)). Labels are node ids of the
        # same component, so the composed label still is one; monotone
        # non-increasing, and it halves the remaining pointer-chain depth.
        parent = stepped.select(
            F.col("node").alias("comp"), F.col("comp").alias("__jump")
        )
        jumped = (
            stepped.join(parent, "comp", "left")
            .select(
                "node",
                "old_comp",
                F.coalesce("__jump", "comp").alias("comp"),
            )
            .localCheckpoint()
        )
        changed = jumped.filter(F.col("comp") != F.col("old_comp")).count()
        labels = jumped.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "with pointer jumping that needs diameter ≳ 2^max_iter; check the "
        "input for corruption or raise max_iter"
    )


def near_dedup_clusters(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH pairs (Jaccard-verified at
    ``threshold``) → connected components → (doc_id, cluster_id, keep).
    ``cluster_id`` is the min doc id of the cluster and the kept
    representative; docs with no near-dup form their own singleton cluster
    (keep=true). Drop rows with ``~keep`` to dedup the corpus."""
    from vectrekker_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        df, threshold=threshold, text_col=text_col, id_col=id_col
    )
    comp = connected_components(pairs, "l_id", "r_id")
    return (
        df.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def near_dedup_keep_best(
    df: DataFrame,
    score_col: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware near-dup keeper: (doc_id, cluster_id, keep) where the
    kept representative of each cluster is the member with the HIGHEST
    ``score_col`` (ties → min doc id — deterministic). The min-id policy of
    ``near_dedup_clusters`` keeps an arbitrary-quality member; real
    pipelines (SlimPajama-style) keep the best-scoring one so dedup never
    trades away quality. NULL scores sort last (a scored member always
    beats an unscored one; an all-NULL cluster falls back to min id);
    rows with a NULL id are excluded (no keeper order — the engine-wide
    NULL-id rule). Caller contract: ids are unique.

    Scale shape: near_dedup_clusters' banded-LSH plan + ONE extra
    aggregate on cluster_id (map-side combined; clusters are tiny) and one
    keyed join — no new skew beyond the cluster-size distribution the
    dedup already shuffles."""
    for reserved in ("__nb_neg", "__nb_best_id"):
        if reserved in df.columns:
            raise ValueError(
                f"column {reserved!r} already exists on the input — "
                f"reserved by near_dedup_keep_best; rename it first"
            )
    docs = df.where(F.col(id_col).isNotNull())
    clusters = near_dedup_clusters(
        docs, threshold=threshold, text_col=text_col, id_col=id_col
    ).drop("keep")
    scored = clusters.join(docs.select(id_col, score_col), id_col)
    # max score then min id == min (negated score, id) struct; NULL score
    # negates to +inf via the -inf coalesce, i.e. sorts last
    neg = -F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf")))
    best = (
        scored.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(neg.alias("__nb_neg"), F.col(id_col).alias("__nb_best_id"))
            ).alias("__nb_best")
        )
        .select("cluster_id", F.col("__nb_best.__nb_best_id").alias("__nb_best_id"))
    )
    return (
        clusters.join(best, "cluster_id")
        .withColumn("keep", F.col(id_col) == F.col("__nb_best_id"))
        .drop("__nb_best_id")
        .select(id_col, "cluster_id", "keep")
    )
