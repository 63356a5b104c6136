"""Skew mitigation by key salting — the manual fallback for when AQE's
runtime skew-join splitting isn't available (e.g. aggregations with one hot
key, pre-AQE clusters, deterministic plans).

Pattern: explode the hot key into `salt` sub-keys, partial-aggregate on
(key, salt), then final-aggregate on key. Two small shuffles instead of one
shuffle with a straggler partition holding the hot key's entire data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting.

    `aggs` maps output column name → (partial aggregate expression, combiner),
    where combiner ∈ {"sum", "min", "max"} recombines the per-salt partials
    (COUNT partials recombine with "sum"). Only decomposable aggregates are
    expressible — anything else (avg, percentiles) must be rewritten by the
    caller into decomposable parts (e.g. avg = sum ⊘ count); an unknown
    combiner raises rather than silently producing wrong results.

    Phase 1 groups on (key, salt) — the hot key spreads over `salt`
    partitions; phase 2 re-aggregates the tiny partial results on key.
    """
    for name, (_, combiner) in aggs.items():
        if combiner not in _COMBINERS:
            raise ValueError(
                f"aggregate {name!r}: combiner {combiner!r} not decomposable; "
                f"use one of {sorted(_COMBINERS)}"
            )
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    final_aggs = [
        _COMBINERS[combiner](F.col(f"__p_{name}")).alias(name)
        for name, (_, combiner) in aggs.items()
    ]
    return partial.groupBy(key).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Equi join with a skewed left side: salt the skewed side, REPLICATE the
    other side once per salt value, join on (key, salt). The hot key's rows
    spread over ``salt`` partitions instead of one straggler task.

    Cost model: the other side is shuffled ×salt — use when `other` is much
    smaller than the hot key's row count but too big to broadcast (if it
    broadcasts, Spark already avoids the skew problem entirely; AQE's
    skew-join split is also preferred when applicable — this is the manual
    tool for deterministic plans / stateful stages where AQE is off, e.g.
    inside Structured Streaming, where AQE is disabled).

    Salt derivation is deterministic (never rand()) so a task retry salts
    identically and no row is lost or duplicated on speculative
    re-execution. Pass ``salt_col`` naming a (near-)unique column — event
    id, offset — for an even spread; without it the salt is F.hash over all
    hashable columns, which is correct but degrades when hot-key rows are
    byte-identical duplicates (identical rows hash to one salt and the
    straggler remains — dedup first or provide salt_col). Map-typed columns
    are excluded from the row hash (Spark cannot hash maps).

    ``how`` supports inner/left (semantics preserved: each skewed row joins
    the full `other` key set exactly once since every (key, salt) replica
    exists).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_col is not None:
        basis = [F.col(salt_col)]
    else:
        basis = [
            F.col(c) for c, t in skewed.dtypes if not t.startswith("map<")
        ]
        if not basis:
            raise ValueError(
                "salted_join: every column is map-typed (unhashable); "
                "provide salt_col"
            )
    l = skewed.withColumn("__salt", F.pmod(F.hash(*basis), F.lit(salt)))
    r = other.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l.join(r, [key, "__salt"], how).drop("__salt")
