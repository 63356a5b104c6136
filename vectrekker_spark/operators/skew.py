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


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting. `aggs` maps output column name →
    aggregate over the input (must be decomposable: sum/count/min/max).

    Phase 1 groups on (key, salt) — the hot key spreads over `salt`
    partitions; phase 2 re-aggregates the tiny partial results on key.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    # recombine partials: SUM for sum/count partials, MIN/MAX pass through
    final_aggs = []
    for name in aggs:
        col = F.col(f"__p_{name}")
        agg_sql = str(aggs[name]._jc)  # noqa: SLF001 — detect combiner
        if "min(" in agg_sql:
            final_aggs.append(F.min(col).alias(name))
        elif "max(" in agg_sql:
            final_aggs.append(F.max(col).alias(name))
        else:  # sum and count both recombine by sum
            final_aggs.append(F.sum(col).alias(name))
    return partial.groupBy(key).agg(*final_aggs)
