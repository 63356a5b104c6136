"""Query registry: the t2 oracle contract (SURVEY.md §2.3).

Every implemented operator has a named QuerySpec: a Spark DataFrame builder
and (where SQL-expressible) the equivalent DuckDB oracle SQL. The driver runs
both at sf0.01 and hash-compares; column names/aliases MUST match exactly.

Determinism rules applied throughout:
- money-sums: SUM(CAST(x AS DECIMAL(18,2))) (exact, order-independent), then
  CAST AS DOUBLE for a simple output type
- vector/float math: identical operation order in both engines + ROUND(…,6)
- timestamps are never output raw — always unix epoch millis (BIGINT)
- every LIMIT is preceded by a total ORDER BY with unique tie-break keys
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL on the pre-registered views; None → rows-only check
    tags: tuple[str, ...] = ()
    description: str = ""


def all_specs() -> dict[str, QuerySpec]:
    from vectrekker_spark.queries import (
        curation,
        pipeline,
        relational,
        text,
        tpch,
        vector,
    )

    specs: dict[str, QuerySpec] = {}
    # tpch first: round-1 driver CORRECTNESS recorded exactly 50 rows in
    # registry insertion order, dropping the tail (t03/t05/t10). Front-load
    # the previously-unproven specs so any cap hits well-proven ones instead.
    for mod in (tpch, relational, vector, text, curation, pipeline):
        for s in mod.SPECS:
            if s.name in specs:
                raise ValueError(f"duplicate query name {s.name}")
            specs[s.name] = s
    return specs
