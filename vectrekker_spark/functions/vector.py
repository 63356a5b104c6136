"""Vector math as pure Catalyst column expressions (no UDFs).

The reference's entire query surface is top-k *cosine* similarity over
fixed-dim float vectors (reference `vectrekker/main.py:23` sets
``metric="cosine"``; dim at `:22`). Here every metric is a whole-stage-codegen
expression over ``array<float>`` — JVM-side, vectorizable, and (crucial for
the DuckDB oracle) computed as an in-order double-precision accumulation,
which is bit-identical to ``SUM(x*y)`` over ``UNNEST(list)::DOUBLE`` in
DuckDB. Do NOT use DuckDB's ``list_cosine_similarity`` as an oracle — it
accumulates in float32.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D = "double"


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast(D) * y.cast(D)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm, double precision."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast(D) * x.cast(D))
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; computed as dot/(‖a‖·‖b‖) so the oracle can mirror
    the exact operation order."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance, double precision, in-order accumulation."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast(D) - y.cast(D)) * (x.cast(D) - y.cast(D))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged (no NaNs)."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast(D) / n)
    )


def dim_ok(a: Column | str, expected_dim: int) -> Column:
    """Fixed-dimension constraint check — the engine analog of the reference's
    ``dimension=1536`` index DDL (`vectrekker/main.py:162-167`). Spark SQL has
    no fixed-length vector type, so enforce by predicate."""
    a = F.col(a) if isinstance(a, str) else a
    return F.size(a) == expected_dim
