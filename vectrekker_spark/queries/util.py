"""Shared helpers for query definitions.

The DuckDB SQL fragments here mirror the *exact* floating-point operation
order of the Spark expressions in ``functions/vector.py``: in-order
double-precision accumulation over the list. Verified bit-identical (no
rounding needed for the raw dot product); we still round final scores to 6
for belt-and-braces. DuckDB's own ``list_cosine_similarity`` accumulates in
float32 and must NOT be used as an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tb(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from vectrekker_spark.catalog import load_table

    return load_table(spark, sf_dir, name)


# --- DuckDB-side vector expressions (ordered double accumulation) ----------

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')"
    )


def normsq_sql(a: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), 'sum')"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({normsq_sql(a)}) * sqrt({normsq_sql(b)})))"


def l2_sql(a: str, b: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), 'sum'))"
    )


def token_hash_sql(t: str) -> str:
    """32-bit md5-prefix hash, ≡ Spark conv(substr(md5(x),1,8),16,10)."""
    return f"(('0x' || substr(md5({t}), 1, 8))::BIGINT)"


def tokens_sql(t: str) -> str:
    """Whitespace tokens, ≡ Spark split(trim(x), '\\\\s+')."""
    return f"string_split_regex(trim({t}), '\\s+')"
