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


def tbp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``tb`` + spread across the session's default parallelism.

    The local fixture files are single-row-group parquet, so the scan has
    exactly ONE split and every per-row kernel/expression would run in a
    single task while DuckDB uses all cores. A round-robin repartition of the
    (column-pruned) scan costs one tiny local exchange and buys full-core
    parallelism. Gated on file size: when the file is big enough that the
    scan splits naturally (a real deployment — at 100 TB there are thousands
    of splits), this is a plain ``tb`` and adds nothing to the plan.
    """
    import os

    from vectrekker_spark.catalog import table_path

    df = tb(spark, sf_dir, name)
    try:
        small = os.path.getsize(table_path(sf_dir, name)) < (64 << 20)
    except OSError:
        small = False
    if not small:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


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
