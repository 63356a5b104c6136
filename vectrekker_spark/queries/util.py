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


def tbp(spark: SparkSession, sf_dir: str, name: str, parts: int | None = None) -> DataFrame:
    """``tb`` + spread across ``parts`` partitions (default: the session's
    default parallelism).

    The local fixture files are single-row-group parquet, so the scan has
    exactly ONE split and every per-row kernel/expression would run in a
    single task while DuckDB uses all cores. A round-robin repartition of the
    (column-pruned) scan costs one tiny local exchange and buys full-core
    parallelism. Pass a small ``parts`` for LIGHT per-row kernels on small
    tables, where 32-way task overhead exceeds the compute being spread;
    CPU-heavy kernels (minhash, winnowing) should keep the default.

    The size gate assumes the local fixture layout: one plain parquet FILE
    per table on the local filesystem. On a directory-backed table
    os.path.getsize returns the tiny dir-entry size (→ repartition is always
    applied), and on a remote path (s3://...) it raises OSError (→ never
    applied). Both degrade gracefully, and in a real deployment the table is
    either bucketed on write or splits naturally (at 100 TB the scan has
    thousands of splits), so this helper is a no-op there by design.
    """
    df = tb(spark, sf_dir, name)
    if not small_local(sf_dir, name):
        return df
    return df.repartition(parts or spark.sparkContext.defaultParallelism)


def small_local(sf_dir: str, name: str, threshold: int = 64 << 20) -> bool:
    """True when the table is a single small local parquet file — the regime
    where serial plans beat distributed ones (see ``tbp`` docstring for the
    layout assumptions and graceful degradation)."""
    import os

    from vectrekker_spark.catalog import table_path

    try:
        return os.path.getsize(table_path(sf_dir, name)) < threshold
    except OSError:
        return False


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
