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
    per table on the local filesystem. A directory-backed table or a remote
    path (s3://...) is never small_local, so the repartition is skipped — in
    a real deployment the table is either bucketed on write or splits
    naturally (at 100 TB the scan has thousands of splits), so this helper
    is a no-op there by design.
    """
    df = tb(spark, sf_dir, name)
    if not small_local(sf_dir, name):
        return df
    return df.repartition(parts or spark.sparkContext.defaultParallelism)


def tb1(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``tb`` + serial (single-partition) execution when the table is one
    small local parquet file.

    The inverse dial of ``tbp``: sub-second window/join/merge queries on a
    100k-row fixture pay more in task scheduling + shuffle stages than the
    compute they spread — a single partition satisfies every clustering
    requirement, so Catalyst plans them with ZERO exchanges (window sorts
    and final ORDER BY run as one local sort each, like an embedded engine).
    Gated on ``small_local``: a multi-split table at real scale skips the
    coalesce entirely and keeps the distributed plan."""
    df = tb(spark, sf_dir, name)
    return df.coalesce(1) if small_local(sf_dir, name) else df


def small_local(sf_dir: str, name: str, threshold: int = 64 << 20) -> bool:
    """True when the table is a single small local parquet FILE — the regime
    where serial plans beat distributed ones.

    A directory-backed table (multi-file parquet — the layout every real
    deployment uses) is NEVER small_local, regardless of size: the isfile
    check is what makes every serial-plan gate (tb1/coalesce(1)) disengage
    the moment a table has more than one split, so the distributed plans are
    reachable and validated (scripts/scale_validation.py runs them
    end-to-end). A remote path (s3://...) raises OSError → False, same
    disengage."""
    import os

    from vectrekker_spark.catalog import table_path

    try:
        p = table_path(sf_dir, name)
        return os.path.isfile(p) and os.path.getsize(p) < threshold
    except OSError:
        return False


def ordered(df: DataFrame, *cols: str, parts: int | None = None) -> DataFrame:
    """Total sort with a hash-shuffle barrier on the first sort key.

    A bare ``orderBy`` makes the range partitioner SAMPLE its child, and when
    no exchange sits below (scan→filter/project/UDF chains), AQE re-executes
    the entire chain once for the sample and again for the real run — a ~2×
    tax on exactly the queries whose compute is worth protecting (JSON
    parse, regex kernels, pandas UDFs). The barrier materializes the skinny
    result rows once; sampling then reads shuffle output. Costs one small
    exchange — skip it for plans that already end in an exchange
    (aggregations, joins on the sort key).

    ``parts`` defaults to the session's ``spark.sql.shuffle.partitions`` so
    a full-corpus-sized result (one row per document) gets a barrier as wide
    as every other shuffle in the job — a fixed small constant here would
    funnel the whole result through a handful of tasks at scale. AQE
    coalesces the partitions back down when the result is actually small,
    so the wide default costs nothing locally."""
    if parts is None:
        spark = df.sparkSession
        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. unset/"auto" under AQE
            parts = spark.sparkContext.defaultParallelism
    return df.repartition(parts, cols[0]).orderBy(*cols)


# --- exact money arithmetic as scaled longs --------------------------------
# TPC-H money columns are fixed-point decimals stored as doubles (2dp;
# discounts 2dp). ROUND(x*scale) recovers the exact integer — the doubles are
# never near a .5 boundary because the true values ARE integers/scale — and
# BIGINT sums are exact, order-independent, and ~2× faster than Spark's
# BigDecimal aggregation (no per-row object allocation, stays in codegen).
# Overflow headroom: the 2dp×4dp product path peaks ~1e11/row → safe to
# ~9e6 rows per group at sf-scale growth; switch scale or DECIMAL past that.
# The same expression text works in DuckDB (SUM(BIGINT) → HUGEINT, cast
# DOUBLE at the end); both engines round the SAME double, so the recovered
# integers agree bit-for-bit.


def fixed_long(col, scale: int):
    """Spark Column: exact fixed-point value as scaled long (×scale)."""
    from pyspark.sql import functions as F

    return F.round(col * scale).cast("long")


def money_long(col):
    """Spark Column: exact 2-dp money value as scaled long (×100)."""
    return fixed_long(col, 100)


def fixed_long_sql(expr: str, scale: int) -> str:
    """DuckDB fragment matching fixed_long."""
    return f"CAST(ROUND(({expr}) * {scale}) AS BIGINT)"


def money_long_sql(expr: str) -> str:
    """DuckDB fragment matching money_long."""
    return fixed_long_sql(expr, 100)

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


def normalized_url_mirror_sql(table: str = "urls", url_col: str = "url") -> str:
    """DuckDB mirror of ``functions/urls.normalized_url`` as a CTE chain
    ending in a relation named ``nurl`` with columns (*input columns*,
    scheme, host, norm). RE2 has no lookarounds, so validity is modeled
    positively: an authority is rebuildable only when its host/port tail
    matches what java.net.URI would accept (digits-only port, at most one
    '@', bracketed-IPv6-or-plain host); anything else takes the
    passthrough arm, same as Spark's try_parse_url-NULL path. Userinfo is
    kept verbatim, ports canonicalize to integer form — both pinned
    against the Spark side by tests/test_urls.py and the kernel_fuzz
    ``url_norm`` family."""
    return rf"""
  p0 AS (
    SELECT *,
      lower(regexp_extract({url_col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
      regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
      nullif(regexp_extract(regexp_extract({url_col}, '^[^#]*', 0), '\?(.*)', 1), '') AS query
    FROM {table}),
  p1 AS (
    SELECT *,
      CASE WHEN regexp_matches(auth, '^[^@]*@')
           THEN regexp_extract(auth, '^([^@]*)@', 1) || '@' ELSE '' END AS ui,
      regexp_replace(auth, '^[^@]*@', '') AS hostport
    FROM p0),
  p2 AS (
    SELECT *,
      CASE WHEN hostport LIKE '[%'
           THEN lower(regexp_extract(hostport, '^(\[[^\]]*\])', 1))
           ELSE lower(regexp_extract(hostport, '^([^:]*)', 1)) END AS host,
      TRY_CAST(nullif(regexp_extract(hostport, ':([0-9]+)$', 1), '') AS BIGINT) AS port,
      nullif(regexp_extract(hostport, ':([0-9]+)$', 1), '') AS port_txt,
      (hostport NOT LIKE '%@%') AND
      CASE WHEN hostport LIKE '[%'
           THEN regexp_matches(hostport, '^\[[0-9A-Fa-f:.]*\](:[0-9]*)?$')
           ELSE regexp_matches(hostport, '^[^:\[\]]*(:[0-9]*)?$') END AS ok
    FROM p1),
  nurl AS (
    SELECT *,
      CASE WHEN scheme = '' OR host IS NULL OR host = '' OR NOT ok
             OR (port_txt IS NOT NULL AND (port IS NULL OR port > 65535))
           THEN {url_col} ELSE
        scheme || '://' || ui || host
        || CASE WHEN port IS NULL OR (scheme='http' AND port=80)
                  OR (scheme='https' AND port=443) THEN ''
             ELSE ':' || port::VARCHAR END
        || CASE WHEN path = '' THEN '/'
             WHEN length(path) > 1 AND path LIKE '%/' THEN substr(path, 1, length(path)-1)
             ELSE path END
        || CASE WHEN query IS NULL THEN '' ELSE '?' || query END
      END AS norm
    FROM p2)"""
