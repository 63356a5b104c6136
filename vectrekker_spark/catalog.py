"""Table catalog for the test corpus (FIXTURES.md / TESTDATA.md).

At 100 TB these would be partitioned/bucketed external tables; here they are
plain parquet files. Reads stay fully declarative so Catalyst gets predicate
pushdown + column pruning on every query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (session id, sf_dir, table) → (file stat, DataFrame). spark.read.parquet
# re-lists files and re-reads footers for schema inference on EVERY call
# (~100ms+), which a real engine's catalog pays once at registration, not
# per query — memoize the lazy DataFrame per session. DataFrames are
# immutable, so sharing one across queries is safe. Entries are validated
# against the file's (mtime_ns, size) on every hit — a rewritten fixture
# invalidates its entry instead of serving a plan with stale file metadata —
# and the dict is size-bounded so long-lived drivers that cycle many
# sessions/dirs don't pin them all forever.
_TABLE_CACHE: dict[tuple[int, str, str], tuple[tuple[int, int], DataFrame]] = {}
_TABLE_CACHE_MAX = 256


def _stat_key(path: str) -> tuple[int, int] | None:
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:  # remote path / missing file → treat as uncacheable
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table (memoized per session — catalog semantics).

    `events.ts` has shipped as parquet TIMESTAMP(NANOS) (older driver rounds;
    Spark's vectorized reader rejects it — read as raw nanos via legacy conf
    and convert) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (current;
    Spark infers TIMESTAMP_NTZ, which is kept as-is so ts predicates still
    push down — epoch extraction sites use functions.time.epoch_ms/us, which
    are NTZ-proof). The conf is set at read time so this works in any
    caller's session, not just ours.
    """
    from vectrekker_spark.functions.time import normalize_event_ts

    p = table_path(sf_dir, name)
    stat = _stat_key(p)
    # applicationId, not id(spark): after a session is stopped and GC'd a
    # new one can reuse the address and be handed plans bound to the dead
    # session (same fix as queries/pipeline._IVF_INDEX_CACHE)
    ck = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _TABLE_CACHE.get(ck)
    if hit is not None and stat is not None and hit[0] == stat:
        return hit[1]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_event_ts(spark.read.parquet(p))
    else:
        df = spark.read.parquet(p)
    if stat is not None:
        if len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))  # FIFO-evict oldest
        _TABLE_CACHE[ck] = (stat, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table as a DataFrame (lazy; no I/O yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so `spark.sql` queries resolve."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
