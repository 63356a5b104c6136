"""One-pass table profiling — per-column data-quality stats in a SINGLE
scan + aggregate, the "what is actually in this 100 TB table" primitive a
curation pipeline runs before deciding anything else (null rates before
keying, cardinalities before choosing join strategies/bloom sizes, length
distributions before packing budgets).

Scale shape: every statistic is a built-in partial-aggregable JVM function
(count / approx_count_distinct HLL / min / max / avg / stddev /
percentile_approx's bounded QuantileSummaries), so the whole profile is one
scan, map-side partials, and ONE exchange carrying a single combined row —
plan-asserted in tests. No collect-and-loop per column, no Python in the
scan. The reshaped result is one tiny row per column, returned as a
DataFrame so it can be written next to the data it describes.

Reference scope note: the reference (vectrekker/main.py) has no profiling
surface; north-star training-pipeline addition.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
ORDERED_TYPES = NUMERIC_TYPES + (T.StringType, T.DateType, T.TimestampType)

DEFAULT_PERCENTILES = (0.25, 0.5, 0.75)


def _length_expr(c: Column, dt: T.DataType) -> Column | None:
    """Per-row "size" by type: chars for strings, bytes for binary,
    elements for arrays/maps. None when length has no meaning."""
    if isinstance(dt, T.StringType):
        return F.length(c)
    if isinstance(dt, T.BinaryType):
        return F.octet_length(c)
    if isinstance(dt, (T.ArrayType, T.MapType)):
        # size(NULL) is -1 under the engine's non-ANSI config (legacy
        # sizeOfNull) and would silently drag avg_len down — null-guard so
        # avg/max skip missing arrays like they skip missing strings
        return F.when(c.isNotNull(), F.size(c))
    return None


def _column_types(df: DataFrame, names: list[str]) -> dict[str, T.DataType]:
    """name → dtype for every profiled column, resolved once (not per call
    per column — a 2000-column table would otherwise rebuild the schema
    dict O(n²) times on the driver). Dotted struct paths resolve through
    one combined projection."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    out: dict[str, T.DataType] = {}
    dotted = [n for n in names if n not in schema]
    if dotted:
        fields = df.select(*[F.col(n) for n in dotted]).schema.fields
        for n, f in zip(dotted, fields):
            out[n] = f.dataType
    for n in names:
        if n not in out:
            out[n] = schema[n]
    return out


def _profile_exprs(
    df: DataFrame,
    names: list[str],
    percentiles: tuple[float, ...],
    rsd: float,
    accuracy: int,
) -> list[Column]:
    types = _column_types(df, names)
    exprs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for i, name in enumerate(names):
        c = F.col(name)
        dt = types[name]
        exprs.append(F.count(c).alias(f"__{i}_nonnull"))
        exprs.append(F.approx_count_distinct(c, rsd).alias(f"__{i}_distinct"))
        if isinstance(dt, ORDERED_TYPES):
            exprs.append(F.min(c).cast("string").alias(f"__{i}_min"))
            exprs.append(F.max(c).cast("string").alias(f"__{i}_max"))
        if isinstance(dt, NUMERIC_TYPES):
            d = c.cast("double")
            exprs.append(F.avg(d).alias(f"__{i}_mean"))
            exprs.append(F.stddev(d).alias(f"__{i}_stddev"))
            exprs.append(
                F.percentile_approx(
                    d,
                    F.array(*[F.lit(p) for p in percentiles]),
                    F.lit(accuracy),
                ).alias(f"__{i}_pcts")
            )
        ln = _length_expr(c, dt)
        if ln is not None:
            exprs.append(F.avg(ln.cast("double")).alias(f"__{i}_avg_len"))
            exprs.append(F.max(ln).cast("long").alias(f"__{i}_max_len"))
    return exprs


def profile_agg(
    df: DataFrame,
    columns: list[str] | None = None,
    percentiles: tuple[float, ...] = DEFAULT_PERCENTILES,
    rsd: float = 0.05,
    percentile_accuracy: int = 10000,
) -> DataFrame:
    """The single-row combined aggregate behind profile_table, un-collected
    — exposed so plan tests can assert the one-scan/one-exchange shape
    without running the job."""
    for p in percentiles:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {p} outside [0, 1]")
    names = columns if columns is not None else df.columns
    if not names:
        raise ValueError("no columns to profile")
    return df.agg(*_profile_exprs(df, names, percentiles, rsd, percentile_accuracy))


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    percentiles: tuple[float, ...] = DEFAULT_PERCENTILES,
    rsd: float = 0.05,
    percentile_accuracy: int = 10000,
) -> DataFrame:
    """Profile ``columns`` (default: all top-level) in one scan.

    Result: one row per column —
      column, dtype, n_rows, n_nonnull, null_frac,
      approx_distinct (HLL, relative sd ``rsd``),
      min / max (stringified for a uniform schema; ordered types only),
      mean / stddev (numeric only),
      percentiles (array<double> aligned with ``percentiles``; numeric only),
      avg_len / max_len (string chars, binary bytes, array/map elements).

    Struct columns get null/count/distinct stats only; profile their fields
    by passing dotted names (``["meta.width"]``) via ``columns``. Percentile
    memory is bounded by percentile_approx's summaries — safe at any scale.
    """
    names = columns if columns is not None else df.columns
    row = profile_agg(df, names, percentiles, rsd, percentile_accuracy).collect()[0]
    d = row.asDict()
    n_rows = d["__n_rows"]
    types = _column_types(df, names)
    out = []
    for i, name in enumerate(names):
        dt = types[name]
        nonnull = d[f"__{i}_nonnull"]
        pcts = d.get(f"__{i}_pcts")
        out.append(
            {
                "column": name,
                "dtype": dt.simpleString(),
                "n_rows": n_rows,
                "n_nonnull": nonnull,
                "null_frac": (float(n_rows - nonnull) / n_rows) if n_rows else 0.0,
                "approx_distinct": d[f"__{i}_distinct"],
                "min": d.get(f"__{i}_min"),
                "max": d.get(f"__{i}_max"),
                "mean": d.get(f"__{i}_mean"),
                "stddev": d.get(f"__{i}_stddev"),
                "percentiles": None if pcts is None else [float(x) for x in pcts],
                "avg_len": d.get(f"__{i}_avg_len"),
                "max_len": d.get(f"__{i}_max_len"),
            }
        )
    result_schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("dtype", T.StringType(), False),
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("n_nonnull", T.LongType(), False),
            T.StructField("null_frac", T.DoubleType(), False),
            T.StructField("approx_distinct", T.LongType(), True),
            T.StructField("min", T.StringType(), True),
            T.StructField("max", T.StringType(), True),
            T.StructField("mean", T.DoubleType(), True),
            T.StructField("stddev", T.DoubleType(), True),
            T.StructField("percentiles", T.ArrayType(T.DoubleType()), True),
            T.StructField("avg_len", T.DoubleType(), True),
            T.StructField("max_len", T.LongType(), True),
        ]
    )
    return df.sparkSession.createDataFrame(out, result_schema)


DIFF_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # ok|added|removed|flagged
        T.StructField("dtype_old", T.StringType(), True),
        T.StructField("dtype_new", T.StringType(), True),
        T.StructField("null_frac_delta", T.DoubleType(), True),
        T.StructField("distinct_ratio", T.DoubleType(), True),
        T.StructField("mean_shift_sigmas", T.DoubleType(), True),
        T.StructField("flags", T.ArrayType(T.StringType()), False),
    ]
)


def profile_diff(
    old: DataFrame,
    new: DataFrame,
    null_frac_jump: float = 0.05,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
    mean_shift_max_sigmas: float = 3.0,
) -> DataFrame:
    """Drift report between two profile_table outputs of the same table
    (yesterday's snapshot vs today's): per-column deltas plus a ``flags``
    array naming every breached gate, so an ingestion pipeline can assert
    ``diff.filter(size(flags) > 0).isEmpty()`` before shipping a batch.

    Gates: ``dtype_changed``; ``null_frac_jump`` / ``null_frac_drop``
    (null fraction moved more than the threshold in either direction — a
    feed going dark OR coming alive); ``distinct_ratio`` outside the band
    (cardinality collapse/explosion, including from/to zero; the band
    default is generous to HLL error, widen it for low-count columns);
    ``mean_shift`` beyond N old-stddevs (infinite sigmas when the old
    column was constant — the gate must not go blind on constant history).
    Columns only in one profile are ``added``/``removed``. Pure driver-side math over
    the two tiny profiles — no scan of the data itself."""
    lo, hi = distinct_ratio_band
    if not (0 < lo <= hi):
        raise ValueError(f"distinct_ratio_band must be 0 < lo <= hi, got {lo, hi}")
    o = {r["column"]: r.asDict() for r in old.collect()}
    n = {r["column"]: r.asDict() for r in new.collect()}
    rows = []
    for col in sorted(set(o) | set(n)):
        a, b = o.get(col), n.get(col)
        if a is None or b is None:
            rows.append(
                {
                    "column": col,
                    "status": "added" if a is None else "removed",
                    "dtype_old": a["dtype"] if a else None,
                    "dtype_new": b["dtype"] if b else None,
                    "null_frac_delta": None,
                    "distinct_ratio": None,
                    "mean_shift_sigmas": None,
                    "flags": ["added" if a is None else "removed"],
                }
            )
            continue
        flags = []
        if a["dtype"] != b["dtype"]:
            flags.append("dtype_changed")
        nf_delta = b["null_frac"] - a["null_frac"]
        if nf_delta > null_frac_jump:
            flags.append("null_frac_jump")
        if -nf_delta > null_frac_jump:
            # a column coming ALIVE (all-null feed starts populating) is as
            # much a feed change as one going dark — without this, the
            # 100%-null → fully-populated case sailed through unflagged
            flags.append("null_frac_drop")
        ratio = None
        if a["approx_distinct"] is not None and b["approx_distinct"] is not None:
            ratio = b["approx_distinct"] / max(a["approx_distinct"], 1)
            if not (lo <= ratio <= hi) and (a["approx_distinct"] > 0 or b["approx_distinct"] > 0):
                flags.append("distinct_ratio")
        shift = None
        if a["mean"] is not None and b["mean"] is not None:
            sd = a["stddev"]
            if sd is not None and sd > 0 and not math.isnan(sd):
                shift = abs(b["mean"] - a["mean"]) / sd
            else:
                # constant/single-row history: ANY mean change is infinite
                # sigmas — the gate must not go blind exactly when the old
                # column never varied
                shift = 0.0 if b["mean"] == a["mean"] else math.inf
            if shift > mean_shift_max_sigmas:
                flags.append("mean_shift")
        rows.append(
            {
                "column": col,
                "status": "flagged" if flags else "ok",
                "dtype_old": a["dtype"],
                "dtype_new": b["dtype"],
                "null_frac_delta": nf_delta,
                "distinct_ratio": ratio,
                "mean_shift_sigmas": shift,
                "flags": flags,
            }
        )
    return old.sparkSession.createDataFrame(rows, DIFF_SCHEMA)
