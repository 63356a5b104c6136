"""Timestamp-type-proof epoch extraction.

Parquet written with ``Timestamp(isAdjustedToUTC=false)`` (what pandas/arrow
emit by default, including the driver's testdata) is inferred by Spark 4.x as
``TIMESTAMP_NTZ``, and ``unix_millis``/``unix_micros`` reject NTZ inputs with
DATATYPE_MISMATCH. These helpers cast to ``timestamp`` first: a no-op for
TIMESTAMP / LTZ inputs, and for NTZ it interprets the wall-clock in the
session timezone. The engine pins ``spark.sql.session.timeZone=UTC``
(session.py), so the cast is value-preserving and matches DuckDB's
``epoch_ms(naive_ts)`` semantics used by the oracle queries.

Use these instead of raw ``F.unix_millis``/``F.unix_micros`` anywhere a
column may originate from parquet scan or a time-window struct field.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_ms(col: Column | str) -> Column:
    """Milliseconds since epoch; accepts TIMESTAMP or TIMESTAMP_NTZ."""
    return F.unix_millis(_as_ts(col))


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch; accepts TIMESTAMP or TIMESTAMP_NTZ."""
    return F.unix_micros(_as_ts(col))


def normalize_event_ts(df, ts_col: str = "ts", to_ltz: bool = False):
    """Normalize an event-time column across the three shapes the corpus
    parquet has shipped with over driver rounds:

    - ``bigint``: raw nanos read under ``spark.sql.legacy.parquet.nanosAsLong``
      → convert to TIMESTAMP via micros.
    - ``timestamp_ntz`` (current testdata: Timestamp(isAdjustedToUTC=false,
      MICROS)): left as-is by default (keeps parquet predicate pushdown on the
      scan column); cast to TIMESTAMP when ``to_ltz`` — streaming watermarks
      and stream-stream join range conditions want a consistent LTZ type.
    - ``timestamp``: already fine.

    Session timezone is pinned to UTC (session.py) so the NTZ→LTZ cast is
    value-preserving.
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    if dt == "timestamp_ntz" and to_ltz:
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
