"""functions/time.py: epoch extraction must be identical for TIMESTAMP and
TIMESTAMP_NTZ inputs (the round-3 regression: testdata parquet shipped
Timestamp(isAdjustedToUTC=false) → Spark infers NTZ → raw unix_millis
raised DATATYPE_MISMATCH), and normalize_event_ts must handle every ts
shape the corpus has used."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vectrekker_spark.functions.time import epoch_ms, epoch_us, normalize_event_ts

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 6, 15, 12, 34, 56, 789000),
    datetime.datetime(1999, 12, 31, 23, 59, 59),
]


def _frame(spark, dtype: str):
    df = spark.createDataFrame([(t,) for t in TS], f"ts {dtype}")
    return df.select(
        epoch_ms("ts").alias("ms"), epoch_us(F.col("ts")).alias("us")
    ).collect()


def test_epoch_same_for_ntz_and_ltz(spark):
    # session tz is UTC (session.py), so NTZ wall-clock == UTC instant and
    # both types must produce identical epoch values
    a = _frame(spark, "timestamp")
    b = _frame(spark, "timestamp_ntz")
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["ms"] == 1704067200000
    assert a[0]["us"] == 1704067200000000
    assert a[1]["ms"] - 789 == a[1]["us"] // 1000 - 789  # sub-second preserved


def test_epoch_on_parquet_events(spark, sf_dir):
    # the actual corpus: whatever type `ts` infers as, epoch_ms must resolve
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = e.select(epoch_ms("ts").alias("ms")).agg(F.min("ms")).first()
    assert row[0] is not None and row[0] > 0


def test_normalize_event_ts_shapes(spark):
    ntz = spark.createDataFrame([(TS[0],)], "ts timestamp_ntz")
    assert dict(normalize_event_ts(ntz).dtypes)["ts"] == "timestamp_ntz"
    assert dict(normalize_event_ts(ntz, to_ltz=True).dtypes)["ts"] == "timestamp"

    ltz = spark.createDataFrame([(TS[0],)], "ts timestamp")
    assert dict(normalize_event_ts(ltz, to_ltz=True).dtypes)["ts"] == "timestamp"

    nanos = spark.createDataFrame([(1704067200_000_000_000,)], "ts long")
    out = normalize_event_ts(nanos)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.select(epoch_ms("ts")).first()[0] == 1704067200000
