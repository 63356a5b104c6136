"""Bounded interval/range joins via time-bucket quantization.

Spark executes a raw `e2.ts BETWEEN e1.ts AND e1.ts + W` join as a (possibly
broadcast) nested-loop over every same-key pair — O(per-key²) comparisons.
Quantizing time into W-sized buckets turns it into an equi join: a row can
only match rows in its own or the next bucket, so exploding the left side
into those two bucket keys and hash-joining on (key, bucket) prunes the
candidate space to O(matches). This is the standard interval-join pattern
(what dedicated engines' IEJoin/interval operators do internally), expressed
with plain DataFrame ops so it scales on any Spark cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.functions.time import epoch_us


def bounded_follow_join(
    events: DataFrame,
    window_seconds: int = 60,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Self-join: for each event, the events of the same key with
    ts ∈ (ts, ts + window]. Returns (l.*, r.*) pairs with l_/r_ prefixes on
    the id/ts columns actually needed downstream."""
    w_us = window_seconds * 1_000_000
    l = events.select(
        F.col(key_col).alias("k"),
        F.col("event_id").alias("l_event_id"),
        epoch_us(ts_col).alias("l_us"),
    ).withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("l_us") / w_us),
                F.floor(F.col("l_us") / w_us) + 1,
            )
        ),
    )
    r = events.select(
        F.col(key_col).alias("k"),
        F.col("event_id").alias("r_event_id"),
        epoch_us(ts_col).alias("r_us"),
    ).withColumn("bucket", F.floor(F.col("r_us") / w_us))
    return (
        l.join(r, ["k", "bucket"])
        .filter(
            (F.col("r_us") > F.col("l_us")) & (F.col("r_us") <= F.col("l_us") + w_us)
        )
        .select("k", "l_event_id", "r_event_id")
    )
