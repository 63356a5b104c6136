"""Randomized equivalence: the scale formulations of the custom joins must
return EXACTLY the rows of their naive O(n²) definitions on seeded random
workloads — stronger than fixture-only oracle parity because the random data
exercises boundary cases (ties, exact-window edges, sparse/dense keys) the
fixtures may not contain."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.asofjoin import asof_join
from vectrekker_spark.operators.rangejoin import bounded_follow_join

BASE = datetime.datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(7)
    n = 400
    rows = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n),
            # second-resolution offsets incl. exact-boundary ties
            "ts": [
                BASE + datetime.timedelta(seconds=int(s))
                for s in rng.integers(0, 600, n)
            ],
        }
    )
    return spark.createDataFrame(rows)


def test_bounded_follow_join_equals_naive_theta_join(spark, events):
    w = 60
    fast = {
        (r["l_event_id"], r["r_event_id"])
        for r in bounded_follow_join(events, window_seconds=w).collect()
    }
    e1, e2 = events.alias("l"), events.alias("r")
    naive = {
        (r["l_id"], r["r_id"])
        for r in e1.join(
            e2,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") > F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {w} SECONDS")),
        )
        .select(
            F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id")
        )
        .collect()
    }
    assert fast == naive and len(fast) > 0


def test_asof_join_equals_naive_subquery(spark, events):
    # right side: one state row per (user, ts) — deterministic tie handling
    rng = np.random.default_rng(13)
    state = (
        events.filter(F.col("event_id") % 3 == 0)
        .select("user_id", "ts")
        .distinct()
        .withColumn("v", F.crc32(F.concat_ws(",", "user_id", "ts")).cast("double"))
    )
    left = events.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", "ts"
    )
    got = {
        (r["event_id"], r["v"], r["asof_ts"])
        for r in asof_join(left, state, key="user_id").collect()
    }
    # naive: for each left row, the max right.ts <= left.ts, then its value
    l, r = left.alias("l"), state.alias("r")
    latest = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts")),
            "left",
        )
        .groupBy("l.event_id")
        .agg(F.max(F.col("r.ts")).alias("asof_ts"))
    )
    naive = {
        (r2["event_id"], r2["v"], r2["asof_ts"])
        for r2 in latest.alias("x")
        .join(
            left.alias("ll"), F.col("x.event_id") == F.col("ll.event_id")
        )
        .join(
            state.alias("s"),
            (F.col("s.user_id") == F.col("ll.user_id"))
            & (F.col("s.ts") == F.col("x.asof_ts")),
            "left",
        )
        .select("x.event_id", "s.v", "x.asof_ts")
        .collect()
    }
    assert got == naive and len(got) > 0

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
