"""As-of join unit tests (operators/asofjoin.py): exact-ts inclusion,
no-match nulls, forward progression of state, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrekker_spark.operators.asofjoin import asof_join


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 15), (1, 20), (2, 5), (3, 100)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 18, 2.0), (2, 6, 9.0)], "k long, ts long, v double"
    )
    got = {
        (r["k"], r["ts"]): (r["v"], r["asof_ts"])
        for r in asof_join(left, right, key="k").collect()
    }
    assert got[(1, 10)] == (1.0, 10)   # exact-ts match included (<=)
    assert got[(1, 15)] == (1.0, 10)   # holds previous state
    assert got[(1, 20)] == (2.0, 18)   # advances to newer right row
    assert got[(2, 5)] == (None, None)  # right row is later → no match
    assert got[(3, 100)] == (None, None)  # key absent from right


def test_asof_partition_invariance(spark):
    left = spark.range(200).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("ts")
    )
    right = spark.range(50).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 11).alias("ts"),
        (F.col("id") * 1.5).alias("v"),
    )
    a = sorted(_rows(asof_join(left, right, key="k")))
    b = sorted(_rows(asof_join(left.repartition(13), right.repartition(3), key="k")))
    assert a == b and len(a) == 200


def test_asof_single_shuffle(spark):
    from vectrekker_spark.plans import shuffle_count

    left = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("ts"))
    right = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("ts"), F.lit(1.0).alias("v")
    )
    # one hash exchange on the key feeds the window sort; no range-join
    # explosion, no second shuffle
    assert shuffle_count(asof_join(left, right, key="k")) == 1


def test_asof_null_ts_semantics(spark):
    # a left row with NULL ts sorts before every right row (nulls first in
    # the union window), so it matches nothing — document that contract
    from vectrekker_spark.operators.asofjoin import asof_join

    left = spark.createDataFrame(
        [(1, None), (2, 100)], "k long, ts long"
    ).selectExpr("k", "CAST(ts AS long) AS ts")
    right = spark.createDataFrame([(1, 50, 9.9), (2, 50, 8.8)], "k long, ts long, v double")
    rows = {r["k"]: (r["v"], r["asof_ts"]) for r in asof_join(left, right, key="k").collect()}
    assert rows[2] == (8.8, 50)
    assert rows[1] == (None, None)  # null-ts left row matches nothing


def test_asof_right_order_cols_no_preagg(spark):
    # equal-ts duplicate right rows: right_order_cols=["v"] makes the max
    # value win deterministically — identical to pre-aggregating MAX(v) per
    # (k, ts) first, but with no groupBy exchange in the plan
    left = spark.createDataFrame([(1, 10), (1, 20)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 5.0), (1, 10, 3.0), (1, 15, 2.0)],
        "k long, ts long, v double",
    )
    got = {
        (r["k"], r["ts"]): (r["v"], r["asof_ts"])
        for r in asof_join(left, right, key="k", right_order_cols=["v"]).collect()
    }
    assert got[(1, 10)] == (5.0, 10)  # max of the equal-ts burst
    assert got[(1, 20)] == (2.0, 15)
    # equivalence with the pre-aggregated form on a randomized workload
    import random

    rng = random.Random(7)
    lrows = [(rng.randrange(4), rng.randrange(50)) for _ in range(120)]
    rrows = [
        (rng.randrange(4), rng.randrange(50), round(rng.uniform(0, 9), 2))
        for _ in range(150)
    ]
    l = spark.createDataFrame(lrows, "k long, ts long").distinct()
    r = spark.createDataFrame(rrows, "k long, ts long, v double")
    pre = r.groupBy("k", "ts").agg(F.max("v").alias("v"))
    a = asof_join(l, pre, key="k").orderBy("k", "ts").collect()
    b = asof_join(l, r, key="k", right_order_cols=["v"]).orderBy("k", "ts").collect()
    assert [tuple(x) for x in a] == [tuple(x) for x in b]


def test_asof_multi_value_cols_not_torn(spark):
    # regression: with right_order_cols naming one value column, the OTHER
    # value columns must come from the SAME winning right row — sequential
    # window fills re-sorted by the replaced column and could mix rows
    left = spark.createDataFrame([(1, 3)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 1, 9.0, "old"), (1, 2, None, "x"), (1, 2, 5.0, "y")],
        "k long, ts long, v1 double, v2 string",
    )
    row = asof_join(left, right, key="k", right_order_cols=["v1"]).collect()[0]
    # winner at ts=2 is the v1=5.0 row (nulls-first asc puts the NULL row
    # earlier); v2 must be that same row's "y", never "x" or "old"
    assert row["asof_ts"] == 2 and row["v2"] == "y"
    # v1 itself forward-fills through the NULL to the winner's 5.0
    assert row["v1"] == 5.0
