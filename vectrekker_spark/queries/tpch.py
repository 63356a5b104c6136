"""TPC-H-shaped composite queries (adapted to the fixture's star schema —
FIXTURES.md lacks some TPC-H columns, so predicates are adjusted; shapes and
join trees match the originals). These exercise multi-join + agg + top-k
pipelines end-to-end, the core of any warehouse workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectrekker_spark.queries import QuerySpec
from vectrekker_spark.queries.util import tb

DEC = "decimal(18,2)"
REV = "revenue"


def _revenue():
    # Exact scaled-long revenue term (util.money_long/fixed_long): price is
    # 2-dp and discount 2-dp fixed-point, so ROUND recovers exact integers
    # and the BIGINT product/sum is exact and order-independent — same
    # values as the DECIMAL form, ~2× faster (stays in whole-stage codegen).
    # Summed terms peak ~1e11/row → int64-safe to ~9e6 rows per group.
    from vectrekker_spark.queries.util import fixed_long, money_long

    return money_long(F.col("l_extendedprice")) * fixed_long(
        F.lit(1.0) - F.col("l_discount"), 10000
    )


from vectrekker_spark.queries.util import fixed_long_sql, money_long_sql  # noqa: E402

REV_SQL = (
    f"{money_long_sql('l_extendedprice')} * {fixed_long_sql('1.0 - l_discount', 10000)}"
)


def t03_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, filter both sides of the
    # date, group, top-10 by revenue.
    # lineitem is the FACT and must be the stream side: li ⋈ (build o) ⋈
    # (build c) scans lineitem once with the smaller tables as hash builds
    # (locally: broadcasts; at 100 TB the threshold demotes o to a shuffled
    # join and lineitem still never builds). The previous c⋈o⋈li order made
    # Catalyst BROADCAST LINEITEM — fine at sf0.1, an OOM-shaped plan the
    # moment the fact outgrows the threshold, and measurably slower locally
    # (hash-relation build over 600k rows).
    c = tb(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tb(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = tb(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_revenue()) / 1000000.0).alias(REV))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            REV,
        )
        .orderBy(F.col(REV).desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


T03_SQL = f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       CAST(SUM({REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def t05_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q5 shape: 6-table join through both customer and supplier to
    # nation/region, grouped by nation. Dims broadcast; fact joins shuffle.
    r = tb(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = tb(spark, sf, "nation")
    c = tb(spark, sf, "customer")
    s = tb(spark, sf, "supplier")
    o = tb(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = tb(spark, sf, "lineitem")
    # stream-side lineitem (see t03): every other table hash-builds against
    # the single fact scan; the c/s nationkey equality rides the supplier
    # join as a composite key instead of a post-join filter
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_revenue()) / 1000000.0).alias(REV))
        .orderBy(F.col(REV).desc(), F.col("n_name").asc())
    )


T05_SQL = f"""
SELECT n_name, CAST(SUM({REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name ASC
"""


def t10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    c = tb(spark, sf, "customer")
    o = tb(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = tb(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tb(spark, sf, "nation")
    # stream-side lineitem (see t03)
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_revenue()) / 1000000.0).alias(REV))
        .orderBy(F.col(REV).desc(), F.col("c_custkey").asc())
        .limit(20)
    )


T10_SQL = f"""
SELECT c_custkey, c_name, n_name, CAST(SUM({REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


SPECS = [
    # t03 is deliberately NOT registered: the driver caps the registry at 50
    # and t03/t10 exercise the same 3-way-join + agg + top-k shape (r6
    # verdict #6) — t10 keeps that shape driver-checked (it is also the
    # dispersion-watch query), t05 keeps the 6-table breadth, and the freed
    # slot gives BM25 (d24_bm25) a driver oracle row. t03 stays
    # oracle-checked in tests/test_oracle.py::test_t03_oracle_parity.
    QuerySpec("t05_local_supplier_volume", t05_local_supplier_volume, T05_SQL, ("tpch",),
              "TPC-H Q5 shape: 6-table join through dims"),
    QuerySpec("t10_returned_items", t10_returned_items, T10_SQL, ("tpch",),
              "TPC-H Q10 shape: returns revenue top-20"),
]
