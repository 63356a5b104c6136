"""Derive a larger-scale, multi-split dataset from an existing fixture dir.

Usage: python scripts/make_scale_data.py [src_sf_dir] [out_dir] [factor] [files]

Key-shifted replication: each replica i of a table gets every key column
shifted by i * stride (stride = a power of ten above the source max key), so
FK integrity (orders→customer→nation, lineitem→orders/part/supplier) holds
across replicas and every replica's rows are distinct entities. Dim tables
(region, nation) are shared, exactly like a real star at scale. Text and
vector payloads are replicated verbatim — an exact-duplicate-heavy corpus is
the WORST case for the dedup/similarity operators, which is what a scale
validation wants.

The output layout is the at-scale shape the serial-plan gates must disengage
on: each table is a DIRECTORY named {table}.parquet holding `files` part
files (multi-split scans), written into a scratch dir OUTSIDE the read-only
/root/testdata. scripts/scale_validation.py runs the heavy queries against
it end-to-end.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from vectrekker_spark.catalog import TABLES, load_table  # noqa: E402
from vectrekker_spark.session import get_spark  # noqa: E402

# key columns per table; every one shifts by replica * stride[key-family]
KEY_FAMILIES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}
SHARED_DIMS = {"region", "nation"}


def _stride(spark, src: str, family: str, cols) -> int:
    """Power-of-ten stride above the family's max source key."""
    m = 0
    for table, col in cols:
        v = load_table(spark, src, table).agg(F.max(col)).collect()[0][0]
        m = max(m, int(v or 0))
    return 10 ** (int(math.log10(max(m, 1))) + 1)


def replicate(spark, src: str, out: str, factor: int, files: int) -> None:
    strides: dict[tuple[str, str], int] = {}
    for fam, cols in KEY_FAMILIES.items():
        s = _stride(spark, src, fam, cols)
        for tc in cols:
            strides[tc] = s

    for t in TABLES:
        base = load_table(spark, src, t)
        dest = os.path.join(out, f"{t}.parquet")
        if t in SHARED_DIMS:
            base.write.mode("overwrite").parquet(dest)
            continue
        shifted_cols = {c: s for (tt, c), s in strides.items() if tt == t}
        reps: list[DataFrame] = []
        for i in range(factor):
            r = base
            for c, s in shifted_cols.items():
                r = r.withColumn(c, (F.col(c) + F.lit(i * s)).cast("long"))
            reps.append(r)
        un = reps[0]
        for r in reps[1:]:
            un = un.unionByName(r)
        # round-robin spread → `files` roughly equal part files (multi-split)
        un.repartition(files).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows -> {dest}")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    files = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spark = get_spark(app_name="make-scale-data")
    replicate(spark, src, out, factor, files)
    print(f"done: {out} (factor {factor}, {files} files/table)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
