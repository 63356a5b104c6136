"""Time a subset of registered queries exactly like bench.py (toPandas
endpoint, interleaved with DuckDB, median-of-N) — for fast optimization
iteration without paying the full 50-query sweep.

Usage: PYTHONPATH=/root/repo python scripts/time_queries.py q28_sim_dedup d03... [--sf DIR] [--runs N] [--noop]

--noop times the computation against the no-op sink (guide §1.4) instead of
toPandas — isolates plan execution from driver materialization.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectrekker_spark.queries import all_specs  # noqa: E402
from vectrekker_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-duck", action="store_true")
    args = ap.parse_args()

    specs = all_specs()
    spark = get_spark(app_name="time-queries")
    con = None
    if not args.no_duck:
        import duckdb

        from vectrekker_spark.catalog import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf}/{t}.parquet')"
            )

    for name in args.names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"time:{name}")

        def run_spark():
            df = spec.spark(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.toPandas()

        run_spark()  # warm-up
        if con is not None and spec.oracle is not None:
            con.execute(spec.oracle).fetchall()
        ss, ds = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run_spark()
            ss.append(time.perf_counter() - t0)
            if con is not None and spec.oracle is not None:
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                ds.append(time.perf_counter() - t0)
        msg = (
            f"{name}: spark median {statistics.median(ss):.3f}s "
            f"(min {min(ss):.3f}, max {max(ss):.3f})"
        )
        if ds:
            msg += f" | duck median {statistics.median(ds):.3f}s"
        print(msg)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
