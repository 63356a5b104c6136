"""Dev harness: run every registered QuerySpec on Spark and DuckDB, compare.

Usage: python scripts/smoke_oracle.py [sf_dir] [name_substring]
Mirrors the driver's t2 check (row count + columns + values) with a float
tolerance so mismatches are debuggable before the strict hash gate runs.
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

import duckdb

from vectrekker_spark.catalog import TABLES
from vectrekker_spark.queries import all_specs
from vectrekker_spark.session import get_spark


def canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    needle = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    failures = 0
    for name, s in sorted(all_specs().items()):
        if needle and needle not in name:
            continue
        t0 = time.time()
        try:
            sdf = s.spark(spark, sf)
            srows = sorted(tuple(canon(v) for v in r) for r in sdf.collect())
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK FAIL {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        if s.oracle is None:
            print(f"{name}: spark-only rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(s.oracle)
            ocols = [d[0] for d in res.description]
            orows = sorted(tuple(canon(v) for v in r) for r in res.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE FAIL {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        ok = srows == orows and sorted(scols) == sorted(ocols)
        if ok:
            print(f"{name}: OK rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            failures += 1
            print(
                f"{name}: MISMATCH spark_rows={len(srows)} oracle_rows={len(orows)} "
                f"spark_cols={scols} oracle_cols={ocols}"
            )
            for a, b in zip(srows, orows):
                if a != b:
                    print(f"  first diff:\n   spark : {a}\n   oracle: {b}")
                    break
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
