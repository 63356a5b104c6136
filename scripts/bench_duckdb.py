"""DuckDB baseline timings (BASELINE.md): run every oracle SQL at the bench
scale factor, median of 3 warm runs, print one JSON line. Used to compare
bench.py output against the defined baseline."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectrekker_spark.catalog import TABLES  # noqa: E402
from vectrekker_spark.queries import all_specs  # noqa: E402

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings = {}
    for name, spec in sorted(all_specs().items()):
        if spec.oracle is None:
            continue
        con.execute(spec.oracle).fetchall()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_total_query_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
