"""Benchmark runner (driver contract, BASELINE.md).

Runs every oracle-checkable query from the registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warm-up
execution then the median of 3 timed runs per query, and prints exactly ONE
JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_project": s, ...}, "sf": 0.1}

Timing includes full plan execution to collected results (count via
`_collected`), matching how the DuckDB baseline is measured.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectrekker_spark.queries import all_specs  # noqa: E402
from vectrekker_spark.session import get_spark  # noqa: E402

# Brute-force-by-design queries excluded from the headline set would hide
# real costs — keep everything; the bench IS the honesty check.
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="vectrekker-bench")

    timings: dict[str, float] = {}
    for name, spec in sorted(all_specs().items()):
        df = spec.spark(spark, sf_dir)
        df.collect()  # warm-up: JIT, codegen, file-footer caches
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
