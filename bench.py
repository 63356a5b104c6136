"""Benchmark runner (driver contract, BASELINE.md).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warm-up execution then
the median of 3 timed runs per query, and prints exactly ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q02_filter": s, ...}, "sf": 0.1,
     "duckdb": {...}, "ratio": {...}}

Timing covers full plan execution to fully-materialized driver-side results:
Arrow `toPandas()` — every result row crosses to Python, same endpoint as
the DuckDB baseline's `fetchall()`. The DuckDB baseline is re-measured in
the same process on the same files each run (the stored baseline went stale
in round 1), so the JSON line is self-contained: per-query ratio > 1 means
Spark is slower.
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


def bench_spark(sf_dir: str) -> dict[str, float]:
    spark = get_spark(app_name="vectrekker-bench")
    timings: dict[str, float] = {}
    for name, spec in sorted(all_specs().items()):
        spec.spark(spark, sf_dir).toPandas()  # warm-up: JIT, codegen, footers
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).toPandas()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
    return timings


def bench_duckdb(sf_dir: str) -> dict[str, float]:
    import duckdb

    from vectrekker_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
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
    return timings


def ann_recall_at_10(sf_dir: str) -> float:
    """Recall@10 of the kmeans IVF build (25 cells, multi-assign 2) at
    n_probe=8 vs exact brute force, over the first 10 query vectors —
    untimed quality metric. Measured 0.90 on the sf0.1 fixture (target
    ≥ 0.8, SURVEY.md §2.2 V5); see ivf_build docstring for the
    multi-assignment recall/cost tradeoff."""
    from pyspark.sql import functions as F

    from vectrekker_spark.operators.ann import ivf_build, ivf_search
    from vectrekker_spark.operators.knn import knn_join

    spark = get_spark(app_name="vectrekker-bench")
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact: dict[int, set[int]] = {}
    for r in knn_join(q, em, k=10).collect():
        exact.setdefault(r["qid"], set()).add(r["vec_id"])
    centroids, assign = ivf_build(em, n_centroids=25, assign_k=2)
    got: dict[int, set[int]] = {}
    for r in ivf_search(q, em, centroids, assign, k=10, n_probe=8).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    em.unpersist()
    return round(
        sum(len(got.get(x, set()) & exact[x]) for x in exact) / (10 * len(exact)), 3
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    timings = bench_spark(sf_dir)
    duck = bench_duckdb(sf_dir)
    recall = ann_recall_at_10(sf_dir)

    total = round(sum(timings.values()), 4)
    # comparable totals: only oracle-checkable queries exist on both sides
    common = sorted(set(timings) & set(duck))
    spark_common = round(sum(timings[q] for q in common), 4)
    duck_common = round(sum(duck[q] for q in common), 4)
    ratio = {
        q: round(timings[q] / duck[q], 2) if duck[q] > 0 else None for q in common
    }
    # The printed line stays small (scalars first, then the one required
    # per-query map) so the driver's bounded tail capture parses it; the
    # three per-query detail dicts go to a sidecar file instead.
    # method: r2+ measure Arrow-materialized toPandas() and re-measure DuckDB
    # in-process — not comparable with r1's collect()-based numbers.
    summary = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "total_ratio": round(spark_common / duck_common, 3) if duck_common else None,
        "ann_recall_at_10": recall,
        "spark_total_common": spark_common,
        "duckdb_total_common": duck_common,
        "method": "toPandas-vs-duckdb-inproc-median3",
        "queries": timings,
    }
    detail = dict(summary, duckdb=duck, ratio=ratio)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_out.json"), "w") as f:
        json.dump(detail, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
