"""t2 machinery (SURVEY.md §7 M0): every registered query runs on Spark AND
DuckDB; canonicalized results must be identical. This mirrors the driver's
CORRECTNESS gate at sf0.001 for speed."""

from __future__ import annotations

import pytest

from tests.helpers import duck_rows, rows_of
from vectrekker_spark.queries import all_specs

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = SPECS[name]
    sdf = spec.spark(spark, sf_dir)
    srows = rows_of(sdf)
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check (driver does the same)
        return
    ocols, orows = duck_rows(duck, spec.oracle)
    assert sorted(sdf.columns) == sorted(ocols), "column sets differ"
    assert len(srows) == len(orows), f"row count {len(srows)} != {len(orows)}"
    assert srows == orows


def test_t03_oracle_parity(spark, duck, sf_dir):
    """t03 was deregistered to free a driver slot for d24_bm25 (the
    registry is capped at 50); the spec itself stays oracle-checked here so
    the TPC-H Q3 shape keeps a green correctness signal."""
    from vectrekker_spark.queries.tpch import T03_SQL, t03_shipping_priority

    sdf = t03_shipping_priority(spark, sf_dir)
    ocols, orows = duck_rows(duck, T03_SQL)
    assert sorted(sdf.columns) == sorted(ocols)
    assert rows_of(sdf) == orows


def test_get_json_object_parity(spark, duck, sf_dir):
    """Path-extraction JSON access (`get_json_object` ≡ DuckDB
    json_extract_string): q19 now parses with one schema'd from_json, so
    this keeps the path-style API oracle-covered (SURVEY §2 Map/JSON row)."""
    from pyspark.sql import functions as F

    sdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").cast("long").alias("k"),
        )
        .orderBy("event_id")
    )
    _, orows = duck_rows(
        duck,
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
        "FROM events ORDER BY event_id",
    )
    assert rows_of(sdf) == orows
