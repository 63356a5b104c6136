"""CI pins for the seeded differential-testing harness (scripts/diff_fuzz.py,
VERDICT r10 #1).

Two pins:

1. A fixed-seed fuzz run at fixture scale — the generator itself must not
   drift (a generator change that silently produces invalid SQL or trips a
   new engine divergence fails here first, not in a round's exploratory run).

2. The one KNOWN ENGINE DIVERGENCE the harness found on its first run,
   asserted in BOTH directions: Spark's grouping-sets over an EMPTY input
   returns no rows, DuckDB (per ANSI — the `()` grouping set is a global
   aggregate) returns exactly one grand-total row. diff_fuzz classifies
   that case instead of failing; this test notices if a Spark upgrade
   changes the behavior so the classifier can be retired.
"""

from __future__ import annotations

import duckdb
import pytest

from scripts.diff_fuzz import TABLES, fuzz


@pytest.fixture()
def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_fuzz_fixed_seed(spark, sf_dir, duck_con, tmp_path):
    from vectrekker_spark.catalog import register_views

    register_views(spark, sf_dir)
    failures = fuzz(
        spark,
        duck_con,
        n=40,
        seed=11,
        keep_going=True,
        out_dir=str(tmp_path / "fuzz_failures"),
    )
    assert failures == []


def test_empty_input_grouping_sets_divergence_pinned(spark, duck_con):
    """The committed regression from the harness's first mismatch (r11,
    minimized from seed11_q24/q46): empty input + ROLLUP/CUBE. If either
    engine's behavior moves, this fails and diff_fuzz's
    expected_empty_grouping_row classifier must be revisited."""
    sql = (
        "SELECT COUNT(*) AS c0, MIN(n_nationkey) AS c1 FROM nation "
        "WHERE n_nationkey < 0 GROUP BY ROLLUP(n_name, n_regionkey)"
    )
    assert spark.sql(sql).collect() == []  # Spark: no rows at all
    assert duck_con.execute(sql).fetchall() == [(0, None)]  # DuckDB: ANSI row

    # the non-empty case agrees (same query, satisfiable filter): guards
    # against over-classifying — the divergence is ONLY the empty input
    sql2 = (
        "SELECT COUNT(*) AS c0 FROM nation WHERE n_nationkey < 3 "
        "GROUP BY ROLLUP(n_regionkey) ORDER BY 1 ASC NULLS FIRST"
    )
    s = [tuple(r) for r in spark.sql(sql2).collect()]
    d = duck_con.execute(sql2).fetchall()
    assert s == d and len(s) >= 2

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
