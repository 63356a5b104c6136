"""profile_table: exact stats verified against hand computation, approx
stats bounded, and the one-scan/one-exchange plan shape asserted."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.catalog import load_table
from vectrekker_spark.operators.profile import profile_agg, profile_table
from vectrekker_spark.plans import formatted_plan, scan_count, shuffle_count


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [
        (1, 10.0, "alpha", ["a", "b"], True),
        (2, 20.0, "beta", ["c"], False),
        (3, None, "gamma-long", [], True),
        (4, 40.0, None, None, None),
        (5, 30.0, "d", ["x", "y", "z"], True),
    ]
    return spark.createDataFrame(
        rows, "id long, score double, name string, tags array<string>, flag boolean"
    )


def _by_col(prof):
    return {r["column"]: r.asDict() for r in prof.collect()}


def test_exact_stats(spark, fixture_df):
    p = _by_col(profile_table(fixture_df))
    assert set(p) == {"id", "score", "name", "tags", "flag"}

    idp = p["id"]
    assert idp["n_rows"] == 5 and idp["n_nonnull"] == 5
    assert idp["null_frac"] == 0.0
    assert idp["min"] == "1" and idp["max"] == "5"
    assert idp["mean"] == 3.0
    assert math.isclose(idp["stddev"], 1.5811388300841898)

    sc = p["score"]
    assert sc["n_nonnull"] == 4 and sc["null_frac"] == pytest.approx(0.2)
    assert sc["mean"] == pytest.approx(25.0)
    assert float(sc["min"]) == 10.0 and float(sc["max"]) == 40.0
    # percentile_approx on 4 values: median in [20, 30], quartiles bracket
    p25, p50, p75 = sc["percentiles"]
    assert 10.0 <= p25 <= 20.0 and 20.0 <= p50 <= 30.0 and 30.0 <= p75 <= 40.0

    nm = p["name"]
    assert nm["n_nonnull"] == 4 and nm["min"] == "alpha" and nm["max"] == "gamma-long"
    assert nm["avg_len"] == pytest.approx((5 + 4 + 10 + 1) / 4)
    assert nm["max_len"] == 10
    assert nm["mean"] is None and nm["percentiles"] is None

    tg = p["tags"]
    assert tg["n_nonnull"] == 4
    assert tg["avg_len"] == pytest.approx((2 + 1 + 0 + 3) / 4)
    assert tg["max_len"] == 3
    assert tg["min"] is None  # arrays are unordered in the profile

    fl = p["flag"]
    assert fl["n_nonnull"] == 4 and fl["approx_distinct"] == 2


def test_approx_distinct_tolerance(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = docs.select(F.countDistinct("doc_id")).collect()[0][0]
    p = _by_col(profile_table(docs, columns=["doc_id"], rsd=0.05))
    approx = p["doc_id"]["approx_distinct"]
    assert abs(approx - exact) <= max(2, 0.15 * exact)


def test_struct_field_and_subset(spark):
    df = spark.createDataFrame(
        [(1, {"w": 10}), (2, {"w": 30}), (3, None)],
        "id long, meta struct<w:long>",
    )
    p = _by_col(profile_table(df, columns=["meta.w"]))
    assert p["meta.w"]["n_nonnull"] == 2 and p["meta.w"]["mean"] == 20.0


def test_empty_table(spark):
    df = spark.createDataFrame([], "id long, name string")
    p = _by_col(profile_table(df))
    assert p["id"]["n_rows"] == 0 and p["id"]["null_frac"] == 0.0


def test_validation(spark, fixture_df):
    with pytest.raises(ValueError, match="percentile"):
        profile_table(fixture_df, percentiles=(1.5,))
    with pytest.raises(ValueError, match="no columns"):
        profile_agg(fixture_df.select())


def test_single_scan_single_exchange(spark, sf_dir):
    """The profile of an N-column table is ONE scan and ONE exchange (the
    single combined-row final aggregate) — not a pass per column."""
    docs = load_table(spark, sf_dir, "documents")
    agg = profile_agg(docs)
    assert shuffle_count(agg) <= 1
    assert scan_count(agg) == 1
    assert "EvalPython" not in formatted_plan(agg)

# --- drift detection --------------------------------------------------------


def test_profile_diff_flags(spark):
    from vectrekker_spark.operators.profile import profile_diff

    base = spark.createDataFrame(
        [(i, float(i % 10), f"u{i}") for i in range(200)],
        "id long, score double, user string",
    )
    # drifted: score's mean jumps far beyond 3 old-sigmas, user goes
    # half-null, id gains a dtype change, and a column appears/disappears
    drifted = spark.createDataFrame(
        [
            (str(i), float(1000 + i % 10), f"u{i}" if i % 2 else None, i)
            for i in range(200)
        ],
        "id string, score double, user string, extra long",
    )
    prof_old = profile_table(base)
    prof_new = profile_table(drifted, columns=["id", "score", "user", "extra"])
    diff = {r["column"]: r for r in profile_diff(prof_old, prof_new).collect()}
    assert "dtype_changed" in diff["id"]["flags"]
    assert "mean_shift" in diff["score"]["flags"]
    assert "null_frac_jump" in diff["user"]["flags"]
    assert diff["extra"]["status"] == "added"
    assert diff["score"]["mean_shift_sigmas"] > 100


def test_profile_diff_clean_is_ok(spark, fixture_df):
    from vectrekker_spark.operators.profile import profile_diff

    p = profile_table(fixture_df)
    diff = profile_diff(p, p).collect()
    assert all(r["status"] == "ok" and r["flags"] == [] for r in diff)
    with pytest.raises(ValueError, match="distinct_ratio_band"):
        profile_diff(p, p, distinct_ratio_band=(2.0, 0.5))


def test_profile_diff_constant_history_and_feed_revival(spark):
    """Two blind spots: a constant-history column whose mean moves is
    infinite sigmas (must flag), and an all-null column coming alive must
    flag instead of sailing through."""
    from vectrekker_spark.operators.profile import profile_diff

    old = spark.createDataFrame(
        [(2.0, None) for _ in range(50)], "version double, feature string"
    )
    new = spark.createDataFrame(
        [(3000.0, f"v{i}") for i in range(50)], "version double, feature string"
    )
    diff = {r["column"]: r for r in profile_diff(
        profile_table(old), profile_table(new)).collect()}
    assert "mean_shift" in diff["version"]["flags"]
    assert diff["version"]["mean_shift_sigmas"] == float("inf")
    assert "null_frac_drop" in diff["feature"]["flags"]
    assert "distinct_ratio" in diff["feature"]["flags"]
