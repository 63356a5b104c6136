"""Repetition quality metrics (operators/repetition.py): hand-computed
fractions on planted docs, the zero-gram edge case, and the Gopher-style
threshold filter. Oracle parity for d23_repetition runs in test_oracle.py."""

from __future__ import annotations

import pytest

from vectrekker_spark.operators.repetition import (
    filter_repetitive,
    repetition_report,
)

DOCS = [
    (1, "buy now buy now buy now"),  # heavy 2/3-gram repetition
    (2, "alpha beta gamma delta epsilon zeta"),  # clean prose stand-in
    (3, "one\ntwo\ntwo\ntwo"),  # duplicate lines
    (4, "hi"),  # fewer tokens than any k: no grams at all
]


@pytest.fixture(scope="module")
def report(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in repetition_report(df).collect()}


def test_gram_fractions(report):
    # doc 1: 2-grams = [buy now]*3 + [now buy]*2 → top 3/5, dup (3+2)/5;
    # 3-grams = [buy now buy]*2 + [now buy now]*2 → dup 4/4.
    assert report[1]["top2gram_frac"] == pytest.approx(0.6)
    assert report[1]["dup3gram_frac"] == 1.0
    # doc 2: 5 distinct 2-grams → top 1/5, no dup 3-grams.
    assert report[2]["top2gram_frac"] == pytest.approx(0.2)
    assert report[2]["dup3gram_frac"] == 0.0


def test_dup_line_fraction(report):
    assert report[3]["dup_line_frac"] == pytest.approx(0.5)  # 1 - 2/4
    assert report[1]["dup_line_frac"] == 0.0  # single line


def test_no_grams_edge(report):
    # 1 token < k → empty gram stream → fractions coalesce to 0, not null.
    assert report[4]["top2gram_frac"] == 0.0
    assert report[4]["dup3gram_frac"] == 0.0
    assert report[4]["dup_line_frac"] == 0.0


def test_filter_repetitive(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = {r["doc_id"] for r in filter_repetitive(df).select("doc_id").collect()}
    # doc1 breaches top2 (0.6 > 0.2) and dup3 (1.0 > 0.6); doc3 breaches top2
    # (2/3) — doc2 sits exactly AT the 0.2 threshold (not >) and survives.
    assert kept == {2, 4}


def test_filter_rules_can_be_disabled(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = {
        r["doc_id"]
        for r in filter_repetitive(
            df,
            max_dup_line_frac=None,
            max_top2gram_frac=None,
            max_dup3gram_frac=0.6,
        )
        .select("doc_id")
        .collect()
    }
    assert kept == {2, 3, 4}  # only doc1's dup3=1.0 breaches


def test_null_and_empty_text_docs_are_retained(spark):
    """The sentinel row (join-free zero-fill) must keep every document in
    the report — NULL text (where the gram-array concat is NULL) and empty
    text included — with 0.0 fractions, matching the old join-based
    zero-fill behavior."""
    from vectrekker_spark.operators.repetition import repetition_report

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a a a a")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_report(df).collect()}
    assert set(rows) == {0, 1, 2}
    for d in (0, 1):
        assert rows[d]["top2gram_frac"] == 0.0
        assert rows[d]["dup3gram_frac"] == 0.0
    assert rows[2]["top2gram_frac"] == 1.0  # "a a" is every 2-gram
    assert rows[2]["dup3gram_frac"] == 1.0  # "a a a" repeats


def test_repetition_report_is_zero_shuffle(spark):
    """The r14 kernel form's point: per-doc metrics never shuffle grams —
    the report plan is scan → MapInPandas, no Exchange at all."""
    from vectrekker_spark.operators.repetition import repetition_report
    from vectrekker_spark.plans import formatted_plan, shuffle_count

    df = spark.createDataFrame(
        [(0, "a b c a b"), (1, None)], "doc_id long, text string"
    )
    rep = repetition_report(df)
    assert shuffle_count(rep) == 0
    assert "MapInPandas" in formatted_plan(rep)


def test_repetition_report_rounding_stays_sparkside(spark):
    """Counts come from the kernel as exact integers; the fraction math and
    round(…, 6) run as Spark expressions — pin a case whose fraction needs
    HALF_UP rounding to stay engine-exact (1/3 = 0.333333…)."""
    from vectrekker_spark.operators.repetition import repetition_report

    # 4 tokens → three 2-grams, one duplicated pair: "x y", "y x", "x y"
    df = spark.createDataFrame([(0, "x y x y")], "doc_id long, text string")
    r = repetition_report(df).collect()[0]
    assert r["top2gram_frac"] == 0.666667  # 2/3 HALF_UP at 6 dp
    assert r["dup3gram_frac"] == 0.0  # both 3-grams distinct
