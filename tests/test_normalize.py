"""Text normalization (functions/normalize.py): JVM tier vs the shared
Python mirror, exact tier vs stdlib oracles, mojibake repair contract,
compression-ratio signal."""

from __future__ import annotations

import unicodedata
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectrekker_spark.functions.normalize import (
    compression_ratio,
    fix_mojibake_str,
    normalize_text_exact,
    normalize_text_str,
    normalize_ws,
    normalize_ws_str,
)


def _apply_ws(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    return {
        r.i: r.out
        for r in df.withColumn("out", normalize_ws("text")).collect()
    }


WS_CASES = [
    "a  b\tc",
    " lead and trail ",
    "\r\nwin\r\nlines\rmac\n",
    "a\n\n\n\n\nb",
    "x \n y \n\n  z",
    "ctrl\x00\x01\x08\x0b\x0c\x1f\x7fchars",
    "tabs\t\t\tkept as one space",
    "",
    None,
    "\n\n\n",
]


def test_normalize_ws_matches_python_mirror(spark):
    got = _apply_ws(spark, WS_CASES)
    for i, t in enumerate(WS_CASES):
        assert got[i] == normalize_ws_str(t), repr(t)
    # spot contract checks
    assert got[0] == "a b c"
    assert got[1] == "lead and trail"
    assert got[2] == "win\nlines\nmac"
    assert got[3] == "a\n\nb"
    assert got[4] == "x\ny\n\nz"
    assert got[5] == "ctrlchars"
    assert got[9] == ""


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=" \t\n\rabXY9.\x01\x0b\x7f",
        max_size=60,
    )
)
def test_property_ws_tiers_agree(spark, s):
    # one Spark job for the property batch would be slow; evaluate the
    # JVM expression via a literal so hypothesis can drive many cases
    row = spark.range(1).select(normalize_ws(F.lit(s)).alias("o")).first()
    assert row["o"] == normalize_ws_str(s)


def test_mojibake_repair_roundtrip_fixtures():
    for s in ["café", "Größe straße", "déjà vu (résumé)"]:
        moji = s.encode("utf-8").decode("cp1252")
        assert fix_mojibake_str(moji) == s, s
    # '”' is U+201D → bytes E2 80 9D; 0x9D has no cp1252 mapping, so this
    # flavor of mojibake arrives via latin-1 (control-char images) — the
    # repair's latin-1 fallback recovers it
    s = "naïve — “smart quotes” and ’apostrophe’"
    moji = s.encode("utf-8").decode("latin-1")
    assert fix_mojibake_str(moji) == s
    # double-encoded: two passes recover
    s = "café"
    moji2 = (
        s.encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
    )
    assert fix_mojibake_str(moji2) == s


def test_mojibake_repair_is_conservative():
    # legit text with the lead chars but no artifact pattern: unchanged
    for s in [
        "Ã is a letter in some alphabets",
        "â rhymes with nothing",
        "plain ascii text",
        "déjà vu — already clean unicode",
        "",
        None,
    ]:
        assert fix_mojibake_str(s) == s, repr(s)


def test_normalize_text_exact_vs_oracle(spark):
    texts = [
        "cafÃ©  and\tspaces",
        "ﬁne ligature ½ and fullwidth ＡＢＣ",  # NFKC folds these
        "nbsp here",
        None,
        "already clean",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: r.out
        for r in normalize_text_exact(df, out_col="out").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == normalize_text_str(t), repr(t)
    assert got[0] == "café and spaces"
    assert got[1] == "fine ligature 1⁄2 and fullwidth ABC"
    # NFKC turns NBSP into a plain space
    assert got[2] == "nbsp here"
    assert (
        unicodedata.normalize("NFKC", " ") == " "
    )  # the oracle-side fact the case relies on
    with pytest.raises(ValueError, match="form"):
        normalize_text_exact(df, form="NFX")


def test_compression_ratio(spark):
    spam = "buy now " * 200
    prose = (
        "The committee's final report, released after eighteen months of "
        "hearings across four provinces, recommended sweeping changes to "
        "how rural hospitals recruit and keep specialist physicians."
    )
    df = spark.createDataFrame(
        [(0, spam), (1, prose), (2, None), (3, "")],
        "i long, text string",
    )
    got = {r.i: r.compression_ratio for r in compression_ratio(df).collect()}
    for i, t in [(0, spam), (1, prose)]:
        raw = t.encode("utf-8")
        assert got[i] == pytest.approx(len(zlib.compress(raw, 6)) / len(raw))
    assert got[0] < 0.1 < got[1]  # spam compresses far below prose
    assert got[2] is None and got[3] is None
    with pytest.raises(ValueError, match="level"):
        compression_ratio(df, level=0)


def test_exact_tier_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "x")], "i long, text string")
    plan = (
        normalize_text_exact(df, out_col="out")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
