"""CI pins for the kernel differential fuzzer (scripts/kernel_fuzz.py,
VERDICT r11 #5 — the text/vector-kernel counterpart of test_diff_fuzz).

Pins:

1. A fixed-seed fuzz run at fixture scale — generator drift (a param draw
   that renders invalid mirror SQL, or a kernel change that breaks parity)
   fails here first, not in a round's exploratory campaign.

2. The kernel-contract findings the harness's first session surfaced,
   asserted directly so they stay fixed:
   - char_shingles over NULL text yields [''] (the word_shingles rule),
     NOT [NULL] — one junk NULL shingle per null doc pre-r12.
   - split_bucket_sql escapes quotes in the salt (it renders a VALUE into
     a SQL literal).
"""

from __future__ import annotations

import duckdb
import pytest

from scripts.kernel_fuzz import fuzz


@pytest.fixture()
def duck_docs(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def test_kernel_fuzz_fixed_seed(spark, sf_dir, duck_docs, tmp_path):
    failures = fuzz(
        spark,
        duck_docs,
        sf_dir,
        n=25,
        seed=7,
        keep_going=True,
        out_dir=str(tmp_path / "fuzz_failures"),
    )
    assert failures == []


def test_char_shingles_null_text_is_empty_shingle(spark):
    from pyspark.sql import functions as F

    from vectrekker_spark.functions.text import char_shingles, word_shingles

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abc")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["cs"], r["ws"])
        for r in df.select(
            "doc_id",
            char_shingles("text", 3).alias("cs"),
            word_shingles("text", 2).alias("ws"),
        ).collect()
    }
    assert rows[1] == ([""], [""])  # NULL ≡ '' — no [NULL] junk shingle
    assert rows[2] == ([""], [""])
    assert rows[3] == (["abc"], ["abc"])


def test_split_bucket_sql_escapes_salt_quotes(spark):
    from pyspark.sql import functions as F

    from vectrekker_spark.operators.split import split_bucket, split_bucket_sql

    salt = "q3'24"
    frag = split_bucket_sql("i", salt=salt)
    con = duckdb.connect()
    orows = con.execute(
        f"SELECT i, {frag} AS b FROM generate_series(0, 49) t(i) ORDER BY i"
    ).fetchall()
    srows = (
        spark.range(50)
        .select(F.col("id").alias("i"), split_bucket("id", salt=salt).alias("b"))
        .orderBy("i")
        .collect()
    )
    assert [(r["i"], r["b"]) for r in srows] == orows

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
