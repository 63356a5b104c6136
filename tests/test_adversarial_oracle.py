"""Adversarial-fixture oracle parity: run the REAL registered specs and
their REAL DuckDB oracles against planted edge-case tables (unmatched FK
rows, NULL keys, NULL/empty/whitespace text, missing JSON fields) written to
a tmp dir. The driver's gate only sees the well-behaved generated fixtures;
these pin the r7 rewrites' equivalences (q06 pre-aggregated outer joins,
q11 cuboid-derived rollup/cube, q19 grouping-sets single parse, d24 BM25
stable fold) on data shaped to break them."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from collections import Counter

from tests.helpers import canon
from vectrekker_spark.queries import all_specs

SPECS = all_specs()


def _write(tmp_path, name: str, df: pd.DataFrame) -> None:
    df.to_parquet(tmp_path / f"{name}.parquet", index=False)


def _parity(spark, tmp_path, name: str):
    # multiset compare (NULL sort keys make tuple-sorting ill-typed here;
    # the driver's hash gate is order-insensitive the same way)
    spec = SPECS[name]
    sdf = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        import os

        for f in os.listdir(tmp_path):
            if f.endswith(".parquet"):
                con.execute(
                    f"CREATE VIEW {f[:-8]} AS "
                    f"SELECT * FROM read_parquet('{tmp_path / f}')"
                )
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = Counter(tuple(canon(v) for v in r) for r in res.fetchall())
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(ocols)
    srows = Counter(tuple(canon(v) for v in r) for r in sdf.collect())
    assert srows == orows, (srows - orows, orows - srows)
    return sum(srows.values())


def test_q06_outer_joins_adversarial(spark, tmp_path):
    # customers with no orders, orders with no customer, NULL o_custkey,
    # and a customer with many orders — the pre-aggregated rewrite must
    # match the row-level SQL on every one of these.
    _write(tmp_path, "customer", pd.DataFrame({"c_custkey": [1, 2, 3, 4]}))
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [10, 11, 12, 13, 14, 15],
                "o_custkey": pd.array([1, 1, 1, 2, 999, None], dtype="Int64"),
            }
        ),
    )
    assert _parity(spark, tmp_path, "q06_outer_joins") == 8  # 4 customers × 2


def test_q11_grouping_sets_adversarial(spark, tmp_path):
    # NULL o_orderpriority / o_orderstatus values: genuine-NULL groups and
    # rollup/cube subtotal rows both display as 'ALL' (the documented
    # conflation) — the cuboid rewrite must reproduce BOTH rows exactly.
    # FKs deliberately broken: a dangling o_custkey (999), a NULL
    # o_custkey, and a customer whose nationkey matches no nation — the
    # oracle's CUBE is over raw orders (keeps all three shapes) while its
    # ROLLUP inner-joins (drops them); the single-scan cuboid must
    # reproduce both via its left-join + matched-flag split.
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(11),
                "o_custkey": pd.array(
                    [1, 1, 2, 2, 3, 3, 1, 2, 999, None, 4], dtype="Int64"
                ),
                "o_orderstatus": pd.array(
                    ["O", None, "F", "O", None, "F", "O", "F", "O", "F", "O"]
                ),
                "o_orderpriority": pd.array(
                    ["1-URGENT", "1-URGENT", None, "2-HIGH", None, "2-HIGH",
                     None, "1-URGENT", "2-HIGH", None, "1-URGENT"]
                ),
                "o_totalprice": [10.5, 20.25, 30.0, 40.75, 50.0, 60.5, 70.0,
                                 80.25, 11.0, 12.5, 13.75],
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pd.DataFrame({"c_custkey": [1, 2, 3, 4], "c_nationkey": [0, 0, 1, 9]}),
    )
    _write(
        tmp_path,
        "nation",
        pd.DataFrame({"n_nationkey": [0, 1], "n_name": ["AAA", "BBB"]}),
    )
    _parity(spark, tmp_path, "q11_grouping_sets")


def test_q19_json_adversarial(spark, tmp_path):
    # props: k present / k missing / empty object / NULL props; NULL
    # event_type. One from_json must agree with the oracle's per-branch
    # json_extract on every shape.
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(8),
                "user_id": [1] * 8,
                "event_type": pd.array(
                    ["click", "click", None, "view", "view", None, "click", "view"]
                ),
                "ts": pd.to_datetime(["2024-01-01"] * 8),
                "value": [1.0] * 8,
                "props": pd.array(
                    [
                        '{"k": 10}', '{"k": 55}', '{"k": 100}', "{}",
                        None, '{"k": 7}', '{"k": 0}', '{"k": -20}',
                    ]
                ),
            }
        ),
    )
    _parity(spark, tmp_path, "q19_json")


def test_d24_bm25_adversarial(spark, tmp_path):
    # NULL text (scores 0, excluded from corpus stats), empty and
    # whitespace-only text (dl=0), repeated query terms, docs with no hits.
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(7),
                "text": pd.array(
                    [
                        "data data data merge",
                        "vector scan",
                        None,
                        "",
                        "   ",
                        "nothing relevant here at all",
                        "DATA Merge VECTOR scan data",
                    ]
                ),
            }
        ),
    )
    assert _parity(spark, tmp_path, "d24_bm25") == 7


def test_q07_semi_anti_adversarial(spark, tmp_path):
    # NULL join keys on both probe sides: NULL never matches in EXISTS or
    # NOT EXISTS — both engines must agree on which rows survive. The
    # merged set-op arms flip that rule: EXCEPT/INTERSECT group NULLs as
    # EQUAL (set-op null-safe semantics), so the NULL o_custkey must
    # SURVIVE the except arm in both engines.
    _write(tmp_path, "customer", pd.DataFrame(
        {"c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"],
         "c_acctbal": [6000.0, 100.0, 100.0]}))
    _write(tmp_path, "orders", pd.DataFrame(
        {"o_orderkey": [1, 2, 3],
         "o_custkey": pd.array([1, None, 9], dtype="Int64")}))
    _write(tmp_path, "part", pd.DataFrame(
        {"p_partkey": [7, 8, 9], "p_name": ["x", "y", "z"]}))
    _write(tmp_path, "lineitem", pd.DataFrame(
        {"l_orderkey": [1, 1, 2],
         "l_partkey": pd.array([7, None, 99], dtype="Int64")}))
    # semi: only customer 1; anti: parts 8 and 9 (NULL l_partkey matches no
    # part; 99 references nothing); except: {1, NULL, 9} minus rich {1} =
    # {NULL, 9}; intersect: {1}
    assert _parity(spark, tmp_path, "q07_semi_anti_join") == 6


def test_d26_semantic_dedup_adversarial(spark, tmp_path):
    # NULL embedding in row 0 (must not poison the dim probe — size(NULL)
    # is -1 under legacy sizeOfNull), a planted near-dup pair, a negative
    # -sign-pattern vector, and a vector with a zero first component (the
    # quantizer tie case: round-6-equal scores → min cid, both engines).
    _write(tmp_path, "embeddings", pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4],
        "embedding": pd.Series([
            None,
            [1.0, 0.5, 0.25, 0.1],
            [1.0, 0.5, 0.2500001, 0.1],   # near-dup of 1, same cell
            [-1.0, -0.5, -0.25, 0.1],     # opposite sign cell
            [0.0, 0.5, 0.25, 0.1],        # e0 == 0 → tie → lower cid
        ], dtype=object),
    }))
    assert _parity(spark, tmp_path, "d26_semantic_dedup") == 5


def test_d26_all_null_embeddings_adversarial(spark, tmp_path):
    # no quantizable vectors at all: every row is the trivially-kept
    # NULL-cid arm in BOTH engines (the Spark side short-circuits without
    # building centroids; the oracle's cells CTE is empty). pandas cannot
    # infer list<double> from all-None, so the schema is explicit.
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {"vec_id": pa.array([7, 8], pa.int64()),
         "embedding": pa.array([None, None], pa.list_(pa.float64()))}
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    assert _parity(spark, tmp_path, "d26_semantic_dedup") == 2


_NASTY_WS_DOCS = pd.DataFrame(
    {
        "doc_id": range(8),
        "text": pd.array(
            [
                # Unicode whitespace (NBSP, line-sep, ideographic space):
                # TOKEN CONTENT under the engine's Java/RE2 tokenization —
                # Python str.split() would tokenize these differently
                "intro\u00a0text alpha beta gamma delta",
                "intro text alpha beta gamma delta",
                "a\u2028b c d e f g",
                "x\u3000y\u2028z w v u t",
                # boundary non-space whitespace: trim strips only spaces,
                # so Java split yields boundary '' tokens
                "\tlead alpha beta gamma delta tail\n",
                " spaced   out alpha beta gamma delta ",
                None,
                "",
            ]
        ),
    }
)


@pytest.mark.parametrize("name", ["d01_minhash", "d17_count_min", "q20_hash_embed_udf"])
def test_python_kernels_ascii_tokenize_adversarial(spark, tmp_path, name):
    # regression: the minhash / count-min / hash-embed Arrow kernels once
    # tokenized with Python's UNICODE whitespace (str.split / re \s) while
    # their DuckDB oracles and the JVM verification paths split on the
    # ASCII class — green on the ASCII fixtures, silently divergent on
    # scraped-web text. Parity on planted Unicode/boundary whitespace pins
    # the shared functions/pytokens twins.
    _write(tmp_path, "documents", _NASTY_WS_DOCS)
    assert _parity(spark, tmp_path, name) > 0
