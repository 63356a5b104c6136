"""Regression tests for code-review findings: l2 similarity-join semantics,
stale derived rows on re-index, winnowing tiny-doc oracle parity, phantom
frame-0, BLAS join edge cases."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vectrekker_spark.operators.knn import similarity_join, similarity_join_blas
from vectrekker_spark.operators.multimodal import frame_sample_plan
from vectrekker_spark.pipeline import PipelineConfig, run_pipeline


def test_l2_similarity_join_keeps_near_pairs(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [9.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    out = similarity_join(
        df, df, threshold=0.5, metric="l2",
        left_id="vec_id", left_vec="embedding",
        right_id="vec_id", right_vec="embedding",
    ).collect()
    assert {(r["l_id"], r["r_id"]) for r in out} == {(1, 2)}  # near pair, not far ones


def test_similarity_join_cross_dataset_unordered(spark):
    q = spark.createDataFrame([(100, [1.0, 0.0])], "vec_id long, embedding array<double>")
    c = spark.createDataFrame([(5, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = similarity_join(
        q, c, threshold=0.9, ordered_pairs=False,
        left_id="vec_id", left_vec="embedding",
        right_id="vec_id", right_vec="embedding",
    ).collect()
    assert [(r["l_id"], r["r_id"]) for r in out] == [(100, 5)]  # 100<5 is false; kept anyway


def test_blas_join_empty_right_and_string_ids(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    full = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    assert similarity_join_blas(
        full, empty, 0.5,
        left_id="vec_id", left_vec="embedding", right_id="vec_id", right_vec="embedding",
    ).count() == 0

    s = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.01])], "id string, embedding array<double>"
    )
    out = similarity_join_blas(
        s, s, 0.9,
        left_id="id", left_vec="embedding", right_id="id", right_vec="embedding",
    ).collect()
    assert {(r["l_id"], r["r_id"]) for r in out} == {("a", "b")}


def test_frame_sample_no_phantom_frame(spark):
    df = spark.createDataFrame([(1, b"short"), (2, None)], "media_id long, content binary")
    assert frame_sample_plan(df, every_n=1, frame_size=1024).count() == 0


def test_reindex_retires_stale_chunks(spark, tmp_path):
    content = tmp_path / "content"
    content.mkdir()
    (content / "long.md").write_text("tok " * 2000)  # 2000 tokens → chunked
    cfg = PipelineConfig(
        content_dir=str(content),
        state_path=str(tmp_path / "state"),
        index_path=str(tmp_path / "index"),
        chunk_size=1000, chunk_overlap=100, max_tokens=500,
    )
    run_pipeline(spark, cfg)
    n_before = spark.read.parquet(cfg.index_path).count()
    assert n_before >= 8  # many chunks

    import os

    st = (content / "long.md").stat()
    (content / "long.md").write_text("tok " * 600)  # shrinks to fewer chunks
    os.utime(content / "long.md", (st.st_atime, st.st_mtime + 2))
    run_pipeline(spark, cfg)
    idx = spark.read.parquet(cfg.index_path)
    n_after = idx.count()
    assert n_after < n_before  # stale chunk ids retired, not left behind
    assert idx.select("doc_path").distinct().count() == 1


def test_doc_growing_past_limit_retires_index_rows(spark, tmp_path):
    content = tmp_path / "content"
    content.mkdir()
    (content / "a.md").write_text("small doc indexed whole")
    cfg = PipelineConfig(
        content_dir=str(content),
        state_path=str(tmp_path / "state"),
        index_path=str(tmp_path / "index"),
        quarantine_path=str(tmp_path / "quar"),
        max_tokens=100,
    )
    run_pipeline(spark, cfg)
    assert spark.read.parquet(cfg.index_path).count() == 1

    import os

    st = (content / "a.md").stat()
    (content / "a.md").write_text("tok " * 200)  # grows past max_tokens
    os.utime(content / "a.md", (st.st_atime, st.st_mtime + 2))
    r = run_pipeline(spark, cfg)
    assert r["quarantined"] == 1
    # the old whole-doc row must be gone, not stale; a fully-emptied index
    # has no data files left, which parquet cannot schema-infer → also OK
    from pyspark.errors import AnalysisException

    try:
        assert spark.read.parquet(cfg.index_path).count() == 0
    except AnalysisException as e:
        assert "UNABLE_TO_INFER_SCHEMA" in str(e)


def test_winnowing_tiny_docs_match_oracle(spark, tmp_path):
    from vectrekker_spark.queries import all_specs

    # 5-7-char docs: fewer k-gram hashes than the window — the truncated
    # window must behave identically in the Spark kernel and the SQL oracle
    texts = ["abcdef", "abcdefg", "abcde", "abcd", "a much longer document here"]
    tbl = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "sfX"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    spec = all_specs()["d13_winnowing"]
    srows = sorted(tuple(r) for r in spec.spark(spark, str(d)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    orows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert srows == orows

    # the full-set LIBRARY form must also hold oracle parity on tiny docs
    from vectrekker_spark.queries.text import D13_FULL_SQL, winnow_fingerprints

    frows = sorted(tuple(r) for r in winnow_fingerprints(spark, str(d)).collect())
    forows = sorted(tuple(r) for r in con.execute(D13_FULL_SQL).fetchall())
    assert frows == forows and len(frows) >= len(srows)
