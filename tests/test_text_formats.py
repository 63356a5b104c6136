"""JSONL/CSV/text-lines sources (sources/text_formats.py): schema'd reads,
content-hash doc ids (stable under re-sharding), malformed-line tolerance,
metadata passthrough."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import types as T

from vectrekker_spark.sources.text_formats import (
    read_csv_docs,
    read_jsonl,
    read_text_lines,
)


def test_jsonl_with_ids_and_meta(spark, tmp_path):
    p = os.path.join(tmp_path, "docs.jsonl")
    with open(p, "w") as f:
        for i, (txt, lang) in enumerate(
            [("hello world", "en"), ("bonjour le monde", "fr")]
        ):
            f.write(json.dumps({"doc_id": i, "text": txt, "lang": lang}) + "\n")
    df = read_jsonl(
        spark, p, id_col="doc_id", meta_fields={"lang": T.StringType()}
    )
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
    assert rows == {0: ("hello world", "en"), 1: ("bonjour le monde", "fr")}


def test_jsonl_malformed_lines_dropped_not_fatal(spark, tmp_path):
    p = os.path.join(tmp_path, "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"text": "good doc"}\n')
        f.write("this is not json at all{{{\n")
        f.write('{"other_field": 1}\n')  # missing text → null → dropped
        f.write('{"text": "another good one"}\n')
    got = {r["text"] for r in read_jsonl(spark, p).collect()}
    assert got == {"good doc", "another good one"}


def test_content_hash_ids_stable_under_resharding(spark, tmp_path):
    docs = [{"text": f"document number {i} body"} for i in range(10)]
    one = os.path.join(tmp_path, "one")
    many = os.path.join(tmp_path, "many")
    os.makedirs(one), os.makedirs(many)
    with open(os.path.join(one, "all.jsonl"), "w") as f:
        f.writelines(json.dumps(d) + "\n" for d in docs)
    for i, d in enumerate(docs):  # same corpus, 10 shards, reversed order
        with open(os.path.join(many, f"part-{9 - i}.jsonl"), "w") as f:
            f.write(json.dumps(d) + "\n")
    a = {(r["doc_id"], r["text"]) for r in read_jsonl(spark, one).collect()}
    b = {(r["doc_id"], r["text"]) for r in read_jsonl(spark, many).collect()}
    assert a == b and len({i for i, _ in a}) == 10


def test_csv_multiline_quoted_text(spark, tmp_path):
    p = os.path.join(tmp_path, "docs.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,score\n")
        f.write('1,"first doc",0.5\n')
        f.write('2,"has an\nembedded newline",0.9\n')
    df = read_csv_docs(
        spark, p, id_col="doc_id", meta_fields={"score": T.DoubleType()}
    )
    rows = {r["doc_id"]: (r["text"], r["score"]) for r in df.collect()}
    assert rows[1] == ("first doc", 0.5)
    assert rows[2] == ("has an\nembedded newline", 0.9)


def test_text_lines(spark, tmp_path):
    p = os.path.join(tmp_path, "corpus.txt")
    with open(p, "w") as f:
        f.write("first line doc\n\n   \nsecond line doc\n")
    df = read_text_lines(spark, p)
    assert {r["text"] for r in df.collect()} == {
        "first line doc",
        "second line doc",
    }
    assert df.filter(F.col("doc_id").isNull()).count() == 0
