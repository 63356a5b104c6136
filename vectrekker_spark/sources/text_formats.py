"""Row-oriented corpus sources: JSONL (one JSON doc per line — the lingua
franca of LLM training corpora), CSV, and plain-text-lines, normalized to the
engine's document schema (doc_id, text, + passthrough metadata).

All three are plain Spark DataFrame sources, so the scale properties come
free: parallel file listing, per-file splits (gzip'd JSONL stays one split
per file — prefer zstd/uncompressed shards at 100 TB), column pruning, and
partition-directory pruning. An explicit schema is REQUIRED for JSONL/CSV at
scale: schema inference reads the data twice and samples non-deterministically
— every reader here takes or builds one up front.

Doc-id policy: corpora often arrive without stable ids. ``id_col=None``
derives one as the 60-bit md5-prefix of the text (deterministic, stable
under re-sharding/re-ordering, collision-safe to ~2³⁰ docs per Birthday
bound — use the full md5 string for bigger corpora). That beats
``monotonically_increasing_id``, which renumbers whenever partitioning
changes.

Reference scope note: the reference ingests only a directory of whole files
(`vectrekker/main.py:138-147`; covered by sources/files.py); these row
formats are north-star pipeline additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_doc_id(df: DataFrame, id_col: str | None, text_col: str) -> DataFrame:
    if id_col is not None:
        return df.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else df
    # 15 hex digits = 60 bits: the full 16 can exceed Long.MAX and a bigint
    # cast of conv()'s unsigned string silently nulls on overflow.
    return df.withColumn(
        "doc_id",
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("bigint"),
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_col: str | None = None,
    meta_fields: dict[str, T.DataType] | None = None,
) -> DataFrame:
    """JSONL corpus → (doc_id, text, *meta). Explicit schema (no inference
    pass); malformed lines go to null-text rows and are dropped, not failed —
    at 100 TB a handful of corrupt lines must not kill the job (Spark's
    PERMISSIVE mode)."""
    fields = [T.StructField(text_field, T.StringType())]
    if id_col:
        fields.insert(0, T.StructField(id_col, T.LongType()))
    for name, dtype in (meta_fields or {}).items():
        fields.append(T.StructField(name, dtype))
    df = spark.read.schema(T.StructType(fields)).json(path)
    df = df.withColumnRenamed(text_field, "text") if text_field != "text" else df
    return _with_doc_id(df, id_col, "text").filter(F.col("text").isNotNull())


def read_csv_docs(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_col: str | None = None,
    meta_fields: dict[str, T.DataType] | None = None,
    **options: str,
) -> DataFrame:
    """CSV corpus → (doc_id, text, *meta). Headers on, explicit schema,
    multiline quoting enabled so embedded newlines in quoted text survive
    (note: multiline CSV files are NOT splittable — shard the files)."""
    fields = [T.StructField(text_field, T.StringType())]
    if id_col:
        fields.insert(0, T.StructField(id_col, T.LongType()))
    for name, dtype in (meta_fields or {}).items():
        fields.append(T.StructField(name, dtype))
    reader = (
        spark.read.schema(T.StructType(fields))
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    df = df.withColumnRenamed(text_field, "text") if text_field != "text" else df
    return _with_doc_id(df, id_col, "text").filter(F.col("text").isNotNull())


def read_text_lines(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """One document per line of plain text → (doc_id, text), blank/short
    lines dropped. doc_id is the content hash (see module docstring)."""
    df = spark.read.text(path).select(F.col("value").alias("text"))
    return _with_doc_id(
        df.filter(F.length(F.trim("text")) >= min_chars), None, "text"
    )
