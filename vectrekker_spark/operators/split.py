"""Deterministic train/val/test splitting for training-data pipelines.

A split must be (a) reproducible run-over-run and machine-over-machine,
(b) stable under repartitioning/insertion order, and (c) assignable without
any global coordination — at 100 TB you cannot shuffle to sample. The classic
answer is a salted content hash of the example id: every executor computes
`bucket = H(salt || id) % n` locally (pure map, no shuffle, no state), and the
split is a range over buckets. Adding data later never moves existing rows
between splits, and changing the salt yields an independent resample.

The hash is the engine-wide md5-prefix-32bit (functions/text.py
`token_hash32`), so the assignment is oracle-expressible in DuckDB —
`('0x' || substr(md5(s), 1, 8))::BIGINT % n` — and bit-identical across
engines. Spark's `hash()` (Murmur3) would be faster but has no DuckDB twin.

Reference scope note: the reference (vectrekker/main.py) has no notion of
splits; this is a north-star training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WEIGHTS: dict[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1}
N_BUCKETS = 10_000  # split-fraction resolution: 0.01%


def split_bucket(id_col: Column | str, salt: str = "v1", n: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n) from a salted md5 of the id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 8), 16, 10
    ).cast("bigint")
    return h % n


def split_bucket_sql(id_expr: str, salt: str = "v1", n: int = N_BUCKETS) -> str:
    """DuckDB fragment computing the identical bucket. The salt is a
    VALUE, not SQL — escape quotes so e.g. "q3'24" renders a valid (and
    identical) literal (r12 kernel-fuzz finding)."""
    s = salt.replace("'", "''")
    return f"((('0x' || substr(md5('{s}:' || {id_expr}), 1, 8))::BIGINT) % {n})"


def _boundaries(weights: dict[str, float], n: int) -> list[tuple[str, int]]:
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    out, acc = [], 0.0
    for name, w in weights.items():  # dict order = precedence order
        acc += w
        out.append((name, int(round(acc * n))))
    out[-1] = (out[-1][0], n)  # guard against float drift at the top end
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by salted id-hash. Pure narrow map:
    no shuffle, no sampling, no driver state — identical assignment at any
    scale and any partitioning."""
    weights = weights or DEFAULT_WEIGHTS
    b = split_bucket(id_col, salt)
    expr: Column | None = None
    for name, hi in _boundaries(weights, N_BUCKETS):
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def split_case_sql(id_expr: str, weights: dict[str, float] | None = None,
                   salt: str = "v1") -> str:
    """DuckDB CASE expression mirroring hash_split's assignment."""
    weights = weights or DEFAULT_WEIGHTS
    b = split_bucket_sql(id_expr, salt)
    parts = []
    for name, hi in _boundaries(weights, N_BUCKETS)[:-1]:
        parts.append(f"WHEN {b} < {hi} THEN '{name}'")
    last = list(weights)[-1]
    return "CASE " + " ".join(parts) + f" ELSE '{last}' END"
