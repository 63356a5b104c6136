"""Mergeable Count-Min sketch — sub-linear heavy-hitter counting over token
streams (the 'custom sketch' operator class: when exact groupBy-count is too
expensive because the key cardinality is huge, a fixed-size sketch per
partition + cell-wise merge gives ε-approximate counts with one tiny
shuffle).

Design: each partition builds a (depth × width) int64 matrix in an Arrow
kernel; the matrices merge by elementwise sum (Count-Min is a commutative
monoid, so partial aggregation is safe at any parallelism — the same
property that makes decimal sums shuffle-safe). Queries read
min_d(cells[d][h_d(x)]), an overestimate within ε·N with probability 1-δ
for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉. Hashes are the same md5-prefix family
used across the engine, so sketches are deterministic and reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024
_SALTS = [f"cms{d}:" for d in range(DEPTH)]


def _cell(token: str, d: int, width: int = WIDTH) -> int:
    h = hashlib.md5((_SALTS[d] + token).encode("utf-8")).hexdigest()
    return int(h[:8], 16) % width


def build_sketch(
    df: DataFrame, text_col: str = "text", depth: int = DEPTH, width: int = WIDTH
) -> np.ndarray:
    """Sketch the whitespace-token stream of a text column.

    Per-partition kernels emit their local (depth×width) matrices as rows of
    (d, flattened row); one groupBy-sum merges them. Returns the merged
    matrix on the driver (depth×width int64 — a few KB regardless of data
    size)."""
    import re

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.zeros((depth, width), dtype=np.int64)
        cache: dict[str, list[int]] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                for tok in re.split(r"\s+", text.strip()):
                    if not tok:
                        continue
                    cells = cache.get(tok)
                    if cells is None:
                        cells = [_cell(tok, d, width) for d in range(depth)]
                        cache[tok] = cells
                    for d in range(depth):
                        m[d, cells[d]] += 1
        yield pd.DataFrame(
            {"d": list(range(depth)), "cells": [m[d].tolist() for d in range(depth)]}
        )

    partials = df.select(text_col).mapInPandas(gen, schema="d int, cells array<long>")
    merged = partials.groupBy("d").agg(
        F.aggregate(
            F.collect_list("cells"),
            F.array_repeat(F.lit(0).cast("long"), width),
            lambda acc, row: F.zip_with(acc, row, lambda a, b: a + b),
        ).alias("cells")
    )
    rows = {r["d"]: r["cells"] for r in merged.collect()}
    return np.array([rows[d] for d in range(depth)], dtype=np.int64)


def estimate(sketch: np.ndarray, token: str) -> int:
    """Point estimate: min over rows (classic CM upper-bound estimator)."""
    depth, width = sketch.shape
    return int(min(sketch[d, _cell(token, d, width)] for d in range(depth)))


def heavy_hitters(
    sketch: np.ndarray, candidates: list[str], min_count: int
) -> list[tuple[str, int]]:
    """Filter candidate tokens to those whose estimated count ≥ min_count,
    sorted by estimate descending then token."""
    est = [(t, estimate(sketch, t)) for t in candidates]
    return sorted(
        [(t, c) for t, c in est if c >= min_count], key=lambda x: (-x[1], x[0])
    )
