"""Mergeable Count-Min sketch — sub-linear heavy-hitter counting over token
streams (the 'custom sketch' operator class: when exact groupBy-count is too
expensive because the key cardinality is huge, a fixed-size sketch per
partition + cell-wise merge gives ε-approximate counts with one tiny
data movement).

Design: each partition builds a (depth × width) int64 matrix in an Arrow
kernel; the matrices merge by elementwise sum (Count-Min is a commutative
monoid, so partial aggregation is safe at any parallelism — the same
property that makes decimal sums shuffle-safe). Queries read
min_d(cells[d][h_d(x)]), an overestimate within ε·N with probability 1-δ
for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉. Hashes are the same md5-prefix family
used across the engine, so sketches are deterministic and reproducible.

Merge strategy: the per-partition partials are ALREADY fully aggregated
(one matrix per partition, regardless of row count), so the merge moves
P·depth rows of width int64 — KB-scale per partition. Those land on the
driver and sum in numpy: exact int64 monoid fold, no interpreted
higher-order-function expressions (the round-1 collect_list +
aggregate/zip_with merge was the 3.3× bench hotspot). At extreme
parallelism (P ≫ 10⁴) switch the fold to posexplode + groupBy(d,pos) sum —
same monoid, shuffle of P·depth·width skinny rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DEPTH = 4
WIDTH = 1024


def _cell(token: str, d: int, width: int = WIDTH) -> int:
    # salt computed inline so any depth works (a fixed salt table capped
    # depth at 4 and raised IndexError inside executors beyond it)
    h = hashlib.md5((f"cms{d}:" + token).encode("utf-8")).hexdigest()
    return int(h[:8], 16) % width


def _accumulate_batch(
    m: np.ndarray, toks: list, cache: dict, depth: int, width: int
):
    """Fold one batch's token list into the local CM matrix — the ONE
    per-batch kernel (build_sketch and top_tokens both call it; two
    copies of the unique/memo/bincount dance would drift). Returns the
    (uniq, counts) pair so callers can extend their own trackers."""
    uniq, ucnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    cells = np.empty((depth, len(uniq)), dtype=np.int64)
    for i, tok in enumerate(uniq):
        cached = cache.get(tok)
        if cached is None:
            cached = np.array(
                [_cell(tok, d, width) for d in range(depth)], dtype=np.int64
            )
            cache[tok] = cached
        cells[:, i] = cached
    for d in range(depth):
        # int-valued float64 bincount is exact below 2^53 — far above any
        # per-partition token count
        m[d] += np.bincount(cells[d], weights=ucnt, minlength=width).astype(np.int64)
    return uniq, ucnt


def build_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = DEPTH,
    width: int = WIDTH,
    merge: str = "driver",
) -> np.ndarray:
    """Sketch the whitespace-token stream of a text column.

    Per-partition Arrow kernels build local (depth×width) matrices —
    vectorized: tokens of a batch are deduped with np.unique, each unique
    token hashed once (memoized across batches), counts accumulated with
    np.bincount. Returns the merged matrix (depth×width int64 — a few KB
    regardless of data size).

    merge="driver" (default): partials land on the driver and sum in numpy —
    exact int64 monoid fold, fine to ~10⁴ partitions (KB each).
    merge="distributed": posexplode + groupBy(d, pos) SUM folds the partials
    executor-side first; the driver collects only the single final
    depth×width sketch. Same commutative monoid → bit-identical result
    (property-tested); use past ~10⁴ partitions where P·width·depth driver
    traffic would bind."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    if merge not in ("driver", "distributed"):
        raise ValueError(f"merge must be 'driver' or 'distributed', got {merge!r}")

    from vectrekker_spark.functions.pytokens import java_words

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.zeros((depth, width), dtype=np.int64)
        cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            toks: list[str] = []
            for text in pdf[text_col]:
                # java_words: ASCII \S+ runs, ≡ the d17 oracle's
                # string_split_regex + t <> '' — NOT str.split()'s Unicode
                # whitespace (functions/pytokens); null → no tokens
                toks.extend(java_words(text or ""))
            if not toks:
                continue
            _accumulate_batch(m, toks, cache, depth, width)
        yield pd.DataFrame(
            {"d": list(range(depth)), "cells": [m[d].tolist() for d in range(depth)]}
        )

    partials = df.select(text_col).mapInPandas(gen, schema="d int, cells array<long>")
    merged = np.zeros((depth, width), dtype=np.int64)
    if merge == "distributed":
        from pyspark.sql import functions as F

        summed = (
            partials.select("d", F.posexplode("cells").alias("pos", "cnt"))
            .groupBy("d", "pos")
            .agg(F.sum("cnt").alias("cnt"))
        )
        for r in summed.collect():  # exactly depth·width rows — the final sketch
            merged[r["d"], r["pos"]] = r["cnt"]
        return merged
    for r in partials.collect():  # P·depth KB-sized rows; monoid fold in numpy
        merged[r["d"]] += np.asarray(r["cells"], dtype=np.int64)
    return merged


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


def top_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    local_candidates: int = 1024,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> list[tuple[str, int]]:
    """Approximate global top-k tokens in ONE pass over the data.

    The missing half of the sketch story: `heavy_hitters` scores a
    caller-supplied candidate list, but at 100 TB nobody HAS that list.
    Here each partition's Arrow kernel emits BOTH its Count-Min partial
    and its local exact top-``local_candidates`` tokens; the driver merges
    the matrices (int64 monoid fold), unions the candidate sets, and
    ranks candidates by their CM estimate.

    Guarantees and their limits: estimates are CM upper bounds over the
    FULL stream (never under the true count, over by ≤ ε·N w.h.p.) — the
    candidate tracker never affects them. Candidate membership: the
    per-partition tracker is pruned back to 128 × local_candidates
    counters whenever it doubles past that (peak residency ≈ 256·C
    counters plus one batch's uniques — size executors to the PEAK), so a
    partition's local vocabulary never OOMs a task; a token can only fall
    out of candidacy if its running count is outside the top ~128·C at a
    prune point, which a global heavy hitter — locally heavy in at least
    one partition — is not. Rank order in the far tail is best-effort.
    Movement: P × (depth·width·8 + local top-C) bytes — KBs per
    partition, no token-stream shuffle at all (an exact groupBy-count's
    shuffle is bounded by vocabulary size, which partial aggregation
    usually tames; this path exists for when even the vocabulary is too
    hot — n-gram streams, adversarial key floods).

    Returns [(token, estimated_count)] sorted by estimate desc, then token.
    """
    if k < 1 or local_candidates < k:
        raise ValueError(
            f"need local_candidates >= k >= 1, got k={k}, "
            f"local_candidates={local_candidates}"
        )
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    from vectrekker_spark.functions.pytokens import java_words

    prune_cap = local_candidates * 128

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.zeros((depth, width), dtype=np.int64)
        counts: dict[str, int] = {}
        cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            toks: list[str] = []
            for text in pdf[text_col]:
                toks.extend(java_words(text or ""))
            if not toks:
                continue
            uniq, ucnt = _accumulate_batch(m, toks, cache, depth, width)
            for i, tok in enumerate(uniq):
                counts[tok] = counts.get(tok, 0) + int(ucnt[i])
            if len(counts) > 2 * prune_cap:
                counts = dict(
                    sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:prune_cap]
                )
                # the hash-cell memo grows with vocabulary too — shed the
                # entries whose tokens just fell out of candidacy
                cache = {t: v for t, v in cache.items() if t in counts}
        top = sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:local_candidates]
        yield pd.DataFrame(
            {
                "d": list(range(depth)) + [None] * len(top),
                "cells": [m[d].tolist() for d in range(depth)] + [None] * len(top),
                "token": [None] * depth + [t for t, _ in top],
            }
        )

    rows = df.select(text_col).mapInPandas(
        gen, schema="d int, cells array<long>, token string"
    ).collect()
    merged = np.zeros((depth, width), dtype=np.int64)
    candidates: set[str] = set()
    for r in rows:
        if r["d"] is not None:
            merged[r["d"]] += np.asarray(r["cells"], dtype=np.int64)
        elif r["token"] is not None:
            candidates.add(r["token"])
    est = [(t, estimate(merged, t)) for t in candidates]
    return sorted(est, key=lambda x: (-x[1], x[0]))[:k]
