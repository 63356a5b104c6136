"""As-of join: for each left row (key, ts), attach the most recent right row
of the same key with right.ts <= left.ts — the canonical time-series join
(trade↔quote, event↔last-state) that Spark has no native operator for.

Spark-first formulation (single shuffle, no range blow-up): union both sides
with a side tag, ONE hash shuffle on the key, sort within (key) by
(ts, side), then `last(value, ignorenulls=True)` over an unbounded-preceding
window forwards each right value to every later left row. Compare the
alternatives at 100 TB:
- range join (l.ts BETWEEN r.ts AND r.ts+Δ) explodes candidates per row and
  needs a bound Δ; unbounded as-of can't even be expressed that way.
- per-key applyInPandas merge needs the same shuffle but adds the Python
  boundary and materializes each key group in memory.
The union+window plan keeps everything JVM-side and spills via the sort,
so a hot key degrades to disk sort instead of OOM. (Window partitions can't
be salted — a single pathological key is bounded by its sort spill, not
memory.)

Tie semantics: right rows sort BEFORE left rows at equal ts, so an exact-ts
match is visible (asof ≤, matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`,
which is the oracle for d22). If several right rows share (key, ts) the last
one in sort order wins — pre-aggregate the right side per (key, ts) for
full determinism (d22 does).

Caveat: `ignorenulls` means a right row whose carried value IS null is
transparent (the previous non-null value shows through). Carry a sentinel
or a struct if null payloads must be distinguished.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    matched_ts_col: str = "asof_ts",
    right_order_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. Returns every left row plus, for each of
    ``value_cols`` (default: all right columns except key/ts), the value from
    the latest right row with ``right_ts <= left_ts`` for the same ``key``
    (NULL when no such row), and that row's timestamp as ``matched_ts_col``.

    ``right_order_cols``: extra sort columns (right-side names) appended to
    the window ordering, so among right rows sharing (key, ts) the LAST by
    these columns wins — e.g. ``["value"]`` makes the max value win. This
    resolves equal-ts ties deterministically WITHOUT pre-aggregating the
    right side (one fewer shuffle than the groupBy-first form); left rows
    carry NULLs in these columns pre-window, so their relative order is
    unaffected. Without it, equal-ts duplicate right rows leave the winner
    engine/partitioning-dependent — pre-aggregate or pass this.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.col(right_ts).alias(matched_ts_col),
            *value_cols,
        )
        .withColumn("__side", F.lit(0))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", *(right_order_cols or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE select evaluates every forward-fill against the ORIGINAL columns.
    # Sequential withColumn would re-resolve the window after each
    # replacement: with right_order_cols naming a value column, the second
    # fill would sort by the already-replaced first column and could tear
    # values from different right rows into one output row.
    filled = list(dict.fromkeys([*value_cols, matched_ts_col]))
    u = u.select(
        *[c for c in u.columns if c not in filled],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in filled],
    )
    return u.filter(F.col("__side") == 1).drop("__ts", "__side")
