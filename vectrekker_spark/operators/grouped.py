"""Grouped Arrow UDF operators (`applyInPandas`) — the per-group escape hatch
for semantics Spark SQL can't express (exact percentiles per group without
approx, custom per-group models).

Scale note: applyInPandas shuffles on the group key and hands each group to
one python worker as a whole — groups must fit in memory. For our corpus the
groups are languages/sources (bounded); for unbounded groups, pre-aggregate
or salt first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Exact linear-interpolated percentiles per group (numpy 'linear' ≡ SQL
    quantile_cont). Output: (group, q, value)."""

    def calc(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "q": list(quantiles),
                "value": [round(float(np.quantile(vals, q)), 4) for q in quantiles],
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        calc, schema=f"{group_col} string, q double, value double"
    )
