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
    compress: bool = True,
) -> DataFrame:
    """Exact linear-interpolated percentiles per group (numpy 'linear' ≡ SQL
    quantile_cont). Output: (group, q, value).

    compress=True (default) pre-aggregates to a (group, value, count)
    histogram before the applyInPandas shuffle: the map-side partial
    aggregation means only DISTINCT values per group cross the wire and the
    Python worker, not every row — the difference between shuffling a 100 TB
    column and shuffling its value histogram. The weighted quantile math on
    the histogram reproduces np.quantile's 'linear' rule exactly (index
    p = q·(n−1), interpolate between the p-floor-th and p-ceil-th order
    statistics located via cumulative counts), so results are bit-identical
    to the uncompressed path on non-NULL data. NULLs: the compressed path
    ignores them (matching SQL quantile_cont); the uncompressed path keeps
    np.quantile's NaN-poisoning. compress=False remains for value domains
    with unbounded cardinality-per-group where the histogram IS the data.
    """

    def calc(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "q": list(quantiles),
                "value": [round(float(np.quantile(vals, q)), 4) for q in quantiles],
            }
        )

    def calc_hist(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(value_col)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        cum = np.cumsum(pdf["__cnt"].to_numpy(dtype=np.int64))
        n = int(cum[-1])
        out = []
        for q in quantiles:
            p = q * (n - 1)
            lo, hi = int(np.floor(p)), int(np.ceil(p))
            # value of the k-th order statistic = first histogram row whose
            # cumulative count exceeds k
            vlo = vals[np.searchsorted(cum, lo + 1)]
            vhi = vals[np.searchsorted(cum, hi + 1)]
            out.append(round(float(vlo + (p - lo) * (vhi - vlo)), 4))
        return pd.DataFrame(
            {group_col: pdf[group_col].iloc[0], "q": list(quantiles), "value": out}
        )

    schema = f"{group_col} string, q double, value double"
    if compress:
        from pyspark.sql import functions as F

        hist = (
            df.select(group_col, value_col)
            .filter(F.col(value_col).isNotNull())
            .groupBy(group_col, value_col)
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        return hist.groupBy(group_col).applyInPandas(calc_hist, schema=schema)
    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        calc, schema=schema
    )
