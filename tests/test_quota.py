"""Per-stratum quota capping (operators/quota.py, SURVEY C18).

Verification: brute-force pandas oracle parity on random data, NULL-stratum
grouping, determinism/partition invariance, the WindowGroupLimit(Partial)
pre-prune pinned in the physical plan (the operator's whole scale story),
and the stable-random variant's growth-stability contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.quota import (
    cap_per_stratum,
    cap_per_stratum_random,
)


def _mk(spark, n=200, seed=3, parts=None):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "source": rng.choice(["a.com", "b.org", "c.net", None], size=n,
                                 p=[0.55, 0.25, 0.15, 0.05]),
            "quality": np.round(rng.random(n), 6),
        }
    )
    df = spark.createDataFrame(pdf)
    return (df.repartition(parts) if parts else df), pdf


def _oracle_cap(pdf, cap):
    """Brute-force: per stratum (NULL its own group), top-cap by
    (quality desc, doc_id asc)."""
    out = []
    for _, g in pdf.groupby("source", dropna=False):
        g = g.sort_values(["quality", "doc_id"], ascending=[False, True])
        out.append(g.head(cap))
    return sorted(pd.concat(out)["doc_id"].tolist())


def test_matches_bruteforce_oracle(spark):
    df, pdf = _mk(spark, parts=7)
    got = cap_per_stratum(
        df, 10, strata_col="source",
        order_cols=[F.col("quality").desc(), "doc_id"],
    )
    assert sorted(r["doc_id"] for r in got.collect()) == _oracle_cap(pdf, 10)
    # columns pass through unchanged, no helper leak
    assert got.columns == df.columns


def test_cap_larger_than_group_keeps_all(spark):
    df, pdf = _mk(spark, n=30)
    got = cap_per_stratum(
        df, 1000, order_cols=[F.col("quality").desc(), "doc_id"]
    )
    assert got.count() == len(pdf)


def test_partition_invariance(spark):
    df1, _ = _mk(spark, parts=2)
    df2, _ = _mk(spark, parts=13)
    order = [F.col("quality").desc(), "doc_id"]
    a = sorted(r["doc_id"] for r in cap_per_stratum(df1, 5, order_cols=order).collect())
    b = sorted(r["doc_id"] for r in cap_per_stratum(df2, 5, order_cols=order).collect())
    assert a == b


def test_null_stratum_is_its_own_capped_group(spark):
    df, pdf = _mk(spark, n=300, seed=9)
    got = cap_per_stratum(
        df, 3, order_cols=[F.col("quality").desc(), "doc_id"]
    ).collect()
    null_kept = [r["doc_id"] for r in got if r["source"] is None]
    n_null = int(pdf["source"].isna().sum())
    assert len(null_kept) == min(3, n_null) and n_null > 3  # fixture has >3


def test_guards(spark):
    df, _ = _mk(spark, n=10)
    with pytest.raises(ValueError, match="cap must be >= 1"):
        cap_per_stratum(df, 0, order_cols=["doc_id"])
    with pytest.raises(ValueError, match="order_cols is required"):
        cap_per_stratum(df, 5)
    with pytest.raises(ValueError, match="__rn"):
        cap_per_stratum(df.withColumn("__rn", F.lit(1)), 5, order_cols=["doc_id"])


def test_window_group_limit_partial_below_exchange(spark):
    # THE scale property: every map task pre-prunes to its local top-cap
    # per stratum BEFORE the shuffle (WindowGroupLimit in Partial mode
    # below the Exchange), so a hot stratum ships cap×P rows, not its
    # whole data. If a Spark upgrade drops this optimization the operator
    # silently becomes a full-stratum shuffle — fail here instead.
    df, _ = _mk(spark, parts=8)
    got = cap_per_stratum(
        df, 4, order_cols=[F.col("quality").desc(), "doc_id"]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit" in l and "Partial" in l]
    exchange = [i for i, l in enumerate(lines) if "Exchange" in l]
    assert partial, plan
    assert exchange, plan
    # tree prints root-first: the Partial limit must sit BELOW the
    # exchange (greater line index = deeper in the tree)
    assert max(partial) > min(exchange), plan


def test_random_variant_deterministic_and_growth_stable(spark):
    df, pdf = _mk(spark, n=300, seed=5, parts=6)
    a = sorted(r["doc_id"] for r in
               cap_per_stratum_random(df, 7, seed="s1").collect())
    b = sorted(r["doc_id"] for r in
               cap_per_stratum_random(df.repartition(3), 7, seed="s1").collect())
    assert a == b  # deterministic + partition-invariant
    c = sorted(r["doc_id"] for r in
               cap_per_stratum_random(df, 7, seed="s2").collect())
    assert a != c  # the seed actually matters
    # growth stability: adding rows can only REPLACE hash-order winners —
    # the kept set over a subset is a superset-restricted selection: every
    # doc kept over the FULL frame that belongs to the subset and still
    # has fewer than cap better-hashed peers in-stratum remains kept.
    # Concretely: kept(full) ∩ subset ⊆ kept(subset).
    sub = df.filter(F.col("doc_id") < 150)
    kept_sub = {r["doc_id"] for r in cap_per_stratum_random(sub, 7, seed="s1").collect()}
    kept_full_in_sub = {d for d in a if d < 150}
    assert kept_full_in_sub <= kept_sub


def test_admit_per_stratum_against_ledger(spark):
    from vectrekker_spark.operators.quota import admit_per_stratum, merge_counts

    batch = spark.createDataFrame(
        [(1, "hot"), (2, "hot"), (3, "hot"), (10, "cold"), (20, None)],
        "doc_id long, source string",
    )
    # fresh quotas: cap 2 → 2 hot, 1 cold, 1 null admitted
    a1 = admit_per_stratum(batch, None, 2)
    per = {r["source"]: r["count"] for r in a1.groupBy("source").count().collect()}
    assert per == {"hot": 2, "cold": 1, None: 1}
    counts = merge_counts(None, a1)
    led = {r["stratum"]: r["used"] for r in counts.collect()}
    assert led == {"hot": 2, "cold": 1, None: 1}
    # partially-used ledger: hot is FULL, cold has 1 slot, null has 1
    batch2 = spark.createDataFrame(
        [(4, "hot"), (11, "cold"), (12, "cold"), (21, None)],
        "doc_id long, source string",
    )
    a2 = admit_per_stratum(batch2, counts, 2)
    per2 = {r["source"]: r["count"] for r in a2.groupBy("source").count().collect()}
    assert per2 == {"cold": 1, None: 1}  # hot rejected, cold capped at 1
    led2 = {r["stratum"]: r["used"] for r in merge_counts(counts, a2).collect()}
    assert led2 == {"hot": 2, "cold": 2, None: 2}
    # determinism: same batch, same ledger → same admitted ids
    ids_a = sorted(r["doc_id"] for r in a2.collect())
    ids_b = sorted(
        r["doc_id"]
        for r in admit_per_stratum(batch2.repartition(5), counts, 2).collect()
    )
    assert ids_a == ids_b


def test_admit_guards(spark):
    from vectrekker_spark.operators.quota import admit_per_stratum

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="cap must be >= 1"):
        admit_per_stratum(df, None, 0)
    with pytest.raises(ValueError, match="__rn"):
        admit_per_stratum(df.withColumn("__rn", F.lit(1)), None, 2)


def test_null_ids_dropped_everywhere(spark):
    from vectrekker_spark.operators.quota import admit_per_stratum

    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (2, "a"), (None, "b")],
        "doc_id long, source string",
    )
    # random cap: NULL ids never admitted (no hash order, no redelivery
    # identity), and the result is deterministic across layouts
    got = cap_per_stratum_random(df, 5, id_col="doc_id")
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]
    got2 = admit_per_stratum(df.repartition(3), None, 5)
    assert sorted(r["doc_id"] for r in got2.collect()) == [1, 2]


# ------------------------------------------------------- token-budget cap


def _mk_tok(spark, n=120, seed=5, parts=None):
    rng = np.random.default_rng(seed)
    words = lambda k: " ".join(f"w{j}" for j in range(k))  # noqa: E731
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "source": rng.choice(["a.com", "b.org", None], size=n,
                                 p=[0.5, 0.4, 0.1]),
            "quality": np.round(rng.random(n), 6),
            "text": [words(int(k)) for k in rng.integers(1, 40, size=n)],
        }
    )
    df = spark.createDataFrame(pdf)
    return (df.repartition(parts) if parts else df), pdf


def _oracle_tok_cap(pdf, budget):
    """Greedy prefix per stratum by (quality desc, doc_id asc): keep a row
    iff it FITS the remaining budget (or is the stratum's first doc)."""
    out = []
    for _, g in pdf.groupby("source", dropna=False):
        g = g.sort_values(["quality", "doc_id"], ascending=[False, True])
        acc = 0
        for _, row in g.iterrows():
            tok = len(row["text"].split())
            if acc == 0 or acc + tok <= budget:
                out.append(row["doc_id"])
            acc += tok
    return sorted(out)


def test_token_cap_matches_bruteforce_oracle(spark):
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    df, pdf = _mk_tok(spark)
    for budget in (1, 37, 200, 10_000):
        got = sorted(
            r["doc_id"]
            for r in cap_tokens_per_stratum(
                df, budget, order_cols=["quality", "doc_id"],
                descending=[True, False],
            ).collect()
        )
        assert got == _oracle_tok_cap(pdf, budget), budget


def test_token_cap_partition_invariance_and_oversized_first_doc(spark):
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    df, pdf = _mk_tok(spark)
    a = sorted(r["doc_id"] for r in cap_tokens_per_stratum(
        df, 50, order_cols=["quality", "doc_id"], descending=[True, False],
    ).collect())
    df7, _ = _mk_tok(spark, parts=7)
    b = sorted(r["doc_id"] for r in cap_tokens_per_stratum(
        df7, 50, order_cols=["quality", "doc_id"], descending=[True, False],
    ).collect())
    assert a == b
    # a stratum whose first doc alone blows the budget still keeps it
    one = spark.createDataFrame(
        [(1, "s", " ".join(["w"] * 500)), (2, "s", "tiny doc")],
        "doc_id long, source string, text string",
    )
    kept = sorted(r["doc_id"] for r in cap_tokens_per_stratum(
        one, 100, order_cols=["doc_id"],
    ).collect())
    assert kept == [1]


def test_token_cap_token_col_and_null_rules(spark):
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    rows = [
        (1, "s", None, 30),      # NULL text, precomputed count
        (2, "s", "ignored", 80),
        (3, "s", "ignored", 80),
        (None, "s", "dropped", 1),
        (4, None, "null stratum words here", None),  # NULL count → 0
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_tok long"
    )
    kept = sorted(
        r["doc_id"]
        for r in cap_tokens_per_stratum(
            df, 100, order_cols=["doc_id"], token_col="n_tok"
        ).collect()
    )
    # order by id: 1 fits (0+30<=100); 2 does NOT fit (30+80>100 — the
    # straddler rule skips it); 3 blocked; NULL id dropped; NULL stratum
    # is its own bucket, 0-count row kept
    assert kept == [1, 4]


def test_token_cap_guards(spark):
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    df, _ = _mk_tok(spark, n=10)
    with pytest.raises(ValueError, match="token_budget"):
        cap_tokens_per_stratum(df, 0, order_cols=["doc_id"])
    with pytest.raises(ValueError, match="order_cols is required"):
        cap_tokens_per_stratum(df, 10)
    with pytest.raises(ValueError, match="descending has"):
        cap_tokens_per_stratum(df, 10, order_cols=["doc_id"],
                               descending=[True, False])
    with pytest.raises(ValueError, match="plain expressions"):
        cap_tokens_per_stratum(df, 10, order_cols=[F.col("doc_id").desc()])
    with pytest.raises(ValueError, match="no 'missing' column"):
        cap_tokens_per_stratum(df, 10, order_cols=["doc_id"],
                               token_col="missing")
    with pytest.raises(ValueError, match="reserved"):
        cap_tokens_per_stratum(df.withColumn("__qt_tok", F.lit(1)), 10,
                               order_cols=["doc_id"])


def test_token_cap_text_never_enters_window_sort(spark, tmp_path):
    """The scale claim: the window/sort branch reads only the narrow
    (id, stratum, token, order) projection — the text payload reaches the
    plan solely through the semi-join's probe side."""
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    path = str(tmp_path / "docs.parquet")
    _mk_tok(spark, n=50)[1].to_parquet(path)
    df = spark.read.parquet(path)
    out = cap_tokens_per_stratum(
        df, 50, order_cols=["quality", "doc_id"], descending=[True, False]
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    # the scan must read text (tokens are counted from it map-side), but
    # the shuffle Exchange feeding the window sort carries only the
    # narrow (id, stratum, __qt_tok, __qt_o*) projection — the payload
    # dies at the pre-exchange Project
    lines = plan.splitlines()
    exchange_inputs = [
        lines[i + 1]
        for i, ln in enumerate(lines)
        if ln.strip().startswith("(") and ln.strip().endswith("Exchange")
        and i + 1 < len(lines) and "Input" in lines[i + 1]
    ]
    assert exchange_inputs, plan
    assert all("text" not in inp for inp in exchange_inputs), plan


def test_admit_guards_stratum_reserved(spark):
    """'__stratum' is reserved: drop-by-name after the ledger join would
    silently strip a same-named batch column (r14s3 review finding)."""
    from vectrekker_spark.operators.quota import admit_per_stratum

    batch = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, __stratum string"
    )
    with pytest.raises(ValueError, match="__stratum"):
        admit_per_stratum(batch, None, 5)


def test_token_cap_duplicate_id_across_strata_no_leak(spark):
    """The kept-set join is on (id, stratum): id alone let a kept id in
    one stratum resurrect its over-budget twin in another (r14s3)."""
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    rows = [
        (1, "A", " ".join(["w"] * 10)),
        (0, "B", " ".join(["w"] * 50)),  # fills B exactly
        (1, "B", " ".join(["w"] * 40)),  # over budget in B; id kept in A
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = sorted(
        (r["doc_id"], r["source"])
        for r in cap_tokens_per_stratum(df, 50, order_cols=["doc_id"]).collect()
    )
    assert kept == [(0, "B"), (1, "A")]


def test_token_cap_straddler_skipped_but_first_oversize_kept(spark):
    from vectrekker_spark.operators.quota import cap_tokens_per_stratum

    rows = [
        (1, "s", " ".join(["w"] * 60)),
        (2, "s", " ".join(["w"] * 50)),   # 60+50 > 100: straddler skipped
        (3, "t", " ".join(["w"] * 500)),  # first doc oversized: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = sorted(
        r["doc_id"]
        for r in cap_tokens_per_stratum(df, 100, order_cols=["doc_id"]).collect()
    )
    assert kept == [1, 3]
