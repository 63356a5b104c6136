"""Per-stratum quota capping — the RefinedWeb/FineWeb "domain cap" stage.

Web-scale corpora are dominated by a handful of hot domains (or sources,
languages, shards); capping each stratum to at most N documents — the best
N by a quality signal, or a stable random N — is a standard curation stage
between filtering and mixture weighting. (RefinedWeb caps per-domain URL
counts; FineWeb applies per-dump dedup caps; the Pile caps per-source
mixture epochs. Reference scope note: vectrekker/main.py has no curation
surface at all — north-star training-pipeline addition, SURVEY.md §2.2.)

Scale shape — declarative on purpose: the obvious formulation
(row_number over a per-stratum window, filter rn <= cap) is exactly what
Catalyst optimizes best. Spark inserts a WindowGroupLimit(Partial) BELOW
the exchange: every map task pre-prunes to its local top-cap per stratum
before anything shuffles, so the exchange carries at most cap rows per
(stratum, input partition) — a hot domain with 10⁹ rows ships cap×P rows,
not 10⁹. The final per-stratum task then ranks a bounded survivor set.
test_quota pins the Partial push-down in the physical plan; if a Spark
upgrade ever dropped it, the test fails rather than the cluster.

Determinism: ``order_cols`` must be a TOTAL order (pass a unique
tie-break column last — the q12/q22 registry rule); ties at the cap
boundary would otherwise make the kept set partition-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectrekker_spark.operators.sampling import sample_bucket


def cap_per_stratum(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    order_cols: Sequence[Column | str] = (),
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum: the first ``cap`` under
    ``order_cols`` (e.g. ``[F.col("quality").desc(), "doc_id"]`` keeps the
    highest-quality docs, doc_id breaking ties). NULL strata form one
    group of their own (window partitioning semantics — the "unknown
    domain" bucket is capped like any other).

    Columns pass through unchanged; no helper column leaks into the
    result. ``order_cols`` is required and must end in a unique tie-break
    for a deterministic, partition-invariant kept set.
    """
    if cap < 1:
        raise ValueError(f"cap_per_stratum: cap must be >= 1, got {cap}")
    if not order_cols:
        raise ValueError(
            "cap_per_stratum: order_cols is required (end it with a unique "
            "tie-break column, or the kept set at the cap boundary depends "
            "on partition layout); for a stable random cap use "
            "cap_per_stratum_random"
        )
    if "__rn" in df.columns:
        raise ValueError("cap_per_stratum: input already has a __rn column")
    w = Window.partitionBy(strata_col).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def admit_per_stratum(
    batch: DataFrame,
    counts: DataFrame | None,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "quota0",
) -> DataFrame:
    """The INCREMENTAL quota shape: admit ``batch`` rows into per-stratum
    quotas that are already partially used. ``counts`` is the tiny
    (stratum, used) ledger from prior admissions (None/empty → all quotas
    fresh); a stratum with used ≥ cap admits nothing more.

    Within the batch, rows compete in stable hash(seed, id) order (the
    cap_per_stratum_random order), so a REDELIVERED batch admits the same
    rows — the determinism the streaming ingestion's at-least-once
    contract builds on. NULL strata match the ledger's NULL row
    (null-safe join); the ledger side is broadcast (one row per stratum,
    small by construction — it is the QUOTA table, not the data).

    Returns the admitted rows with the batch's original columns.
    """
    if cap < 1:
        raise ValueError(f"admit_per_stratum: cap must be >= 1, got {cap}")
    # '__stratum' is reserved too: Spark's drop-by-name drops EVERY match,
    # so a batch column of that name would be silently stripped by the
    # post-join cleanup (advisor-style finding, r14s3)
    for tmp in ("__rn", "__used", "__stratum"):
        if tmp in batch.columns:
            raise ValueError(f"admit_per_stratum: input already has {tmp}")
    # NULL ids are dropped (the sampling.py rule): they have no hash order
    # (several NULL-id rows would tie and the admitted set would turn
    # partition-dependent) and no identity for the streaming redelivery
    # guard to recognize — admitting them would double-charge quotas on
    # every at-least-once redelivery
    batch = batch.where(F.col(id_col).isNotNull())
    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(id_col, seed), F.col(id_col)
    )
    ranked = batch.withColumn("__rn", F.row_number().over(w))
    if counts is None:
        joined = ranked.withColumn("__used", F.lit(0))
    else:
        used = counts.select(
            F.col("stratum").alias("__stratum"), F.col("used").alias("__used")
        )
        joined = ranked.join(
            F.broadcast(used),
            ranked[strata_col].eqNullSafe(F.col("__stratum")),
            "left",
        ).drop("__stratum")
    return (
        joined.filter(
            F.col("__rn") + F.coalesce(F.col("__used"), F.lit(0)) <= cap
        )
        .drop("__rn", "__used")
    )


def merge_counts(
    counts: DataFrame | None,
    admitted: DataFrame,
    strata_col: str = "source",
) -> DataFrame:
    """New (stratum, used) ledger after an admission: old counts plus the
    admitted batch's per-stratum counts (full outer on the stratum,
    null-safe so the NULL bucket accumulates like any other)."""
    delta = (
        admitted.groupBy(F.col(strata_col).alias("stratum"))
        .count()
        .withColumnRenamed("count", "d")
    )
    if counts is None:
        return delta.select(
            "stratum", F.col("d").cast("long").alias("used")
        )
    return (
        counts.select("stratum", "used")
        .join(delta, counts["stratum"].eqNullSafe(delta["stratum"]), "full_outer")
        .select(
            F.coalesce(counts["stratum"], delta["stratum"]).alias("stratum"),
            (
                F.coalesce(F.col("used"), F.lit(0))
                + F.coalesce(F.col("d"), F.lit(0))
            ).cast("long").alias("used"),
        )
    )


def cap_per_stratum_random(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "quota0",
) -> DataFrame:
    """Stable "random" quota: keep ``cap`` rows per stratum chosen by
    hash(seed, id) order — deterministic, partition-invariant, and stable
    under corpus growth in the hash-sample sense (a kept doc stays kept
    until enough better-hashed newcomers arrive in its stratum). The same
    WindowGroupLimit pre-prune applies: the hash order is just an
    order_cols choice. NULL ids are dropped (the sampling.py rule — they
    have no hash order, and several of them would tie into a
    partition-dependent kept set)."""
    return cap_per_stratum(
        df.where(F.col(id_col).isNotNull()), cap, strata_col=strata_col,
        order_cols=[sample_bucket(id_col, seed), F.col(id_col)],
    )


def cap_tokens_per_stratum(
    df: DataFrame,
    token_budget: int,
    strata_col: str = "source",
    order_cols: Sequence[Column | str] = (),
    descending: bool | Sequence[bool] = False,
    id_col: str = "doc_id",
    token_col: str = "",
    text_col: str = "text",
) -> DataFrame:
    """Keep each stratum's greedy prefix (under ``order_cols``) whose
    cumulative token count stays within ``token_budget`` — the unit real
    mixture budgets bind in (a domain's contribution to a training run is
    its TOKENS, not its document count; mixture_rates_for_token_budget is
    the rate-based sibling, this is the hard per-stratum cap).

    A row is kept iff it FITS the remaining budget (admitted-before +
    its own tokens <= budget); the one exception is a stratum whose
    FIRST document alone exceeds the budget, which keeps that document
    rather than going empty (the packing module's oversized-item rule).
    Later budget-straddling docs are skipped — and, because the order is
    fixed, every doc after the first misfit is skipped too (a contiguous
    prefix, not best-fit packing). Token counts come from ``token_col``
    if given (a precomputed/learned-BPE count) else the engine's
    whitespace ``token_count(text_col)``; NULL counts/text count 0.
    Rows with a NULL id are dropped (no deterministic order — the
    quota/sampling NULL rule). NULL strata form one capped bucket.
    Direction comes from ``descending`` (one bool, or one per order
    column — e.g. ``order_cols=["quality", "doc_id"], descending=[True,
    False]`` admits highest-quality first); ``order_cols`` entries must
    be PLAIN expressions, not ``.desc()``/``.asc()`` sort orders, and as
    everywhere must end in a unique tie-break.

    Scale shape: the running sum needs each stratum's full orderd row
    set, so unlike ``cap_per_stratum`` there is no WindowGroupLimit
    pre-prune — instead the window runs over a NARROW projection
    (id, stratum, tokens ≈ tens of bytes/row) and the kept ids semi-join
    back, so document text never shuffles and the hot-stratum cost is a
    narrow sort, not a payload shuffle."""
    if token_budget < 1:
        raise ValueError(
            f"cap_tokens_per_stratum: token_budget must be >= 1, got "
            f"{token_budget}"
        )
    if not order_cols:
        raise ValueError(
            "cap_tokens_per_stratum: order_cols is required (end it with a "
            "unique tie-break column, or the kept set at the budget "
            "boundary depends on partition layout)"
        )
    for reserved in ("__qt_tok", "__qt_before"):
        if reserved in df.columns:
            raise ValueError(
                f"cap_tokens_per_stratum: input already has a {reserved!r} "
                f"column — reserved; rename it first"
            )
    from vectrekker_spark.functions.text import token_count

    docs = df.where(F.col(id_col).isNotNull())
    if token_col:
        if token_col not in df.columns:
            raise ValueError(
                f"cap_tokens_per_stratum: no {token_col!r} column on the "
                f"input"
            )
        tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    else:
        tok = F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0))
    # narrow projection: id, stratum, tokens, and the order expressions
    # aliased to reserved names — order_cols may reference ANY input
    # column, so they are materialized here and the window orders by the
    # aliases; everything else (the text payload) never enters the sort
    if isinstance(descending, bool):
        desc_flags = [descending] * len(order_cols)
    else:
        desc_flags = list(descending)
        if len(desc_flags) != len(order_cols):
            raise ValueError(
                f"cap_tokens_per_stratum: descending has {len(desc_flags)} "
                f"flags for {len(order_cols)} order_cols"
            )
    order_by = []
    order_exprs = []
    for i, (c, dsc) in enumerate(zip(order_cols, desc_flags)):
        name = f"__qt_o{i}"
        if name in df.columns:
            raise ValueError(
                f"cap_tokens_per_stratum: input already has a {name!r} "
                f"column — reserved; rename it first"
            )
        col = F.col(c) if isinstance(c, str) else c
        # direction comes from `descending`, NOT .desc()/.asc() on the
        # expression: a SortOrder cannot be aliased into the narrow
        # projection (Spark fails at codegen with an INTERNAL_ERROR)
        if " DESC" in str(col) or " ASC" in str(col):
            raise ValueError(
                "cap_tokens_per_stratum: pass plain expressions in "
                "order_cols and set direction via descending=..., not "
                ".desc()/.asc()"
            )
        order_exprs.append(col.alias(name))
        order_by.append(F.col(name).desc() if dsc else F.col(name).asc())
    narrow = docs.select(
        F.col(id_col), F.col(strata_col), tok.alias("__qt_tok"), *order_exprs
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("__qt_tok").over(w), F.lit(0))
    # admit iff the doc FITS the remaining budget — except the stratum's
    # first doc, which is admitted even oversized (the packing rule).
    # The original `before < budget` filter admitted every
    # budget-STRADDLING doc, letting a stratum reach ~2× its budget
    # (r14s3 review). The window column must materialize BEFORE the
    # filter (window functions can't live in WHERE).
    kept_ids = (
        narrow.withColumn("__qt_before", before)
        .where(
            (F.col("__qt_before") + F.col("__qt_tok") <= F.lit(token_budget))
            | (F.col("__qt_before") == F.lit(0))
        )
        .select(F.col(id_col), F.col(strata_col))
    )
    # join back on (id, stratum) — id alone let a kept id in one stratum
    # resurrect its over-budget twin in another (r14s3 review). Ids must
    # be unique WITHIN a stratum (the engine-wide unique-id contract);
    # null-safe on the stratum so the NULL bucket joins like any other.
    return docs.alias("__qt_d").join(
        kept_ids.alias("__qt_k"),
        (F.col(f"__qt_d.{id_col}") == F.col(f"__qt_k.{id_col}"))
        & F.col(f"__qt_d.{strata_col}").eqNullSafe(
            F.col(f"__qt_k.{strata_col}")
        ),
        "left_semi",
    )
