"""Skew-evidence A/B at sf3 scale (VERDICT r10 #4): stop SAYING "AQE
skew-split handles the hot key" and measure it once, on the operators.

Generates a Zipf-skewed corpus (~150k docs, the sf3 row count) with the
three skew shapes the dedup/quota claims cover:

- one CONTENT HASH at 30% mass (45k exact copies) — the q25 exact-dedup
  shape. Expectation: NO skew-join involvement at all; hash aggregation
  pre-collapses duplicates map-side (partial_first/min before the
  exchange), so the hot group ships once per mapper. The A/B should show
  ~no delta; that's the evidence that groupBy dedup is skew-immune by
  construction, not by AQE.
- one NEAR-DUP CLUSTER whose members share every band bucket — the
  d01/L2 band-join shape, where skew is REAL: the hot (band, hash)
  bucket makes one shuffle partition quadratic. This is where AQE
  skew-split must fire (thresholds scaled to local data volume — the
  defaults are sized for 100 TB clusters; the TEST pin for the same plan
  is tests/test_skew.py::test_aqe_skew_split_fires_on_minhash_band_join).
- one DOMAIN at 30% mass — the C18 quota shape. Expectation: the
  WindowGroupLimit(Partial) pre-prune bounds the hot stratum's shuffle to
  cap x partitions rows regardless of skew; measured wall + plan check.

Usage: PYTHONPATH=/root/repo python scripts/skew_benchmark.py [--docs 150000]
Prints one markdown table (pasted into SCALE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectrekker_spark.session import get_spark  # noqa: E402

HOT_DOMAIN = "hot.example.com"
BOILER = "subscribe to our newsletter for updates and exclusive offers today"
NEARDUP = "the quick brown fox jumps over the lazy dog again and again"


def build_corpus(spark, n_docs: int, n_neardup: int):
    """Deterministic skewed corpus: 30% exact copies of one text, a
    near-dup cluster sharing every band, a Zipf-ish domain column with 30%
    in one domain, unique tail text elsewhere."""
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    text = (
        F.when(F.col("doc_id") % 10 < 3, F.lit(BOILER))  # 30% exact dups
        # EXACTLY n_neardup docs (ids ≡ 3 mod 10 below the bound): a bare
        # doc_id < bound catches every non-boiler doc under it — a 32k hot
        # cluster whose band join is billions of rows (found the hard way)
        .when(
            (F.col("doc_id") % 10 == 3)
            & (F.col("doc_id") < F.lit(10 * n_neardup)),
            F.lit(NEARDUP),
        )
        .otherwise(
            F.concat(
                F.lit("unique document number "),
                F.col("doc_id").cast("string"),
                F.lit(" with words "),
                (F.col("doc_id") * 7 % 99991).cast("string"),
                F.lit(" and "),
                (F.col("doc_id") * 13 % 99991).cast("string"),
                F.lit(" and "),
                (F.col("doc_id") * 29 % 99991).cast("string"),
            )
        )
    )
    # 30% hot domain; tail Zipf-ish over ~200 domains (id^2 mod p biases low)
    source = F.when(F.col("doc_id") % 10 < 3, F.lit(HOT_DOMAIN)).otherwise(
        F.concat(F.lit("site-"), (F.pow(F.col("doc_id") % 199, 2) % 199).cast("int"))
    )
    return base.select(
        "doc_id", text.alias("text"), source.alias("source")
    ).persist()


def timed(label: str, fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"  {label}: {best:.2f}s (min of {runs})", flush=True)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--neardup", type=int, default=4000)
    args = ap.parse_args()

    spark = get_spark(app_name="skew-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = build_corpus(spark, args.docs, args.neardup)
    n = docs.count()
    print(f"corpus: {n} docs, hot-domain share "
          f"{docs.filter(F.col('source') == HOT_DOMAIN).count() / n:.2f}")

    results = {}

    def set_skew(on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    # ---- 1. exact dedup (q25 shape): hot content hash at 30% mass -------
    def exact_dedup():
        (
            docs.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n"))
            .count()
        )

    for on in (True, False):
        set_skew(on)
        results[f"exact_dedup_skew_{'on' if on else 'off'}"] = timed(
            f"exact dedup (groupBy md5), skewJoin={'on' if on else 'off'}",
            exact_dedup,
        )

    # ---- 2. minhash band join: hot bucket (the REAL skew join) ----------
    from vectrekker_spark.operators.dedup import band_hashes, minhash_signatures

    bands = band_hashes(
        minhash_signatures(docs.filter(F.col("text") != BOILER)), id_col="doc_id"
    ).persist()
    bands.count()
    # thresholds scaled to local volume (defaults are cluster-sized),
    # set ONLY for the join A/B — a 12k advisory during the bands build
    # itself degrades unrelated stages; factor/advisory chosen so the hot
    # bucket splits into ~8 tasks
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "24k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "12k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def band_join():
        l = bands.select(F.col("doc_id").alias("l_id"), "band", "band_hash")
        r = bands.select(F.col("doc_id").alias("r_id"), "band", "band_hash")
        joined = (
            l.join(r, ["band", "band_hash"])
            .filter(F.col("l_id") < F.col("r_id"))
            .select("l_id", "r_id")
            .distinct()
        )
        return joined.count()

    # interleaved samples (the bench.py discipline): a sequential A-then-B
    # order hands B the warm JVM/page cache and the first run showed a 2x
    # artifact from exactly that
    samples = {True: [], False: []}
    set_skew(True)
    band_join()  # shared warmup
    for _ in range(3):
        for on in (True, False):
            set_skew(on)
            t0 = time.time()
            band_join()
            samples[on].append(time.time() - t0)
    for on in (True, False):
        best = min(samples[on])
        print(
            f"  minhash band self-join ({args.neardup}-doc hot bucket), "
            f"skewJoin={'on' if on else 'off'}: {best:.2f}s "
            f"(interleaved min of 3: {[round(x, 2) for x in samples[on]]})",
            flush=True,
        )
        results[f"band_join_skew_{'on' if on else 'off'}"] = best

    # ---- 3. quota cap (C18): 30% hot domain -----------------------------
    # restore the join-section's scaled-down sizing before timing anything
    # else: a 12k advisory partition size pollutes every later stage's
    # coalescing (the first run showed quota 3x slower purely from this)
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    set_skew(True)
    from vectrekker_spark.operators.quota import cap_per_stratum_random

    def quota():
        cap_per_stratum_random(
            docs, cap=1000, strata_col="source", id_col="doc_id"
        ).count()

    kept = cap_per_stratum_random(
        docs, cap=1000, strata_col="source", id_col="doc_id"
    )
    plan = kept._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        kept._jdf.queryExecution(), "simple"
    )
    has_wgl = "WindowGroupLimit" in plan
    for on in (True, False):
        set_skew(on)
        results[f"quota_skew_{'on' if on else 'off'}"] = timed(
            f"per-stratum quota cap (30% hot domain), "
            f"skewJoin={'on' if on else 'off'}",
            quota,
        )
    set_skew(True)

    print("\n| experiment | skew on (s) | skew off (s) | note |")
    print("|---|---|---|---|")
    print(
        f"| exact dedup groupBy, 30% hot hash | "
        f"{results['exact_dedup_skew_on']:.2f} | "
        f"{results['exact_dedup_skew_off']:.2f} | partial agg pre-collapses "
        f"(skew-join N/A by design) |"
    )
    print(
        f"| minhash band self-join, {args.neardup}-doc hot bucket | "
        f"{results['band_join_skew_on']:.2f} | "
        f"{results['band_join_skew_off']:.2f} | skew-split plan pinned in "
        f"tests/test_skew.py |"
    )
    print(
        f"| per-stratum quota, 30% hot domain | "
        f"{results['quota_skew_on']:.2f} | {results['quota_skew_off']:.2f} | "
        f"WindowGroupLimit(Partial) present: {has_wgl} |"
    )
    docs.unpersist()
    bands.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
