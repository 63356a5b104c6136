"""Bloom-filter membership: no false negatives, bounded false positives,
kernel equivalence (literal JVM vs pandas broadcast), DuckDB bit-for-bit
build parity, merge/save/load lifecycle, and the zero-shuffle plan shape
the operator exists for."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectrekker_spark.operators.bloom import (
    BloomFilter,
    array_hit_counts,
    bloom_build,
    bloom_load,
    bloom_merge,
    bloom_params,
    bloom_save,
    might_contain,
)
from vectrekker_spark.operators.decontaminate import (
    benchmark_bloom,
    decontaminate,
    decontaminate_bloom,
)
from vectrekker_spark.plans import formatted_plan, shuffle_count

PRESENT = [f"item-{i}" for i in range(300)]
ABSENT = [f"absent-{i}" for i in range(2000)]


@pytest.fixture(scope="module")
def bloom(spark):
    df = spark.createDataFrame([(s,) for s in PRESENT], "key string")
    return bloom_build(df, "key", fpp=0.01)


def _probe(spark, bloom, keys, strategy):
    df = spark.createDataFrame([(s,) for s in keys], "key string")
    rows = might_contain(df, "key", bloom, strategy=strategy).collect()
    return {r["key"]: r["might_contain"] for r in rows}


def test_params_sizing():
    m1, k1 = bloom_params(1000, 0.01)
    m2, k2 = bloom_params(10000, 0.01)
    assert m2 > m1 and m1 % 64 == 0
    assert 1 <= k1 <= 30
    # tighter fpp → bigger bitmap
    assert bloom_params(1000, 0.0001)[0] > m1
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)


@pytest.mark.parametrize("strategy", ["literal", "pandas"])
def test_no_false_negatives(spark, bloom, strategy):
    got = _probe(spark, bloom, PRESENT, strategy)
    assert all(got.values()), "bloom false negative — must never happen"


@pytest.mark.parametrize("strategy", ["literal", "pandas"])
def test_false_positive_rate_bounded(spark, bloom, strategy):
    got = _probe(spark, bloom, ABSENT, strategy)
    fp = sum(got.values())
    # fpp=0.01 over 2000 probes ⇒ E[fp]=20, σ≈4.4; 50 is > 6σ
    assert fp < 50, f"false-positive rate blown: {fp}/2000"


def test_kernels_agree_bitwise(spark, bloom):
    keys = PRESENT[:50] + ABSENT[:200]
    assert _probe(spark, bloom, keys, "literal") == _probe(spark, bloom, keys, "pandas")


@pytest.mark.parametrize("strategy", ["literal", "pandas"])
def test_null_key_is_false(spark, bloom, strategy):
    df = spark.createDataFrame([(None,), ("item-1",)], "key string")
    rows = {
        r["key"]: r["might_contain"]
        for r in might_contain(df, "key", bloom, strategy=strategy).collect()
    }
    assert rows[None] is False and rows["item-1"] is True


def test_empty_build_side(spark):
    empty = spark.createDataFrame([], "key string")
    b = bloom_build(empty, "key", fpp=0.01)
    assert b.bits_set() == 0 and b.n_items == 0
    got = _probe(spark, b, ABSENT[:20], "literal")
    assert not any(got.values())


def test_max_bits_guard(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="max_bits"):
        bloom_build(df, "key", m_bits=1 << 30, k=3, max_bits=1 << 27)


def test_duckdb_build_and_probe_parity(spark, duck, bloom):
    """The bitmap is reproducible bit-for-bit in ANSI SQL (same md5-prefix
    double-hash family), and DuckDB's arithmetic-shift probe agrees with
    both Spark kernels — the operator's hash math is engine-neutral."""
    m, k = bloom.m_bits, bloom.k
    duck.execute("CREATE OR REPLACE TABLE bf_items(t VARCHAR)")
    duck.executemany("INSERT INTO bf_items VALUES (?)", [(s,) for s in PRESENT])
    words_sql = f"""
        WITH h AS (
          SELECT ('0x'||substr(md5(t),1,8))::BIGINT AS h1,
                 ('0x'||substr(md5(t),9,8))::BIGINT | 1 AS h2
          FROM bf_items
        ), probes AS (
          SELECT (h1 + r.i * h2) % {m} AS pos FROM h CROSS JOIN range({k}) r(i)
        )
        SELECT pos // 64 AS word_idx,
               bit_or(CASE WHEN pos % 64 = 63 THEN (-9223372036854775807 - 1)
                      ELSE 1::BIGINT << (pos % 64)::INT END) AS bits
        FROM probes GROUP BY 1 ORDER BY 1
    """
    duck_words = np.zeros(m // 64, dtype=np.int64)
    for idx, bits in duck.execute(words_sql).fetchall():
        duck_words[idx] = bits
    assert np.array_equal(duck_words, bloom.words)

    probe_keys = PRESENT[:30] + ABSENT[:100]
    duck.execute("CREATE OR REPLACE TABLE bf_words(word_idx BIGINT, bits BIGINT)")
    nz = np.nonzero(bloom.words)[0]
    duck.executemany(
        "INSERT INTO bf_words VALUES (?, ?)",
        [(int(i), int(bloom.words[i])) for i in nz],
    )
    duck.execute("CREATE OR REPLACE TABLE bf_probe(t VARCHAR)")
    duck.executemany("INSERT INTO bf_probe VALUES (?)", [(s,) for s in probe_keys])
    member_sql = f"""
        WITH h AS (
          SELECT t, ('0x'||substr(md5(t),1,8))::BIGINT AS h1,
                 ('0x'||substr(md5(t),9,8))::BIGINT | 1 AS h2
          FROM bf_probe
        ), probes AS (
          SELECT t, (h1 + r.i * h2) % {m} AS pos FROM h CROSS JOIN range({k}) r(i)
        ), checked AS (
          SELECT p.t,
                 coalesce((SELECT (w.bits >> (p.pos % 64)::INT) & 1
                           FROM bf_words w WHERE w.word_idx = p.pos // 64), 0) AS bit
          FROM probes p
        )
        SELECT t, min(bit) = 1 AS member FROM checked GROUP BY t
    """
    duck_member = dict(duck.execute(member_sql).fetchall())
    spark_member = _probe(spark, bloom, probe_keys, "literal")
    assert duck_member == spark_member


def test_merge_is_union(spark):
    a_keys = [f"a-{i}" for i in range(100)]
    b_keys = [f"b-{i}" for i in range(100)]
    m, k = bloom_params(200, 0.01)
    a = bloom_build(
        spark.createDataFrame([(s,) for s in a_keys], "key string"), "key", m_bits=m, k=k
    )
    b = bloom_build(
        spark.createDataFrame([(s,) for s in b_keys], "key string"), "key", m_bits=m, k=k
    )
    merged = bloom_merge(a, b)
    got = _probe(spark, merged, a_keys + b_keys, "pandas")
    assert all(got.values())
    # union bit-for-bit: exactly the OR of the parts
    assert np.array_equal(merged.words, a.words | b.words)
    with pytest.raises(ValueError, match="different params"):
        bloom_merge(a, BloomFilter(np.zeros(m // 64, np.int64), m, k + 1))


def test_save_load_roundtrip(spark, bloom, tmp_path):
    p = str(tmp_path / "bf")
    bloom_save(bloom, p)
    loaded = bloom_load(p)
    assert np.array_equal(loaded.words, bloom.words)
    assert (loaded.m_bits, loaded.k, loaded.n_items) == (
        bloom.m_bits,
        bloom.k,
        bloom.n_items,
    )
    with pytest.raises(ValueError, match="no bloom meta"):
        bloom_load(str(tmp_path / "nope"))
    # corrupt format version fails loudly
    import json, os

    meta = json.load(open(os.path.join(p, "meta.json")))
    meta["format"] = 99
    json.dump(meta, open(os.path.join(p, "meta.json"), "w"))
    with pytest.raises(ValueError, match="unsupported bloom format"):
        bloom_load(p)


def test_estimated_fpp_monotone(spark):
    df1 = spark.createDataFrame([(f"x{i}",) for i in range(50)], "key string")
    df2 = spark.createDataFrame([(f"y{i}",) for i in range(500)], "key string")
    m, k = bloom_params(200, 0.01)
    light = bloom_build(df1, "key", m_bits=m, k=k)
    heavy = bloom_build(df2, "key", m_bits=m, k=k)
    assert 0.0 < light.estimated_fpp() < heavy.estimated_fpp() <= 1.0


@pytest.mark.parametrize("strategy", ["literal", "pandas"])
def test_array_hit_counts(spark, bloom, strategy):
    data = [
        (1, ["item-1", "item-2", "nope-a"]),
        (2, ["nope-b", "nope-c"]),
        (3, []),
        (4, None),
        (5, ["item-7"]),
    ]
    df = spark.createDataFrame(data, "id int, arr array<string>")
    got = {
        r["id"]: r["n_hits"]
        for r in array_hit_counts(df, "arr", bloom, strategy=strategy).collect()
    }
    # FPs can only push counts UP; with this bloom's fpp the planted counts
    # are the overwhelmingly likely exact values, and the floor is hard
    assert got[1] >= 2 and got[5] >= 1
    assert got[3] == 0 and got[4] == 0
    assert got[2] <= 2  # can never exceed the array length


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown fox went home to sleep early"),  # shares a shingle w/ 1
        (4, "completely unrelated text about spark bloom filters"),
        (5, None),
        (6, ""),
        (7, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.mark.parametrize("strategy", ["literal", "pandas"])
def test_decontaminate_bloom_matches_exact(spark, strategy):
    """No false negatives vs the exact join by construction; at fpp=1e-6 on
    this fixture the results are identical (seeded data → deterministic)."""
    train = _docs(spark)
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high"), (101, "")],
        "doc_id int, text string",
    )
    exact_kept = {
        r["doc_id"] for r in decontaminate(train, bench, k=3).select("doc_id").collect()
    }
    bf = benchmark_bloom(bench, k=3, fpp=1e-6)
    bloom_kept = {
        r["doc_id"]
        for r in decontaminate_bloom(train, bf, k=3, strategy=strategy)
        .select("doc_id")
        .collect()
    }
    # guaranteed direction: bloom never keeps a doc the exact path drops
    assert bloom_kept <= exact_kept
    # and at this fpp they coincide
    assert bloom_kept == exact_kept
    # sanity on the fixture itself: the contaminated docs really dropped
    # (docs 1/3 share "the quick brown" with bench 100; docs 5/6 shingle to
    # [''] — null and empty text alike — colliding with bench 101's [''])
    assert {1, 3, 5, 6} & exact_kept == set()


def test_probe_plans_are_narrow(spark, bloom):
    """The whole point: probing is a zero-shuffle narrow map in BOTH
    kernels, and the literal kernel has no Python stage at all."""
    df = spark.createDataFrame([(s,) for s in PRESENT[:20]], "key string")
    lit_df = might_contain(df, "key", bloom, strategy="literal")
    pd_df = might_contain(df, "key", bloom, strategy="pandas")
    assert shuffle_count(lit_df) == 0 and shuffle_count(pd_df) == 0
    lit_plan = formatted_plan(lit_df)
    assert "EvalPython" not in lit_plan  # Batch/ArrowEvalPython both

    deco = decontaminate_bloom(
        _docs(spark), benchmark_bloom(_docs(spark), k=3), strategy="pandas"
    )
    deco_plan = formatted_plan(deco)
    assert shuffle_count(deco) == 0
    assert "Join" not in deco_plan and "Generate" not in deco_plan  # no join/explode

# --- review-pass regressions -----------------------------------------------


def test_save_overwrite_is_crash_safe(spark, bloom, tmp_path):
    """Overwriting a saved filter must never leave old meta paired with new
    words (old-m positions vs new-m bits = false NEGATIVES). The writer
    un-commits (removes meta) first, so every mid-rewrite crash point
    leaves a directory load rejects loudly; a completed overwrite loads
    the NEW filter."""
    p = str(tmp_path / "bf")
    bloom_save(bloom, p)
    small = bloom_build(
        spark.createDataFrame([("x",)], "key string"), "key", m_bits=64, k=2
    )
    bloom_save(small, p)  # full overwrite with different params
    loaded = bloom_load(p)
    assert (loaded.m_bits, loaded.k) == (64, 2)
    assert np.array_equal(loaded.words, small.words)
    # simulated crash window: meta removed, words half-written → loud error
    import os

    os.remove(os.path.join(p, "meta.json"))
    with pytest.raises(ValueError, match="no bloom meta"):
        bloom_load(p)


@pytest.mark.parametrize("strategy", ["literal", "pandas"])
def test_array_null_elements_are_non_hits(spark, bloom, strategy):
    """NULL array elements must count as non-hits in BOTH kernels (the
    literal kernel's aggregate would otherwise null-poison the whole row's
    count; the pandas kernel would probe a garbage NaN-cast position)."""
    df = spark.createDataFrame(
        [(1, ["item-1", None, "item-2"]), (2, [None]), (3, [None, "absent-zz"])],
        "id int, arr array<string>",
    )
    got = {
        r["id"]: r["n_hits"]
        for r in array_hit_counts(df, "arr", bloom, strategy=strategy).collect()
    }
    assert got[1] >= 2  # the null didn't zero the row
    assert got[2] == 0
    assert got[3] <= 1


def test_decontaminate_bloom_validation(spark, bloom):
    docs = _docs(spark)
    # a provenanced shingle bloom for the non-provenance checks (attrs-less
    # blooms are now rejected outright — the r14s3 guard)
    shingle_bloom = benchmark_bloom(docs, k=3)
    with pytest.raises(ValueError, match="max_shared"):
        decontaminate_bloom(docs, shingle_bloom, max_shared=-1)
    with pytest.raises(ValueError, match="reserved"):
        decontaminate_bloom(docs.withColumn("__n_hits", F.lit(1)), shingle_bloom)
    with pytest.raises(ValueError, match="reserved as bloom temp"):
        might_contain(docs.withColumn("__bf_h1", F.lit(1)), "text", bloom)
    # attrs-less blooms fail the provenance gate (previously a silent no-op)
    with pytest.raises(ValueError, match="provenance"):
        decontaminate_bloom(docs, bloom)


def test_benchmark_bloom_sizes_on_distinct_shingles(spark):
    """Cross-doc repeated shingles must not inflate the sizing count: two
    identical docs contribute their shingles ONCE."""
    one = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id int, text string"
    )
    two = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps")],
        "doc_id int, text string",
    )
    a, b = benchmark_bloom(one), benchmark_bloom(two)
    assert a.n_items == b.n_items
    assert np.array_equal(a.words, b.words)


def test_shingle_k_provenance_enforced(spark, tmp_path):
    bench = spark.createDataFrame([(1, "a b c d e f")], "doc_id int, text string")
    bf = benchmark_bloom(bench, k=5)
    assert bf.attrs["shingle_k"] == 5
    # attrs survive save/load
    p = str(tmp_path / "bf5")
    bloom_save(bf, p)
    assert bloom_load(p).attrs["shingle_k"] == 5
    train = _docs(spark)
    with pytest.raises(ValueError, match="shingle_k=5"):
        decontaminate_bloom(train, bf, k=3)
    # merge refuses mismatched provenance
    other = benchmark_bloom(bench, k=3)
    with pytest.raises(ValueError):
        bloom_merge(bf, other)


def test_expected_must_be_positive(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="expected must be >= 1"):
        bloom_build(df, "key", expected=0)


# --- incremental exact dedup (bloom-accelerated) ----------------------------


def _ingest_fixture(spark):
    history = spark.createDataFrame(
        [(i, f"history document number {i}") for i in range(200)],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        # 3 verbatim dups of history, 2 genuinely new, 1 null text
        [
            (1000, "history document number 7"),
            (1001, "history document number 42"),
            (1002, "history document number 199"),
            (1003, "a brand new document"),
            (1004, "another brand new document"),
            (1005, None),
        ],
        "doc_id int, text string",
    )
    return history, new


def test_exact_dedup_against_with_and_without_bloom(spark):
    from vectrekker_spark.operators.dedup import content_bloom, exact_dedup_against

    history, new = _ingest_fixture(spark)
    plain = {r["doc_id"] for r in exact_dedup_against(new, history).collect()}
    bf = content_bloom(history, fpp=1e-4)
    accel = {
        r["doc_id"]
        for r in exact_dedup_against(new, history, history_bloom=bf).collect()
    }
    assert plain == accel == {1003, 1004, 1005}  # null-text row survives
    bf.release()


def test_exact_dedup_against_saturated_bloom_stays_exact(spark):
    """A worthless (saturated) bloom must only cost speed, never
    correctness: everything routes through the verification join."""
    from vectrekker_spark.operators.dedup import exact_dedup_against

    history, new = _ingest_fixture(spark)
    saturated = BloomFilter(
        np.full(1, -1, dtype=np.int64), m_bits=64, k=1,
        attrs={"kind": "content", "text_col": "text"},
    )  # every probe hits; provenance attrs satisfy the r14s3 strict gate
    got = {
        r["doc_id"]
        for r in exact_dedup_against(new, history, history_bloom=saturated).collect()
    }
    assert got == {1003, 1004, 1005}


def test_exact_dedup_against_reserved_cols(spark):
    from vectrekker_spark.operators.dedup import exact_dedup_against

    history, new = _ingest_fixture(spark)
    with pytest.raises(ValueError, match="reserved"):
        exact_dedup_against(new.withColumn("__h", F.lit("x")), history)


def test_bloom_add_grows_incrementally(spark):
    from vectrekker_spark.operators.bloom import bloom_add
    from vectrekker_spark.operators.dedup import content_bloom, exact_dedup_against

    history, new = _ingest_fixture(spark)
    bf = content_bloom(history, fpp=1e-4)
    batch1 = new.where("text IS NOT NULL")
    grown = bloom_add(bf, batch1, "text")
    # the original filter is untouched; the grown one flags the new batch
    assert grown.bits_set() > bf.bits_set()
    flagged = {
        r["doc_id"]
        for r in exact_dedup_against(
            batch1, history.unionByName(batch1), history_bloom=grown
        ).collect()
    }
    assert flagged == set()  # every batch1 doc is now "seen"
    bf.release(); grown.release()


def test_exact_dedup_against_bloom_plan_shape(spark):
    """The accelerator's point: history is scanned but never shuffled —
    the only exchanges key on the (tiny) maybe-set digests, and the
    maybe-keys semi-filter broadcasts."""
    from vectrekker_spark.operators.dedup import content_bloom, exact_dedup_against
    from vectrekker_spark.plans import formatted_plan, uses_broadcast_join

    history, new = _ingest_fixture(spark)
    bf = content_bloom(history, fpp=1e-4)
    out = exact_dedup_against(new, history, history_bloom=bf)
    plan = formatted_plan(out)
    assert uses_broadcast_join(out)
    # no sort-merge join anywhere: history never becomes a shuffled join side
    assert "SortMergeJoin" not in plan
    bf.release()


def test_bloom_add_respects_custom_max_bits(spark):
    """A filter legitimately built past DEFAULT_MAX_BITS must stay
    growable: bloom_add forwards the filter's own size as the cap."""
    from vectrekker_spark.operators.bloom import DEFAULT_MAX_BITS, bloom_add

    big_m = DEFAULT_MAX_BITS * 2
    bf = BloomFilter(np.zeros(big_m // 64, np.int64), m_bits=big_m, k=3)
    grown = bloom_add(bf, spark.createDataFrame([("x",)], "key string"), "key")
    assert grown.m_bits == big_m and grown.bits_set() == 3


def test_exact_dedup_against_rejects_mismatched_bloom(spark):
    from vectrekker_spark.operators.dedup import content_bloom, exact_dedup_against

    history, new = _ingest_fixture(spark)
    wrong_col = content_bloom(history.withColumnRenamed("text", "title"),
                              text_col="title", fpp=1e-3)
    with pytest.raises(ValueError, match="provenance"):
        exact_dedup_against(new, history, history_bloom=wrong_col)
    shingle_bf = benchmark_bloom(history)
    with pytest.raises(ValueError, match="provenance"):
        exact_dedup_against(new, history, history_bloom=shingle_bf)


def test_exact_dedup_against_probe_cache_released(spark):
    from vectrekker_spark.operators.dedup import content_bloom, exact_dedup_against

    history, new = _ingest_fixture(spark)
    bf = content_bloom(history, fpp=1e-3)
    out = exact_dedup_against(new, history, history_bloom=bf)
    out.count()
    assert out._cached_probe is not None
    assert out._cached_probe.storageLevel.useMemory  # actually persisted
    out._cached_probe.unpersist()
    plain = exact_dedup_against(new, history)
    assert plain._cached_probe is None
    bf.release()


def test_shingle_hit_counts_matches_staged_path(spark):
    """The fused text→shingle→probe kernel (r14 optimization) must be
    bit-identical to array_hit_counts over word_shingles — including the
    NULL-text, empty-text, whitespace-only, and <k-token single-shingle
    rules and every false positive of the hash family."""
    from vectrekker_spark.functions.text import word_shingles
    from vectrekker_spark.operators.bloom import (
        array_hit_counts,
        bloom_build,
        shingle_hit_counts,
    )

    rows = [
        (0, "alpha beta gamma delta alpha beta gamma"),
        (1, None),
        (2, ""),
        (3, "   \t  "),
        (4, "two words"),
        (5, "alpha beta gamma"),
        (6, "totally different shingles every time here"),
        (7, "Alpha BETA gamma DELTA alpha beta gamma"),  # case folding
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    sh = ref.select(F.explode(word_shingles("text")).alias("__sh"))
    bf = bloom_build(sh, "__sh", m_bits=1 << 12, k=4)

    staged = array_hit_counts(
        docs.select("doc_id", word_shingles("text").alias("__sh")),
        "__sh",
        bf,
        out_col="n_hits",
    ).select("doc_id", "n_hits")
    fused = shingle_hit_counts(docs, "text", bf, id_cols=["doc_id"])
    a = {r["doc_id"]: r["n_hits"] for r in staged.collect()}
    b = {r["doc_id"]: r["n_hits"] for r in fused.collect()}
    assert a == b
    # the planted duplicates really hit (sanity: counts are non-trivial)
    assert b[0] > 0 and b[7] == b[0]


def test_shingle_hit_counts_is_narrow(spark):
    """The fused kernel must stay a zero-shuffle narrow map over (id, text)."""
    from vectrekker_spark.operators.bloom import bloom_build, shingle_hit_counts

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(20)],
        "doc_id long, text string",
    )
    bf = bloom_build(
        docs.select(F.col("text").alias("__key")), "__key", m_bits=1 << 10, k=2
    )
    out = shingle_hit_counts(docs, "text", bf)
    assert shuffle_count(out) == 0
    plan = formatted_plan(out)
    assert "MapInPandas" in plan
