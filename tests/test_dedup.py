"""Planted-duplicate property tests (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrekker_spark.operators.dedup import (
    exact_dedup_map,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash16,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden under a bright sky"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word change
FAR = (
    "completely different content about query engines shuffles partitions "
    "broadcast joins and adaptive execution on large clusters every day"
)


def _docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, FAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_planted(spark):
    out = exact_dedup_map(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["dup_cnt"] for r in out}
    assert by_keep[0] == 2  # docs 0 and 1 identical
    assert by_keep[2] == 1 and by_keep[3] == 1


def test_minhash_finds_planted_near_dup(spark):
    pairs = minhash_dedup_pairs(_docs(spark), threshold=0.5).collect()
    found = {(r["l_id"], r["r_id"]) for r in pairs}
    assert (0, 1) in found  # exact dup always collides
    assert (0, 2) in found or (1, 2) in found  # near dup recovered
    assert all(3 not in p for p in found)  # unrelated doc never pairs
    jac = {(r["l_id"], r["r_id"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0


def test_minhash_signature_stability(spark):
    a = minhash_signatures(_docs(spark)).collect()
    b = minhash_signatures(_docs(spark)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lsh_bands_collide_for_identical_docs(spark):
    sigs = minhash_signatures(_docs(spark))
    cands = {(r["l_id"], r["r_id"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in cands


def test_null_text_is_not_duplicate_content(spark):
    # real corpora carry nulls: each null-text doc must survive as its own
    # group (md5(NULL) would otherwise merge them all into one "dup" cluster)
    # and the minhash kernel must skip them instead of crashing
    docs = spark.createDataFrame(
        [(0, BASE), (1, None), (2, None), (3, ""), (4, BASE)],
        "doc_id long, text string",
    )
    groups = {r["keep_id"]: r["dup_cnt"] for r in exact_dedup_map(docs).collect()}
    assert groups == {0: 2, 1: 1, 2: 1, 3: 1}
    pairs = {(r["l_id"], r["r_id"]) for r in minhash_dedup_pairs(docs, 0.5).collect()}
    assert pairs == {(0, 4)}  # the real dup found; null docs never pair


def test_minhash_dedup_against_corpus(spark):
    from vectrekker_spark.operators.dedup import band_hashes, minhash_dedup_against

    corpus = spark.createDataFrame([(100, BASE), (101, FAR)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(0, NEAR), (1, "totally novel text with no overlap whatsoever here "
                        "covering entirely new topics and fresh vocabulary")],
        "doc_id long, text string",
    )
    hits = minhash_dedup_against(new, corpus, threshold=0.5).collect()
    found = {(r["new_id"], r["corpus_id"]) for r in hits}
    assert (0, 100) in found  # near-dup of corpus doc detected
    assert all(n != 1 for n, _ in found)  # novel doc untouched

    # precomputed corpus band index gives identical results (the incremental
    # path: history signatured once, reused per batch)
    cb = band_hashes(minhash_signatures(corpus))
    hits2 = minhash_dedup_against(new, corpus, threshold=0.5, corpus_bands=cb).collect()
    assert sorted(map(tuple, hits2)) == sorted(map(tuple, hits))

    # consistency with the self-join variant: pairing new∪corpus finds the
    # same cross pair
    both = new.unionByName(corpus)
    self_pairs = {
        (r["l_id"], r["r_id"]) for r in minhash_dedup_pairs(both, threshold=0.5).collect()
    }
    assert (0, 100) in self_pairs


def test_simhash_near_dup_has_small_hamming_distance(spark):
    sh = {r["doc_id"]: int(r["simhash"]) for r in simhash16(_docs(spark)).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert sh[0] == sh[1]
    assert ham(sh[0], sh[2]) <= 4  # near-dup: few bits differ
    assert ham(sh[0], sh[3]) > ham(sh[0], sh[2])  # unrelated doc further away


def test_shingle_memo_cap_does_not_change_signatures(spark, monkeypatch):
    # high-cardinality corpus (every shingle unique) with the memo capped at
    # 8 entries: values must be identical to the uncapped run — the cap only
    # bounds memory, never results
    import vectrekker_spark.operators.dedup as dedup_mod
    from vectrekker_spark.operators.dedup import minhash_signatures

    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = sorted(map(tuple, minhash_signatures(df).collect()))
    monkeypatch.setattr(dedup_mod, "_SHINGLE_CACHE_MAX", 8)
    capped = sorted(map(tuple, minhash_signatures(df).collect()))
    assert capped == full and len(full) == 40 * 16


def test_ngram_jaccard_guard_rejects_unbounded_max_id(spark):
    # the O(n²) baseline's cap is load-bearing: a caller must not be able
    # to point it at a real corpus (r7 verdict)
    import pytest

    from vectrekker_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(ValueError, match="minhash_dedup_pairs"):
        ngram_jaccard_pairs(_docs(spark), max_id=10**9)


def test_simhash_zero_shuffle_plan(spark):
    # r15: SimHash is per-document state — the kernel form is scan →
    # MapInPandas with NO exchange at all (the exploded twin keeps its
    # single-exchange shape)
    from vectrekker_spark.operators.dedup import simhash16, simhash16_exploded

    plan = simhash16(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert "MapInPandas" in plan, plan
    old = (
        simhash16_exploded(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert old.count("Exchange") == 1, old
    assert "Expand" not in old, old


def test_simhash_kernel_bit_identical_to_exploded(spark):
    # the r15 kernel must reproduce the exploded groupBy form EXACTLY —
    # including boundary '' tokens ('\tfoo' → ['', 'foo'] after the
    # space-only trim), unicode whitespace as token content, single-token
    # docs, and the no-tokens → no-row rule (NULL / '' / whitespace-only)
    from vectrekker_spark.operators.dedup import simhash16, simhash16_exploded

    rows = [
        (0, "alpha beta gamma alpha"),
        (1, "\tfoo"),                      # leading tab → boundary '' token
        (2, "foo bar"),               # NBSP is token content, not a split
        (3, "x"),
        (4, None),                          # NULL text → no row
        (5, ""),                            # empty → no row
        (6, "   "),                         # ws-only → no row
        (7, "a b c d e f g h i j k l m n o p q r s t"),
        (8, "ALPHA Beta alpha beta ALPHA"),  # case-sensitive hashing
        (9, "word line"),              # U+2028 is content too
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = sorted(map(tuple, simhash16(df).collect()))
    old = sorted(map(tuple, simhash16_exploded(df).collect()))
    assert new == old
    assert {r[0] for r in new} == {0, 1, 2, 3, 7, 8, 9}


def test_precomputed_bands_paths_identical_and_python_free(spark):
    from vectrekker_spark.operators.dedup import band_hashes, minhash_dedup_against

    docs = _docs(spark)
    # materialize: the production caller reads band tables from parquet,
    # so the signature kernel must not ride in via lazy lineage
    lazy = band_hashes(minhash_signatures(docs))
    bands = spark.createDataFrame(lazy.collect(), lazy.schema)
    # pairs: caller-supplied band table ≡ the sign-it-yourself path
    base = sorted(map(tuple, minhash_dedup_pairs(docs, 0.5).collect()))
    pre = sorted(
        map(tuple, minhash_dedup_pairs(docs, 0.5, bands_df=bands).collect())
    )
    assert pre == base and base
    # against: new_bands precomputed ≡ default, and with BOTH band tables
    # supplied the whole plan is Python-free (no signature kernel — the
    # streaming ingest signs each micro-batch exactly once relying on this)
    corpus = spark.createDataFrame(
        [(100, BASE), (101, FAR)], "doc_id long, text string"
    )
    cb_lazy = band_hashes(minhash_signatures(corpus))
    cb = spark.createDataFrame(cb_lazy.collect(), cb_lazy.schema)
    nb = bands
    d_default = sorted(
        map(tuple, minhash_dedup_against(docs, corpus, 0.5).collect())
    )
    d_pre = minhash_dedup_against(
        docs, corpus, 0.5, corpus_bands=cb, new_bands=nb
    )
    assert sorted(map(tuple, d_pre.collect())) == d_default and d_default
    plan = d_pre._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan


def test_verification_shingles_compute_above_candidate_join(spark):
    # the exact-Jaccard stage must shingle only candidate rows: the
    # word_shingles projection (arrays_zip/array_distinct chain) sits ABOVE
    # the band-bucket candidate join in the optimized plan, never below it
    # on the corpus-scan side — a zero-candidate batch pays zero shingle
    # work over history
    from vectrekker_spark.operators.dedup import band_hashes, minhash_dedup_against

    corpus = spark.createDataFrame(
        [(100, BASE), (101, FAR)], "doc_id long, text string"
    )
    cb_lazy = band_hashes(minhash_signatures(corpus))
    cb = spark.createDataFrame(cb_lazy.collect(), cb_lazy.schema)
    out = minhash_dedup_against(
        _docs(spark), corpus, 0.5, corpus_bands=cb
    )
    import re

    optimized = str(out._jdf.queryExecution().optimizedPlan())
    lines = optimized.split("\n")

    def depth(line):  # tree-art indent up to the node name
        m = re.search(r"[A-Za-z]", line)
        return m.start() if m else 0

    top_join = next(d for d in (depth(x) for x in lines if "Join" in x))
    shingled = [depth(x) for x in lines if "array_distinct" in x]
    assert shingled  # verification really shingles somewhere
    # ...but only AT or ABOVE the topmost join (Catalyst inlines the
    # jaccard filter into that join's condition): nothing below it — in
    # particular not in the leaf projections over the corpus scan, where
    # the old shape computed shingle arrays for every streamed row
    assert all(d <= top_join for d in shingled), (top_join, shingled)


def test_simhash_kernel_matches_exploded_randomized(spark):
    # seeded randomized corpus over an adversarial alphabet (every Java-\s
    # class member, unicode whitespace as content, multi-byte tokens,
    # repeated zipfian tokens) — the kernel and the exploded groupBy form
    # must agree row-for-row on all of it
    import random

    from vectrekker_spark.operators.dedup import simhash16, simhash16_exploded

    rng = random.Random(1337)
    vocab = ["alpha", "beta", "Beta", "γάμμα", "x", "翻訳", "a-b", "@@",
             "word glued", "#1"]
    ws = [" ", "  ", "\t", "\n", "\x0b", "\f", "\r", " \t "]
    rows = []
    for i in range(120):
        kind = rng.random()
        if kind < 0.08:
            text = None
        elif kind < 0.16:
            text = rng.choice(["", " ", "\t\t", " \n "])
        else:
            n = rng.randint(1, 40)
            toks = [rng.choice(vocab) for _ in range(n)]
            text = rng.choice(["", rng.choice(ws)]) + rng.choice(ws).join(
                toks
            ) + rng.choice(["", rng.choice(ws)])
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = sorted(map(tuple, simhash16(df).collect()))
    old = sorted(map(tuple, simhash16_exploded(df).collect()))
    assert new == old
