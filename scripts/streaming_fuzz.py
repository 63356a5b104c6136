"""Streaming differential fuzzer (r12) — the ST7-ST10 counterpart of
scripts/diff_fuzz.py (relational) and scripts/kernel_fuzz.py (text/vector
kernels): seeded RANDOM micro-batch splits, redelivery injections
(at-least-once, mid-stream or end), and torn-state injections (bloom
meta removed mid-stream) over the streaming ingestion jobs, each trial
checked against a clean batch-side oracle that uses the SAME operators
but NONE of the streaming machinery (no checkpoints, no persisted band
index reuse, no blooms, no redelivery). A divergence therefore always
indicts the delivery/state plumbing — checkpoint dedup, persisted-state
reuse, write ordering, heal paths, compacts — not the dedup math (that
is pinned by the driver oracles and the kernel fuzzer).

Families:
- exact (ST8, foreach_batch_exact_dedup): oracle = exact_dedup_map
  keepers over the whole feed (one-shot); torn-bloom heal injectable;
  compact_exact_corpus always run (fuzzes the compact too).
- near (ST7, foreach_batch_near_dedup): oracle = per-batch ACCUMULATION
  with minhash_dedup_pairs (drop every verified pair's larger id) +
  minhash_dedup_against vs the accumulated history — the job's documented
  policy expressed without persisted bands/checkpoints.
- semantic (ST9, foreach_batch_semantic_dedup): quantizer pre-fitted and
  shared (the streaming_funnel idiom), oracle = one-shot semantic_dedup
  with the same centroids (accumulated ≡ one-shot holds for append-only
  ascending ids — the operator-level theorem this fuzzer re-checks under
  random splits and redelivery).
- quota (ST10, foreach_batch_quota): no batch-order-independent kept-set
  oracle exists (admission is per-batch in stable hash order), so the
  checks are the INVARIANTS: per-stratum count == min(cap, supply), ids
  distinct after compact, admitted ⊆ feed, compact reports zero drift.
- image (foreach_batch_image_dedup, the ST7 image twin): oracle =
  per-batch accumulation with dhash_dedup_pairs + dhash_dup_against —
  planted brightness-shift near-dups (identical dHash), exact pixel dups
  across formats, noisy variants, and undecodable blobs.

Corpus generation plants the adversarial content on purpose: exact
duplicate texts, near-duplicate texts (one appended token), NULL texts,
duplicate + near-duplicate embeddings, skewed strata.

Usage: python scripts/streaming_fuzz.py [n_per_family] [seed ...]
Failures write a repro JSON per trial to .fuzz_failures/streaming/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = [f"tok{i}" for i in range(24)]
THRESH_NEAR = 0.5
THRESH_SEM = 0.95
DIM = 16


def _ids(df, col):
    return sorted(r[0] for r in df.select(col).collect())


def _gen_docs(rng, n):
    """(doc_id, source, text) rows with planted exact dups, near dups
    (one appended token), and NULL texts, ids ascending."""
    rows = []
    texts = []
    for i in range(n):
        r = rng.rand()
        if r < 0.05 or not texts and r < 0.10:
            text = None
        elif r < 0.30 and texts:
            text = texts[int(rng.randint(0, len(texts)))]  # exact dup
        elif r < 0.45 and texts:
            base = texts[int(rng.randint(0, len(texts)))]
            text = (base + " " + VOCAB[int(rng.randint(0, len(VOCAB)))]) if base else None
        else:
            k = int(rng.randint(6, 18))
            text = " ".join(VOCAB[int(j)] for j in rng.randint(0, len(VOCAB), k))
        if text is not None:
            texts.append(text)
        source = f"s{int(rng.choice([0, 0, 0, 1, 2]))}"  # skewed strata
        rows.append((i, source, text))
    return rows


def _gen_vectors(rng, n):
    """(vec_id, embedding) with planted exact-dup and near-dup vectors."""
    rows = []
    vecs = []
    for i in range(n):
        r = rng.rand()
        if r < 0.05:
            v = None
        elif r < 0.25 and vecs:
            v = vecs[int(rng.randint(0, len(vecs)))]  # exact dup
        elif r < 0.45 and vecs:
            base = np.array(vecs[int(rng.randint(0, len(vecs)))])
            v = base + rng.randn(DIM) * 0.01  # near dup, cosine ~0.999
            v = (v / np.linalg.norm(v)).tolist()
        else:
            v = rng.randn(DIM)
            v = (v / np.linalg.norm(v)).tolist()
        if v is not None:
            vecs.append(v)
        rows.append((i, [float(x) for x in v] if v is not None else None))
    return rows


def _split(rng, rows, k):
    """k contiguous ascending-id slices with random cut points (ascending
    feed order is the streaming≡batch equivalence precondition)."""
    n = len(rows)
    cuts = sorted(rng.choice(range(1, n), size=k - 1, replace=False).tolist())
    out = []
    lo = 0
    for c in [*cuts, n]:
        out.append(rows[lo:c])
        lo = c
    return out


def _write_batches(spark, batches, schema, feed_src):
    paths = []
    for i, rows in enumerate(batches):
        p = os.path.join(feed_src, f"b{i:02d}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        paths.append(p)
    return paths


class _Driver:
    """Feeds batch dirs into an availableNow stream one at a time with a
    shared checkpoint, injecting redeliveries (fresh checkpoint over one
    batch dir) and torn state at the drawn positions."""

    def __init__(self, spark, work, schema, start_fn, *, torn_paths=()):
        self.spark = spark
        self.work = work
        self.schema = schema
        self.start_fn = start_fn
        self.torn_paths = torn_paths
        self.feed = os.path.join(work, "in")
        os.makedirs(self.feed)
        self.ck = os.path.join(work, "ck")
        self.n_redeliveries = 0

    def _run(self, in_dir, ck):
        s = self.spark.readStream.schema(self.schema).parquet(f"{in_dir}/*")
        self.start_fn(s, ck).awaitTermination()

    def redeliver(self, batch_path):
        rd = os.path.join(self.work, f"re{self.n_redeliveries}")
        os.makedirs(rd)
        shutil.copytree(
            batch_path, os.path.join(rd, os.path.basename(batch_path))
        )
        self._run(rd, os.path.join(self.work, f"ck_re{self.n_redeliveries}"))
        self.n_redeliveries += 1

    def play(self, batch_paths, plan):
        """plan: {'torn_at': i|None, 'redeliver': [(i, 'mid'|'end'), ...]}"""
        mid = {i for i, where in plan["redeliver"] if where == "mid"}
        for i, p in enumerate(batch_paths):
            if plan["torn_at"] == i:
                for t in self.torn_paths:
                    if os.path.exists(t):
                        os.remove(t)
            shutil.copytree(
                p, os.path.join(self.feed, os.path.basename(p))
            )
            self._run(self.feed, self.ck)
            if i in mid:
                self.redeliver(p)
        for i, where in plan["redeliver"]:
            if where == "end":
                self.redeliver(batch_paths[i])


def _draw_plan(rng, k):
    plan = {"torn_at": None, "redeliver": []}
    if rng.rand() < 0.4 and k >= 2:
        plan["torn_at"] = int(rng.randint(1, k))
    if rng.rand() < 0.7:
        plan["redeliver"].append(
            (int(rng.randint(0, k)), "mid" if rng.rand() < 0.5 else "end")
        )
    return plan


def trial_exact(spark, rng, work):
    from vectrekker_spark.operators.dedup import exact_dedup_map
    from vectrekker_spark.streaming.jobs import (
        compact_exact_corpus,
        foreach_batch_exact_dedup,
    )

    n = int(rng.randint(40, 101))
    k = int(rng.randint(2, 6))
    rows = _gen_docs(rng, n)
    schema = "doc_id long, source string, text string"
    paths = _write_batches(spark, _split(rng, rows, k), schema,
                           os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    plan = _draw_plan(rng, k)
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_exact_dedup(
            s, corpus, ck, text_col="text", id_col="doc_id",
            expected_total=n,
        ),
        torn_paths=(os.path.join(corpus, "bloom", "meta.json"),),
    )
    drv.play(paths, plan)
    compact_exact_corpus(spark, corpus)

    feed = spark.createDataFrame(rows, schema)
    want = _ids(
        feed.join(
            exact_dedup_map(feed).select(F.col("keep_id").alias("doc_id")),
            "doc_id", "left_semi",
        ),
        "doc_id",
    )
    got = _ids(spark.read.parquet(f"{corpus}/docs"), "doc_id")
    if got != want:
        return [f"exact: streamed {got} != batch keepers {want} plan={plan}"]
    return []


def trial_near(spark, rng, work):
    from vectrekker_spark.operators.dedup import (
        minhash_dedup_against,
        minhash_dedup_pairs,
    )
    from vectrekker_spark.streaming.jobs import (
        compact_near_dedup_corpus,
        foreach_batch_near_dedup,
    )

    n = int(rng.randint(30, 71))
    k = int(rng.randint(2, 5))
    rows = _gen_docs(rng, n)
    schema = "doc_id long, source string, text string"
    batches = _split(rng, rows, k)
    paths = _write_batches(spark, batches, schema, os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    plan = _draw_plan(rng, k)
    plan["torn_at"] = None  # ST7 has no heal-able aux state
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_near_dedup(
            s, corpus, ck, threshold=THRESH_NEAR,
            text_col="text", id_col="doc_id",
        ),
    )
    drv.play(paths, plan)
    compact_near_dedup_corpus(spark, corpus, id_col="doc_id")

    # batch-side accumulation oracle: the job's documented policy with
    # none of its persisted state
    hist = None
    for rows_b in batches:
        b = spark.createDataFrame(rows_b, schema)
        losers = (
            minhash_dedup_pairs(
                b, threshold=THRESH_NEAR, text_col="text", id_col="doc_id"
            )
            .select(F.col("r_id").alias("doc_id"))
            .distinct()
        )
        fresh = b.join(losers, "doc_id", "left_anti")
        if hist is not None:
            dup = minhash_dedup_against(
                fresh, hist, threshold=THRESH_NEAR,
                text_col="text", id_col="doc_id",
            )
            fresh = fresh.join(
                dup.select(F.col("new_id").alias("doc_id")).distinct(),
                "doc_id", "left_anti",
            )
        hist = fresh if hist is None else hist.unionByName(fresh)
        hist = hist.localCheckpoint()  # keep the lineage flat across batches
    want = _ids(hist, "doc_id")
    got = _ids(spark.read.parquet(f"{corpus}/docs"), "doc_id")
    if got != want:
        return [f"near: streamed {got} != batch accumulation {want} plan={plan}"]
    return []


def trial_semantic(spark, rng, work):
    from vectrekker_spark.operators.ann import ivf_centroids
    from vectrekker_spark.operators.semdedup import semantic_dedup
    from vectrekker_spark.streaming.jobs import (
        compact_semantic_corpus,
        foreach_batch_semantic_dedup,
    )

    n = int(rng.randint(30, 71))
    k = int(rng.randint(2, 5))
    rows = _gen_vectors(rng, n)
    schema = "vec_id long, embedding array<double>"
    batches = _split(rng, rows, k)
    paths = _write_batches(spark, batches, schema, os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    os.makedirs(corpus)
    feed = spark.createDataFrame(rows, schema)
    n_cells = int(rng.randint(1, 5))
    cents = ivf_centroids(
        feed.where(F.col("embedding").isNotNull()),
        n_centroids=n_cells, id_col="vec_id", vec_col="embedding",
        method="lloyd",
    )
    cents.write.parquet(os.path.join(corpus, "centroids"))
    cents = spark.read.parquet(os.path.join(corpus, "centroids"))
    plan = _draw_plan(rng, k)
    plan["torn_at"] = None  # quantizer is pre-fitted here
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_semantic_dedup(
            s, corpus, ck, id_col="vec_id", vec_col="embedding",
            threshold=THRESH_SEM,
        ),
    )
    drv.play(paths, plan)
    compact_semantic_corpus(spark, corpus, id_col="vec_id")

    want = _ids(
        semantic_dedup(
            feed, threshold=THRESH_SEM, centroids=cents,
            id_col="vec_id", vec_col="embedding",
        ),
        "vec_id",
    )
    got = _ids(spark.read.parquet(f"{corpus}/kept"), "vec_id")
    if got != want:
        return [f"semantic: streamed {got} != one-shot {want} plan={plan}"]
    return []


def trial_quota(spark, rng, work):
    from vectrekker_spark.streaming.jobs import (
        compact_quota_corpus,
        foreach_batch_quota,
    )

    n = int(rng.randint(40, 101))
    k = int(rng.randint(2, 6))
    cap = int(rng.randint(2, 8))
    rows = _gen_docs(rng, n)
    schema = "doc_id long, source string, text string"
    batches = _split(rng, rows, k)
    paths = _write_batches(spark, batches, schema, os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    plan = _draw_plan(rng, k)
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_quota(
            s, corpus, ck, cap=cap, strata_col="source", id_col="doc_id",
            seed="fuzz", expected_total=n,
        ),
        torn_paths=(os.path.join(corpus, "bloom", "meta.json"),),
    )
    drv.play(paths, plan)
    rep = compact_quota_corpus(
        spark, corpus, strata_col="source", id_col="doc_id"
    )
    fails = []
    docs = spark.read.parquet(f"{corpus}/docs")
    got_ids = _ids(docs, "doc_id")
    if len(got_ids) != len(set(got_ids)):
        fails.append(f"quota: duplicate ids after compact, plan={plan}")
    feed_ids = {i for i, _, _ in rows}
    if not set(got_ids) <= feed_ids:
        fails.append(f"quota: admitted ids outside the feed, plan={plan}")
    supply = {}
    for _, s, _ in rows:
        supply[s] = supply.get(s, 0) + 1
    admitted = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    for s, sup in supply.items():
        want = min(cap, sup)
        if admitted.get(s, 0) != want:
            fails.append(
                f"quota: stratum {s} admitted {admitted.get(s, 0)} != "
                f"min(cap={cap}, supply={sup}) plan={plan}"
            )
    # a redelivery can legitimately leave the ledger overcharged relative
    # to docs (the documented UNDERSHOOT-only crash window) ONLY when a
    # stratum was left unfilled; compact reconciles, so after it the
    # ledger must match docs exactly
    if rep["ledger_delta"] != 0:
        # compact already reconciled; a second compact must be a no-op
        rep2 = compact_quota_corpus(
            spark, corpus, strata_col="source", id_col="doc_id"
        )
        if rep2["ledger_delta"] != 0 or rep2["docs_removed"] != 0:
            fails.append(f"quota: compact did not converge, plan={plan}")
    return fails


def _gen_images(rng, n):
    """(media_id, content) rows: gradient images with planted brightness
    near-dups (same dHash), exact pixel dups re-encoded across formats,
    noisy variants, and undecodable blobs."""
    from vectrekker_spark.functions import webpcodec as wc
    from vectrekker_spark.functions.bmpcodec import encode_bmp
    from vectrekker_spark.functions.imagecodec import encode_png

    encoders = [encode_png, encode_bmp, wc.encode_webp]
    rows = []
    imgs = []
    for i in range(n):
        r = rng.rand()
        if r < 0.08:
            rows.append((i, bytes(rng.bytes(40))))  # undecodable
            continue
        if r < 0.30 and imgs:
            arr = imgs[int(rng.randint(0, len(imgs)))]  # exact pixel dup
        elif r < 0.50 and imgs:
            base = imgs[int(rng.randint(0, len(imgs)))].astype(np.int32)
            arr = np.clip(base + int(rng.randint(5, 40)), 0, 255).astype(np.uint8)
        else:
            yy, xx = np.mgrid[0:24, 0:24]
            ca, cb = int(rng.randint(1, 9)), int(rng.randint(1, 9))
            arr = np.stack(
                [(ca * yy + cb * xx) % 256,
                 (ca * xx + int(rng.randint(0, 256))) % 256,
                 (yy * xx // 4 + cb) % 256], axis=2
            ).astype(np.uint8)
        imgs.append(arr)
        enc = encoders[int(rng.randint(0, len(encoders)))]
        rows.append((i, enc(arr)))
    return rows


def trial_image(spark, rng, work):
    from vectrekker_spark.operators.imagedup import (
        dhash_band_index,
        dhash_dedup_pairs,
        dhash_dup_against,
        image_dhash,
    )
    from vectrekker_spark.streaming.jobs import (
        compact_near_dedup_corpus,
        foreach_batch_image_dedup,
    )

    n = int(rng.randint(20, 51))
    k = int(rng.randint(2, 5))
    mh = int(rng.choice([0, 2, 6]))
    rows = _gen_images(rng, n)
    schema = "media_id long, content binary"
    batches = _split(rng, rows, k)
    paths = _write_batches(spark, batches, schema, os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    plan = _draw_plan(rng, k)
    plan["torn_at"] = None  # the band index has no heal contract
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_image_dedup(
            s, corpus, ck, max_hamming=mh, id_col="media_id"
        ),
    )
    drv.play(paths, plan)
    compact_near_dedup_corpus(spark, corpus, id_col="media_id")

    # batch-side accumulation oracle with no streaming machinery
    hist = None
    for rows_b in batches:
        b = spark.createDataFrame(rows_b, schema)
        hashes = image_dhash(b)
        losers = (
            dhash_dedup_pairs(hashes, max_hamming=mh)
            .select(F.col("r_id").alias("media_id"))
            .distinct()
        )
        fresh = hashes.join(losers, "media_id", "left_anti")
        if hist is not None:
            dup = dhash_dup_against(
                fresh, dhash_band_index(hist), max_hamming=mh
            )
            fresh = fresh.join(
                dup.select(F.col("new_id").alias("media_id")).distinct(),
                "media_id", "left_anti",
            )
        hist = fresh if hist is None else hist.unionByName(fresh)
        hist = hist.localCheckpoint()
    want = _ids(hist, "media_id")
    got = _ids(spark.read.parquet(f"{corpus}/docs"), "media_id")
    if got != want:
        return [f"image: streamed {got} != batch accumulation {want} plan={plan}"]
    return []


def _gen_urls(rng, n):
    """(doc_id, url) rows with planted URL ALIASES — surface forms that
    normalize to the same canonical key (scheme/host case, default port,
    trailing slash, fragment), userinfo URLs (the r13 bug class), NULL
    urls (never duplicates of each other), and junk strings (passthrough
    keys — identical junk IS a duplicate), ids ascending."""
    rows, bases = [], []
    for i in range(n):
        r = rng.rand()
        if r < 0.06:
            u = None
        elif r < 0.12:
            u = ["not a url", "http:/broken", "", "://x"][int(rng.randint(0, 4))]
        elif r < 0.48 and bases:
            base = bases[int(rng.randint(0, len(bases)))]
            form = int(rng.randint(0, 5))
            if form == 0:
                u = base.replace("http://", "HTTP://")
            elif form == 1:
                u = base.replace("example.com", "EXAMPLE.com:80")
            elif form == 2:
                u = base + "/"
            elif form == 3:
                u = base + "#frag"
            else:
                u = base  # verbatim refetch
        else:
            ui = ["", "", "u:1@"][int(rng.randint(0, 3))]
            u = (
                f"http://{ui}h{int(rng.randint(0, 8))}.example.com"
                f"/p{int(rng.randint(0, 40))}"
            )
            bases.append(u)
        rows.append((i, u))
    return rows


def trial_url(spark, rng, work):
    """ST11: streaming URL dedup (foreach_batch_url_dedup) vs the batch
    dedup_by_url oracle over the whole feed — first arrival ≡ min-id under
    the ascending-id split precondition; torn-bloom heal and redelivery
    idempotence inherit from the exact-dedup lifecycle."""
    from vectrekker_spark.functions.urls import dedup_by_url
    from vectrekker_spark.streaming.jobs import (
        compact_exact_corpus,
        foreach_batch_url_dedup,
    )

    n = int(rng.randint(40, 101))
    k = int(rng.randint(2, 6))
    rows = _gen_urls(rng, n)
    schema = "doc_id long, url string"
    paths = _write_batches(spark, _split(rng, rows, k), schema,
                           os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    plan = _draw_plan(rng, k)
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_url_dedup(
            s, corpus, ck, url_col="url", id_col="doc_id",
            expected_total=n,
        ),
        torn_paths=(os.path.join(corpus, "bloom", "meta.json"),),
    )
    drv.play(paths, plan)
    compact_exact_corpus(spark, corpus)

    feed = spark.createDataFrame(rows, schema)
    want = _ids(dedup_by_url(feed, url_col="url", id_col="doc_id"), "doc_id")
    got = _ids(spark.read.parquet(f"{corpus}/docs"), "doc_id")
    if got != want:
        return [f"url: streamed {got} != batch dedup_by_url {want} plan={plan}"]
    return []


def _gen_para_docs(rng, n):
    """(doc_id, text) rows of 1-4 blank-line-separated paragraphs drawn
    from a growing shared pool (planted cross-doc and within-doc repeats)
    plus NULL texts; ids ascending."""
    rows = []
    pool = []
    for i in range(n):
        if rng.rand() < 0.06:
            rows.append((i, None))
            continue
        n_paras = int(rng.randint(1, 5))
        paras = []
        for _ in range(n_paras):
            if pool and rng.rand() < 0.45:
                paras.append(pool[int(rng.randint(0, len(pool)))])
            else:
                m = int(rng.randint(5, 14))
                p = " ".join(VOCAB[int(j)] for j in rng.randint(0, len(VOCAB), m))
                pool.append(p)
                paras.append(p)
        rows.append((i, "\n\n".join(paras)))
    return rows


def trial_para(spark, rng, work):
    """ST12: streaming paragraph dedup (foreach_batch_para_dedup) vs the
    one-shot batch dedup_paragraphs oracle over the whole feed — the
    accumulated-batches ≡ one-shot equivalence under ascending-id splits
    + redeliveries. Torn-index injection is deliberately absent: a torn
    para_hashes window is DOCUMENTED permanent under-dedup (heal with
    compact), so strict oracle equality doesn't survive it."""
    from vectrekker_spark.operators.paradedup import dedup_paragraphs
    from vectrekker_spark.streaming.jobs import (
        compact_para_corpus,
        foreach_batch_para_dedup,
    )

    n = int(rng.randint(30, 81))
    k = int(rng.randint(2, 6))
    rows = _gen_para_docs(rng, n)
    schema = "doc_id long, text string"
    paths = _write_batches(spark, _split(rng, rows, k), schema,
                           os.path.join(work, "feed"))
    corpus = os.path.join(work, "corpus")
    plan = _draw_plan(rng, k)
    plan["torn_at"] = None  # see docstring
    drv = _Driver(
        spark, work, schema,
        lambda s, ck: foreach_batch_para_dedup(s, corpus, ck, min_chars=20),
        torn_paths=(),
    )
    drv.play(paths, plan)
    compact_para_corpus(spark, corpus, min_chars=20)

    feed = spark.createDataFrame(rows, schema)
    out = dedup_paragraphs(feed, min_chars=20)
    want = sorted(
        (r["doc_id"], r["text_dedup"])
        for r in out.collect()
        if r["text_dedup"] is None or len(r["text_dedup"]) > 0
    )
    got = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{corpus}/docs").collect()
    )
    if got != want:
        return [
            f"para: streamed corpus != one-shot dedup_paragraphs "
            f"(got {len(got)} rows, want {len(want)}) plan={plan}"
        ]
    return []


FAMILIES = {
    "exact": trial_exact,
    "near": trial_near,
    "semantic": trial_semantic,
    "quota": trial_quota,
    "image": trial_image,
    "url": trial_url,
    "para": trial_para,
}


def fuzz(spark, n=4, seed=7, families=None, out_dir=None, keep_going=True):
    """Run ``n`` seeded trials per family; returns failure strings."""
    failures = []
    fam_offset = {f: i for i, f in enumerate(FAMILIES)}
    for fam in families or FAMILIES:
        fn = FAMILIES[fam]
        for t in range(n):
            # deterministic per-(seed, family, trial) stream — Python's
            # hash() is randomized per process and would make the
            # fixed-seed CI pin silently test a different corpus per run
            rng = np.random.RandomState(
                seed * 1000 + t * 17 + fam_offset[fam] * 97
            )
            work = tempfile.mkdtemp(prefix=f"sfuzz_{fam}_")
            try:
                fails = fn(spark, rng, work)
            except Exception as e:  # a crash is a finding too
                fails = [f"{fam} trial {t} raised {type(e).__name__}: {e}"]
            finally:
                shutil.rmtree(work, ignore_errors=True)
            if fails:
                failures.extend(fails)
                if out_dir:
                    os.makedirs(out_dir, exist_ok=True)
                    with open(
                        os.path.join(out_dir, f"{fam}_{seed}_{t}.json"), "w"
                    ) as f:
                        json.dump(
                            {"family": fam, "seed": seed, "trial": t,
                             "failures": fails}, f, indent=2,
                        )
                if not keep_going:
                    return failures
            print(f"{fam} seed={seed} trial={t}: "
                  f"{'FAIL' if fails else 'ok'}", flush=True)
    return failures


def main() -> int:
    from vectrekker_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    seeds = [int(a) for a in sys.argv[2:]] or [7]
    spark = get_spark(app_name="streaming-fuzz")
    out = os.path.join(ROOT, ".fuzz_failures", "streaming")
    all_failures = []
    for seed in seeds:
        all_failures += fuzz(spark, n=n, seed=seed, out_dir=out)
    print(json.dumps({
        "families": list(FAMILIES), "trials_per_family": n,
        "seeds": seeds, "failures": len(all_failures),
    }))
    for f in all_failures:
        print("FAIL:", f)
    return 1 if all_failures else 0


if __name__ == "__main__":
    sys.exit(main())
