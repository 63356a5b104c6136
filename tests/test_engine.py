"""Engine facade: the three entry points (sql / table / operator sugar)
converge on the same catalog and return consistent results."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrekker_spark.engine import Engine


def test_engine_entry_points_agree(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    via_sql = eng.sql("SELECT COUNT(*) AS n FROM embeddings").collect()[0]["n"]
    via_table = eng.table("embeddings").count()
    assert via_sql == via_table > 0


def test_engine_knn_and_approx_agree_on_top_hit(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    em = eng.table("embeddings")
    qvec = em.filter(F.col("vec_id") == 0).collect()[0]["embedding"]

    exact = eng.knn(qvec, k=5).collect()
    assert exact[0]["vec_id"] == 0  # self-match first

    q = em.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    approx = eng.approx_knn(q, k=5, n_centroids=4, n_probe=4).collect()
    # probing every cell makes IVF exhaustive → must find the self-match
    assert approx[0]["vec_id"] == 0 and approx[0]["rank"] == 1


def test_engine_ivf_build_is_cached(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    b1 = eng.ivf_index(n_centroids=4)
    b2 = eng.ivf_index(n_centroids=4)
    assert b1 is b2  # one KMeans fit + assignment join per session, not per query
    b3 = eng.ivf_index(n_centroids=8)
    assert b3 is not b1  # different dials → different index


def test_engine_persisted_ann_roundtrip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    path = str(tmp_path / "ivf")
    eng.save_ann_index(path, n_centroids=4)
    em = eng.table("embeddings")
    q = em.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res = eng.approx_knn_persisted(path, q, k=5, n_probe=4).collect()
    # probing every cell makes IVF exhaustive → must find the self-match
    assert res[0]["vec_id"] == 0 and res[0]["rank"] == 1


def test_engine_embed_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    df = spark.createDataFrame([(1, "alpha beta gamma")], "id long, text string")
    out = eng.embed(df).collect()
    assert len(out[0]["embedding"]) == 64


def test_engine_curation_sugar(spark, sf_dir):
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    docs = eng.table("documents")
    # split covers every row with the three default labels
    splits = {r["split"] for r in eng.split(docs).select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # decontaminate returns a subset of train
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    kept = eng.decontaminate(train, bench)
    assert kept.count() <= train.count()
    # top_terms ranked and bounded
    terms = eng.top_terms(docs, k=5).collect()
    assert len(terms) == 5 and terms[0]["tfidf"] >= terms[-1]["tfidf"]
    # redaction replaces the text column in place
    pii = spark.createDataFrame([(1, "mail me: a.b@example.com")], "id long, text string")
    assert eng.redact_pii(pii).collect()[0]["text"] == "mail me: <EMAIL>"
    # bm25 relevance gate: matching doc outscores a non-matching one
    rel = spark.createDataFrame(
        [(1, "spark executors shuffle"), (2, "gardening tips")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["score"] for r in eng.bm25(rel, "spark").collect()}
    assert scores[1] > scores[2] == 0.0
    # bloom decontamination facade: subset of train, superset of exact drops
    bf = eng.benchmark_bloom(bench, fpp=1e-6)
    bloom_kept = eng.decontaminate_bloom(train, bf)
    assert bloom_kept.count() <= kept.count()
    bf.release()


def test_engine_asof_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 5, 2.5)], "k long, ts long, v double")
    row = eng.asof_join(left, right, key="k").collect()[0]
    assert row["v"] == 2.5 and row["asof_ts"] == 5


def test_engine_assembly_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    docs = eng.table("documents").select("doc_id", "text", "lang", "source")
    # deterministic sampling / mixing / shuffle
    s = eng.sample(docs, 0.3, seed="e")
    assert 0 < s.count() < docs.count()
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    m = eng.mix(docs, {srcs[0]: 1.0}, strata_col="source")
    assert {r["source"] for r in m.select("source").distinct().collect()} == {srcs[0]}
    sh = eng.shuffle_order(docs.limit(50))
    assert sh.count() == 50
    # packing over chunked docs
    from pyspark.sql import functions as F

    chunks = spark.createDataFrame(
        [(0, i, f"c{i}", 30) for i in range(10)],
        "doc_id long, chunk_id long, chunk_text string, n_tokens int",
    )
    packed = eng.pack_sequences(chunks, 64)
    assert packed.count() == 10
    assert packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("t")).filter(
        F.col("t") > 64
    ).count() == 0
    # incremental near-dedup facade
    hits = eng.near_dedup_against(docs.limit(20), docs.limit(20), threshold=0.99)
    assert hits.count() >= 20  # every doc near-dups itself in the corpus copy
    # per-stratum quota facades: capped per source, deterministic
    capped = eng.cap_per_stratum_random(docs, 3, strata_col="source")
    per = capped.groupBy("source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    best = eng.cap_per_stratum(
        docs, 2, strata_col="source",
        order_cols=[F.length("text").desc(), "doc_id"],
    )
    assert best.groupBy("source").count().agg(F.max("count")).first()[0] <= 2


def test_engine_quantized_ann_facade(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    path = str(tmp_path / "q8")
    eng.save_ann_index(path, n_centroids=4, quantize=True)
    em = eng.table("embeddings")
    q = em.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # rerank (default): exact full-precision scores → self-match at 1.0
    res = eng.approx_knn_persisted(path, q, k=5, n_probe=4).collect()
    assert res[0]["vec_id"] == 0 and res[0]["rank"] == 1 and res[0]["score"] == 1.0
    # codes-only: still finds the self-match, score within the int8 error
    res2 = eng.approx_knn_persisted(path, q, k=5, n_probe=4, rerank=False).collect()
    assert res2[0]["vec_id"] == 0 and abs(res2[0]["score"] - 1.0) < 0.01


def test_engine_span_dedup_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    boiler = "0 1 2 3 4 5 6 7 8 9"
    df = spark.createDataFrame(
        [(1, f"aa bb {boiler}"), (2, f"cc dd {boiler} ee")],
        "doc_id long, text string",
    )
    spans = eng.duplicate_spans(df, n=10).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans] == [
        (2, 2, 11)
    ]
    stripped = eng.strip_spans(df, n=10)
    cleaned = {r["doc_id"]: r["text_clean"] for r in stripped.collect()}
    assert cleaned == {1: f"aa bb {boiler}", 2: "cc dd ee"}
    # the facade exposes the cache release (the release_bm25 idiom): a
    # long-lived driver must be able to free the gram cache per call
    assert stripped._cached_grams.storageLevel.useMemory
    Engine.release_spans(stripped)
    assert not stripped._cached_grams.storageLevel.useMemory


def test_engine_profiling_and_sketch_sugar(spark, sf_dir):
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    docs = eng.table("documents")
    prof = eng.profile(docs, columns=["doc_id", "text"])
    assert {r["column"] for r in prof.collect()} == {"doc_id", "text"}
    diff = eng.profile_diff(prof, prof)
    assert all(r["status"] == "ok" for r in diff.collect())
    top = eng.top_tokens(docs, k=3)
    assert len(top) == 3 and all(c > 0 for _, c in top)
    media = docs.limit(5).select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    assert eng.image_meta(media).count() == 5
    assert eng.audio_meta(media).count() == 5


def test_engine_semdedup_and_quality_sugar(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    emb = eng.table("embeddings").limit(40)
    kept = eng.semantic_dedup(emb, threshold=0.999, n_clusters=2)
    dec = eng.semantic_dedup_decisions(emb, threshold=0.999, n_clusters=2)
    assert kept.count() == dec.where(F.col("keep")).count()
    assert dec.count() == 40

    docs = eng.table("documents").limit(30)
    labeled = docs.withColumn("label", (F.col("doc_id") % 2).cast("int"))
    w, b = eng.fit_quality(labeled, n_features=1 << 10, iters=20)
    assert isinstance(b, float) and len(w) == 1 << 10
    scored = eng.score_quality(docs, w, bias=b)
    assert scored.where(F.col("quality_score").isNull()).count() == docs.where(
        F.col("text").isNull()
    ).count()
    kept_q = eng.quality_filter(docs, np.zeros(16), min_score=0.4)
    assert kept_q.count() == docs.where(F.col("text").isNotNull()).count()


def test_engine_ngram_lm_sugar(spark, sf_dir):
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    docs = eng.table("documents").limit(50)
    lm = eng.fit_ngram_lm(docs, vocab_size=256, max_bigrams=512)
    scored = eng.score_perplexity(docs, lm)
    nonnull = docs.where(F.col("text").isNotNull()).count()
    assert scored.where(F.col("perplexity").isNotNull()).count() == nonnull
    kept = eng.perplexity_filter(docs, lm, max_ppl=1e12)
    assert kept.count() == nonnull


def test_engine_multimodal_sugar(spark, sf_dir):
    """r10 facades: the whole multimodal surface reachable from Engine."""
    import numpy as np

    from vectrekker_spark.functions.imagecodec import encode_png
    from vectrekker_spark.functions.jpegcodec import encode_jpeg
    from vectrekker_spark.functions.videocodec import encode_y4m

    eng = Engine(spark, sf_dir)
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([yy * 16, xx * 16, (yy + xx) * 8], axis=2).astype(np.uint8)
    pcm = (np.sin(np.arange(4096) / 5) * 20000).astype("<i2").tobytes()
    vid = encode_y4m(
        [img, img[:, :, ::-1].copy()], fps=(5, 1), colorspace="444"
    )
    media = spark.createDataFrame(
        [
            (1, encode_png(img)),
            (2, encode_jpeg(img, quality=90)),
            (3, pcm),
            (4, vid),
        ],
        "media_id long, content binary",
    )
    feats = {r.media_id: r for r in eng.media_features(media).collect()}
    assert feats[1].decoded and feats[2].decoded and not feats[3].decoded

    vmeta = {r.media_id: r for r in eng.video_meta(media).collect()}
    assert vmeta[4].vid_frames == 2 and vmeta[1].vid_format is None

    vf = eng.video_frame_features(media, every_n=1).collect()
    assert {r.frame_no for r in vf if r.media_id == 4} == {0, 1}

    audio = eng.audio_features(media.where("media_id = 3"), window=1024)
    spect = eng.spectral_features(media.where("media_id = 3"), window=1024)
    assert audio.count() == 4 and spect.count() == 4  # 4096 samples / 1024
    assert all(r.sample_rate is None for r in spect.collect())  # raw PCM16

    # r12 facades: perceptual image hash + near-dedup (png/jpeg of the
    # SAME pixels hash within a few bits -> the jpeg copy is dropped)
    hashes = {r.media_id: r.dhash for r in eng.image_dhash(media).collect()}
    assert hashes[1] is not None and hashes[3] is None
    kept = sorted(r.media_id for r in eng.image_near_dedup(media).collect())
    assert kept == [1, 3, 4]


def test_engine_crawl_and_pq_surface(spark, sf_dir, tmp_path):
    """The r13 facade methods delegate correctly: WARC readers, URL ops,
    HTML extraction, and the PQ trio, end-to-end on tiny inputs."""
    from pyspark.sql import functions as F

    from tests.test_text_formats import _fixture_warc

    eng = Engine(spark, sf_dir)
    p = tmp_path / "e.warc"
    p.write_bytes(_fixture_warc())
    assert eng.read_warc(str(p)).count() == 3
    docs = eng.warc_docs(str(p))
    assert {"doc_id", "text", "url"} <= set(docs.columns)
    html = eng.warc_html_docs(str(p))
    assert html.count() == 1  # only the html-mime response
    stripped = eng.html_to_text(
        spark.createDataFrame([("<p>a b</p>",)], "text string")
    )
    assert stripped.first().text == "a b"
    assert eng.dedup_by_url(docs).count() == 3
    assert eng.host_stats(docs).count() >= 1
    bl = spark.createDataFrame([("example.com",)], "host string")
    assert eng.filter_hosts(docs, bl).count() == 0  # all fixture urls match

    em = eng.table("embeddings").select("vec_id", "embedding")
    cb = eng.pq_train(em, m=8, nbits=4)
    codes = eng.pq_encode(em, cb)
    q = em.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res = eng.pq_search(q, codes, cb, k=3)
    assert res.count() == 6 and set(res.columns) == {"qid", "vec_id", "score", "rank"}


def test_engine_paragraph_dedup_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    banner = "subscribe to our newsletter for weekly updates and offers"
    df = spark.createDataFrame(
        [(1, f"alpha unique block\n\n{banner}"), (2, f"{banner}\n\nbeta tail")],
        "doc_id long, text string",
    )
    flagged = eng.duplicate_paragraphs(df, min_chars=40).collect()
    assert [(r["id"], r["pos"]) for r in flagged] == [(2, 0)]
    out = {
        r["doc_id"]: (r["text_dedup"], r["paras_dropped"])
        for r in eng.dedup_paragraphs(df, min_chars=40).collect()
    }
    assert out == {
        1: (f"alpha unique block\n\n{banner}", 0),
        2: ("beta tail", 1),
    }


def test_engine_bpe_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    df = spark.createDataFrame(
        [(1, "aa aa aa ab"), (2, "aa ba")], "doc_id long, text string"
    )
    model = eng.fit_bpe(df, n_merges=5, min_pair_count=2)
    assert ("a", "a") in model.merges
    enc = {r["doc_id"]: r["bpe_tokens"] for r in eng.bpe_encode(df, model).collect()}
    assert enc[1][0] == "aa"
    cnt = {
        r["doc_id"]: r["bpe_n_tokens"]
        for r in eng.bpe_token_count(df, model).collect()
    }
    assert cnt[1] == sum(len(model.encode_word(w)) for w in "aa aa aa ab".split())


def test_engine_normalize_and_compression_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    df = spark.createDataFrame(
        [(1, "cafÃ©  x"), (2, "abab" * 50)], "doc_id long, text string"
    )
    normed = {r["doc_id"]: r["text"] for r in eng.normalize_text(df).collect()}
    assert normed[1] == "café x"
    ratios = {
        r["doc_id"]: r["compression_ratio"]
        for r in eng.compression_ratio(df).collect()
    }
    assert ratios[2] < 0.2


def test_engine_robots_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /no/")],
        "host string, robots_txt string",
    )
    rules = eng.parse_robots(robots)
    frontier = spark.createDataFrame(
        [(0, "http://h.example/no/x"), (1, "http://h.example/yes")],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r["robots_allowed"]
        for r in eng.robots_allowed(frontier, rules).collect()
    }
    assert out == {0: False, 1: True}


def test_engine_dsir_and_line_dedup_sugar(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    target = spark.createDataFrame(
        [("quantum orbitals in molecules",)], "text string"
    )
    raw = spark.createDataFrame(
        [("a", "quantum orbitals in molecules"),
         ("b", "football scores tonight again")],
        "doc_id string, text string",
    )
    lp_t = eng.dsir_fit(target, n_features=1 << 10)
    lp_r = eng.dsir_fit(raw, n_features=1 << 10)
    w = eng.dsir_weights(raw, lp_t * 50, lp_r * 50)
    [picked] = eng.dsir_select(w, 1, id_col="doc_id").collect()
    assert picked["doc_id"] == "a"

    docs = spark.createDataFrame(
        [(1, "unique first line here today\nshared footer line of the site"),
         (2, "shared footer line of the site\nother words entirely here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text_dedup"]
           for r in eng.dedup_lines(docs, min_chars=20).collect()}
    assert out[2] == "other words entirely here"

    base = "spark shuffles the narrow stream of tokens across the cluster"
    scored = spark.createDataFrame(
        [(1, base, 0.1), (2, base, 0.9)], "doc_id long, text string, q double"
    )
    kb = {r["doc_id"]: r["keep"]
          for r in eng.near_dedup_keep_best(scored, "q", threshold=0.9).collect()}
    assert kb == {1: False, 2: True}

import pytest  # noqa: E402  (slow marker below)

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
