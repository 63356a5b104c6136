"""Curation funnel: planted exact dups, near dups, junk, and off-language
docs each removed at their stage; survivors chunked+embedded."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrekker_spark.curation import CurationConfig, CurationResult, curate

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and then runs across the "
    "meadow while the sun is setting behind the hills of the old valley"
)
NEAR = GOOD_EN.replace("lazy dog", "sleepy dog")
GOOD_DE = (
    "der schnelle braune fuchs springt und das wetter ist nicht schlecht "
    "und die sonne scheint mit einem warmen licht auf das alte tal heute"
)
JUNK = "@@@ ### !!! $$$ %% ^^ && ** (( )) ++ == ~~ `` || ;; :: <> ?? //"


def test_funnel_stages(spark):
    rows = [
        (0, GOOD_EN, "en"),
        (1, GOOD_EN, "en"),      # exact dup of 0 → dropped at stage 1
        (2, NEAR, "en"),         # near dup of 0 → dropped at stage 2
        (3, GOOD_DE, "de"),      # wrong lang → dropped at stage 4
        (4, JUNK, "en"),         # junk → dropped at stage 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    res: CurationResult = curate(
        docs,
        CurationConfig(keep_langs=("en",), chunk_size=60, chunk_overlap=10),
    )
    assert res.funnel["input"] == 5
    assert res.funnel["after_exact_dedup"] == 4
    assert res.funnel["after_near_dedup"] == 3
    assert res.funnel["after_quality"] == 2
    assert res.funnel["after_lang"] == 1
    assert res.funnel["chunks"] >= 2

    out = res.chunks.collect()
    assert {r["doc_id"] for r in out} == {0}
    assert all(len(r["embedding"]) == 64 for r in out)
    # chunks reconstruct the surviving doc
    ordered = sorted(out, key=lambda r: r["chunk_id"])
    rebuilt = "".join(r["chunk_text"][:50] for r in ordered[:-1]) + ordered[-1]["chunk_text"]
    assert rebuilt == GOOD_EN


def test_assemble_training_set(spark, sf_dir, tmp_path):
    from vectrekker_spark.curation import AssemblyConfig, assemble_training_set

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "shards")
    cfg = AssemblyConfig(
        curation=CurationConfig(min_quality=0.5, embed=False),
        max_tokens=128,
        rows_per_shard=500,
    )
    funnel = assemble_training_set(docs, out, cfg)
    assert funnel["sequences"] > 0

    shards = spark.read.parquet(out)
    assert shards.count() == funnel["chunks"]
    # no sequence exceeds the budget except single-oversize-chunk sequences
    bad = (
        shards.groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("t") > 128) & (F.col("n") > 1))
        .count()
    )
    assert bad == 0
    # shard files respect the row bound
    import glob

    files = glob.glob(f"{out}/part-*")
    assert files
    for f in files:
        assert spark.read.parquet(f).count() <= 500

    # deterministic: same config → same sequence ordering hash
    out2 = str(tmp_path / "shards2")
    assemble_training_set(docs, out2, cfg)
    a = [tuple(r) for r in spark.read.parquet(out).orderBy("seq_id", "seq_pos").collect()]
    b = [tuple(r) for r in spark.read.parquet(out2).orderBy("seq_id", "seq_pos").collect()]
    assert a == b


def test_curate_on_fixture_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    res = curate(docs, CurationConfig(min_quality=0.5, embed=False))
    # chunks are cached: the funnel count and caller consumption share one
    # execution of the chunk stage instead of re-deriving it per action
    assert res.chunks.storageLevel.useMemory
    assert res.funnel["after_exact_dedup"] <= res.funnel["input"]
    assert res.funnel["chunks"] >= res.funnel["after_lang"]  # ≥1 chunk per doc
    assert res.chunks.filter(F.length("chunk_text") == 0).count() == 0


def test_curate_relevance_gate(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [
            (0, "spark executors shuffle partitions spark", "en"),
            (1, "gardening tips for spring tulips", "en"),
            (2, "spark catalyst optimizer plans", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        relevance_query="spark optimizer", min_relevance=0.1,
    )
    res = curate(docs, cfg)
    kept = {r["doc_id"] for r in res.chunks.select("doc_id").distinct().collect()}
    res.unpersist()
    assert 1 not in kept  # the gardening doc fails the BM25 gate
    assert {0, 2} <= kept
    assert res.funnel["after_relevance"] == 2


def test_curate_span_strip_stage(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    boiler = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, f"unique words here {boiler}", "en"),
            (1, f"{boiler} totally different tail content", "en"),
            (2, "no shared content in this document at all", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        strip_span_ngram=10, chunk_size=4096,
    )
    res = curate(docs, cfg)
    chunks = {
        r["doc_id"]: r["chunk_text"] for r in res.chunks.collect()
    }
    res.unpersist()
    assert res.funnel["span_stripped_docs"] == 1  # only doc 1 was touched
    assert chunks[0] == f"unique words here {boiler}"  # canonical copy kept
    assert chunks[1] == "totally different tail content"
    assert chunks[2] == "no shared content in this document at all"


def test_curate_span_strip_validates_at_start(spark):
    import pytest

    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame([(0, "x", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="strip_span_ngram"):
        curate(docs, CurationConfig(strip_span_ngram=1))


def test_curate_semantic_dedup_stage(spark):
    # two paraphrases share an embedding direction (MinHash can't see it —
    # different tokens), a third doc is orthogonal; the semantic stage
    # drops the larger-id paraphrase
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en",
         [1.0, 0.0, 0.0]),
        (1, "completely different words but identical meaning vector here ok",
         "en", [0.9999, 0.0001, 0.0]),
        (2, "an unrelated document about other topics entirely written here",
         "en", [0.0, 1.0, 0.0]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, embedding array<double>"
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        semantic_dedup_threshold=0.99, semantic_n_clusters=1,
        chunk_size=4096,
    )
    res = curate(docs, cfg)
    ids = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    assert res.funnel["after_semantic_dedup"] == 2
    assert ids == {0, 2}


def test_curate_semantic_dedup_validates_at_start(spark):
    import pytest

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="no 'embedding' column"):
        curate(docs, CurationConfig(semantic_dedup_threshold=0.9))
    with pytest.raises(ValueError, match="semantic_dedup_threshold"):
        curate(docs, CurationConfig(semantic_dedup_threshold=1.5))
    with pytest.raises(ValueError, match="semantic_n_clusters"):
        docs2 = docs.withColumn("embedding", F.array(F.lit(1.0)))
        curate(
            docs2,
            CurationConfig(semantic_dedup_threshold=0.9, semantic_n_clusters=-1),
        )


def test_curate_model_quality_stage(spark, tmp_path):
    import numpy as np

    from vectrekker_spark.operators.qualityscore import feature_index, save_model

    # weights that push docs containing "spammy" below 0.5 and others above
    n = 1 << 10
    w = np.zeros(n)
    w[feature_index("spammy", n)] = -8.0
    w[feature_index("useful", n)] = +8.0
    path = str(tmp_path / "model.npz")
    save_model(path, w, 1.0)

    rows = [
        (0, "useful prose with real content and several informative words here",
         "en"),
        (1, "spammy spammy spammy spammy spammy spammy spammy spammy spammy ok",
         "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        quality_model_path=path, min_model_quality=0.5, chunk_size=4096,
    )
    res = curate(docs, cfg)
    ids = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    assert res.funnel["after_model_quality"] == 1
    assert ids == {0}


def test_curate_model_quality_validates_at_start(spark, tmp_path):
    import numpy as np
    import pytest

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, other=np.zeros(4))
    with pytest.raises(ValueError, match="weights/bias"):
        curate(docs, CurationConfig(quality_model_path=bad))


def test_curate_model_gate_collision_and_threshold_validate_at_start(
    spark, tmp_path
):
    import numpy as np
    import pytest

    from vectrekker_spark.operators.qualityscore import save_model

    path = str(tmp_path / "m.npz")
    save_model(path, np.zeros(16), 0.0)
    docs = spark.createDataFrame(
        [(0, "x", "en", 0.9)],
        "doc_id long, text string, lang string, quality_score double",
    )
    with pytest.raises(ValueError, match="quality_score"):
        curate(docs, CurationConfig(quality_model_path=path))
    plain = docs.drop("quality_score")
    with pytest.raises(ValueError, match="min_model_quality"):
        curate(
            plain,
            CurationConfig(quality_model_path=path, min_model_quality=1.5),
        )


def test_curate_perplexity_stage(spark, tmp_path):
    from vectrekker_spark.operators.ngramlm import (
        fit_ngram_lm,
        lm_save,
        perplexity_py,
    )

    ref = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the dog sat on the log")],
        "doc_id long, text string",
    )
    lm = fit_ngram_lm(ref)
    path = str(tmp_path / "lm")
    lm_save(lm, path)

    good = "the cat sat on the mat"
    bad = "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll"
    docs = spark.createDataFrame(
        [(0, good, "en"), (1, bad, "en")], "doc_id long, text string, lang string"
    )
    cut = perplexity_py(good, lm) + 1.0
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        ngram_lm_path=path, max_perplexity=cut, chunk_size=4096,
    )
    res = curate(docs, cfg)
    ids = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    assert res.funnel["after_perplexity"] == 1
    assert ids == {0}


def test_curate_perplexity_validates_at_start(spark, tmp_path):
    import pytest

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="torn|not an lm_save"):
        curate(docs, CurationConfig(ngram_lm_path=str(tmp_path / "nope")))


def test_curate_stratum_cap_stage(spark):
    # distinct texts so no dedup stage interferes; 4 docs on source "hot",
    # 2 on "cold"; cap 2 → 2+2 survivors, and the kept set is the stable
    # hash-order selection (deterministic across runs)
    texts = [
        "the quick brown fox jumps over the lazy dog near the old mill",
        "a completely different sentence about the weather in the valley",
        "yet another unique document describing mountains and deep rivers",
        "the fourth document talks about oceans and ships sailing at dawn",
        "cold source first text with some reasonable english words here",
        "cold source second text also with plain everyday english words",
    ]
    rows = [(i, texts[i], "en", "hot" if i < 4 else "cold") for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    cfg = CurationConfig(min_quality=0.0, max_docs_per_stratum=2, embed=False)
    res = curate(docs, cfg)
    assert res.funnel["after_stratum_cap"] == 4
    kept = {r["doc_id"] for r in res.chunks.select("doc_id").distinct().collect()}
    assert len(kept & {0, 1, 2, 3}) == 2 and len(kept & {4, 5}) == 2
    res2 = curate(docs, cfg)
    kept2 = {r["doc_id"] for r in res2.chunks.select("doc_id").distinct().collect()}
    assert kept2 == kept  # stable hash order, not rand()
    res.unpersist(); res2.unpersist()


def test_curate_stratum_cap_validates_at_start(spark):
    import pytest

    docs = spark.createDataFrame(
        [(0, GOOD_EN, "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="no 'source' column"):
        curate(docs, CurationConfig(max_docs_per_stratum=3))
    with pytest.raises(ValueError, match="must be >= 0"):
        curate(docs, CurationConfig(max_docs_per_stratum=-1))


def test_curate_stage_seconds_align_with_funnel(spark):
    rows = [(0, GOOD_EN, "en"), (1, NEAR, "en"), (2, GOOD_DE, "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    res = curate(docs, CurationConfig(embed=False))
    # every funnel key has a timing, every timing has a funnel key
    assert set(res.stage_seconds) == set(res.funnel)
    assert all(v >= 0.0 for v in res.stage_seconds.values())
    # the shared one-pass agg bills its job to after_near_dedup
    assert res.stage_seconds["after_quality"] == 0.0
    assert res.stage_seconds["after_lang"] == 0.0
    res.unpersist()


def test_curate_stratum_cap_rn_collision_validates_at_start(spark):
    import pytest
    from pyspark.sql import functions as F2

    docs = spark.createDataFrame(
        [(0, GOOD_EN, "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).withColumn("__rn", F2.lit(1))
    with pytest.raises(ValueError, match="__rn"):
        curate(docs, CurationConfig(max_docs_per_stratum=3))


def test_assemble_surfaces_stage_seconds(spark, tmp_path):
    from vectrekker_spark.curation import AssemblyConfig, assemble_training_set

    docs = spark.createDataFrame(
        [(0, GOOD_EN, "en"), (1, GOOD_DE, "de")],
        "doc_id long, text string, lang string",
    )
    funnel = assemble_training_set(
        docs, str(tmp_path / "sh"),
        AssemblyConfig(curation=CurationConfig(min_quality=0.0, embed=False)),
    )
    ts = funnel["_stage_seconds"]
    assert set(ts) <= set(funnel)  # timings key into the stage counts
    assert all(isinstance(v, float) for v in ts.values())


def test_exact_dedup_collapses_content_hash_id_collisions(spark):
    """Content-hash doc ids (the sources/text_formats policy) make
    identical texts share an id; the exact-dedup stage must collapse the
    duplicate ROWS, not just pick a keeper id that both rows carry
    (found by scripts/crawl_benchmark: mirrors sailed through)."""
    from vectrekker_spark.curation import CurationConfig, curate

    rows = [
        (100, "mirrored page body words here today"),
        (100, "mirrored page body words here today"),  # mirror: same id
        (200, "a different page body entirely now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(docs, CurationConfig(min_quality=0.0, embed=False))
    funnel = dict(res.funnel)
    assert funnel["input"] == 3
    assert funnel["after_exact_dedup"] == 2


def test_curate_paragraph_dedup_stage(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    banner = "subscribe to our newsletter for weekly updates and offers"
    docs = spark.createDataFrame(
        [
            (0, f"unique alpha content paragraph\n\n{banner}", "en"),
            (1, f"{banner}\n\ndifferent beta tail paragraph here", "en"),
            (2, banner, "en"),  # strips to '' → dropped by the stage
            (3, "untouched gamma document with one block", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        dedup_paragraphs_min_chars=40, chunk_size=4096,
    )
    res = curate(docs, cfg)
    chunks = {r["doc_id"]: r["chunk_text"] for r in res.chunks.collect()}
    res.unpersist()
    assert res.funnel["after_para_dedup"] == 3  # doc 2 stripped to ''
    assert chunks[0] == f"unique alpha content paragraph\n\n{banner}"  # keeper
    assert chunks[1] == "different beta tail paragraph here"
    assert 2 not in chunks
    assert chunks[3] == "untouched gamma document with one block"


def test_curate_paragraph_dedup_validates_at_start(spark):
    import pytest

    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="dedup_paragraphs_min_chars"):
        curate(docs, CurationConfig(dedup_paragraphs_min_chars=-1))
    collided = docs.withColumn("paras_dropped", docs.doc_id)
    with pytest.raises(ValueError, match="paras_dropped"):
        curate(collided, CurationConfig(dedup_paragraphs_min_chars=40))


def test_curate_normalize_stage(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    moji = "cafÃ©  menu with plenty of  words for the  gate".replace("  ", "   ")
    docs = spark.createDataFrame(
        [
            (0, moji, "en"),
            (1, "plain document with ordinary words throughout", "en"),
            (2, "\x00\x01", "en"),  # normalizes to '' → dropped
        ],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        normalize_form="NFKC", chunk_size=4096,
    )
    res = curate(docs, cfg)
    chunks = {r["doc_id"]: r["chunk_text"] for r in res.chunks.collect()}
    res.unpersist()
    assert res.funnel["after_normalize"] == 2
    assert chunks[0] == "café menu with plenty of words for the gate"
    assert 2 not in chunks


def test_curate_normalize_validates_at_start(spark):
    import pytest

    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="normalize_form"):
        curate(docs, CurationConfig(normalize_form="NFX"))


def test_curate_compression_gate(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    spam = "buy now " * 80
    prose = (
        "The committee's final report recommended sweeping changes to how "
        "rural hospitals recruit and retain specialist physicians, with "
        "particular attention to housing and school access for families."
    )
    docs = spark.createDataFrame(
        [(0, spam, "en"), (1, prose, "en"), (2, None, "en")],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        min_compression_ratio=0.3, chunk_size=4096,
    )
    res = curate(docs, cfg)
    kept = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    # the NULL-text doc already fell at the heuristic quality gate (its
    # score is NULL); the compression gate then drops spam, keeps prose
    assert res.funnel["after_compression"] == 1
    assert 0 not in kept and 1 in kept


def test_curate_compression_gate_validates_at_start(spark):
    import pytest

    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="min_compression_ratio"):
        curate(docs, CurationConfig(min_compression_ratio=1.5))
    collided = docs.withColumn("__zratio", docs.doc_id)
    with pytest.raises(ValueError, match="__zratio"):
        curate(collided, CurationConfig(min_compression_ratio=0.3))


def test_curate_sentence_chunks(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    text = (
        "First sentence of the document right here. Second sentence follows "
        "directly after it. Third one closes the paragraph out fully."
    )
    docs = spark.createDataFrame(
        [(0, text, "en")], "doc_id long, text string, lang string"
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        chunk_size=90, sentence_chunks=True,
    )
    res = curate(docs, cfg)
    chunks = [r["chunk_text"] for r in res.chunks.orderBy("chunk_id").collect()]
    res.unpersist()
    # no chunk cuts mid-sentence: each chunk is whole sentences
    assert all(c.endswith(".") for c in chunks)
    assert " ".join(chunks) == text
    assert all(len(c) <= 90 for c in chunks) and len(chunks) == 2


def test_curate_min_lang_conf_gate(spark, tmp_path):
    from vectrekker_spark.curation import CurationConfig, curate
    from vectrekker_spark.operators.langid import fit_langid, save_langid

    lat = [
        ("the quick brown fox jumps over the lazy dog near town", "eng")
        for _ in range(20)
    ]
    cyr = [("привет мир это документ на русском языке сегодня", "rus") for _ in range(20)]
    labeled = spark.createDataFrame(lat + cyr, "text string, lang string")
    model = fit_langid(labeled)
    path = str(tmp_path / "langid.npz")
    save_langid(path, model)

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and more words here"),
            # mixed-script text: confidently neither class → low confidence
            (1, "the мир quick это brown на dog языке fox сегодня и the и на"),
        ],
        "doc_id long, text string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        langid_model_path=path, keep_langs=("eng",), min_lang_conf=0.7,
        chunk_size=4096,
    )
    res = curate(docs, cfg)
    kept = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    assert 0 in kept
    # without the confidence gate the mixed doc may pass; with it the
    # ambiguous prediction is dropped whichever argmax it lands on
    cfg2 = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        langid_model_path=path, keep_langs=("eng", "rus"), min_lang_conf=0.6,
        chunk_size=4096,
    )
    res2 = curate(docs, cfg2)
    kept2 = {r["doc_id"] for r in res2.chunks.collect()}
    res2.unpersist()
    assert 1 not in kept2 and 0 in kept2


def test_curate_min_lang_conf_validates_at_start(spark):
    import pytest

    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="min_lang_conf"):
        curate(docs, CurationConfig(min_lang_conf=1.5, langid_model_path="m"))
    with pytest.raises(ValueError, match="langid_model_path"):
        curate(docs, CurationConfig(min_lang_conf=0.5))


def test_curate_line_dedup_stage(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    footer = "copyright example site all rights reserved worldwide"
    docs = spark.createDataFrame(
        [
            (0, f"unique alpha content line\n{footer}", "en"),
            (1, f"{footer}\ndifferent beta tail line here", "en"),
            (2, footer, "en"),  # strips to '' → dropped by the stage
            (3, "untouched gamma document with one line", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        dedup_lines_min_chars=30, chunk_size=4096,
    )
    res = curate(docs, cfg)
    chunks = {r["doc_id"]: r["chunk_text"] for r in res.chunks.collect()}
    res.unpersist()
    assert res.funnel["after_line_dedup"] == 3  # doc 2 stripped to ''
    assert chunks[0] == f"unique alpha content line\n{footer}"  # keeper
    assert chunks[1] == "different beta tail line here"
    assert 2 not in chunks
    assert chunks[3] == "untouched gamma document with one line"


def test_curate_line_dedup_validates_at_start(spark):
    import pytest

    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [(0, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="dedup_lines_min_chars"):
        curate(docs, CurationConfig(dedup_lines_min_chars=-1))
    collided = docs.withColumn("__pd_id", docs.doc_id)
    with pytest.raises(ValueError, match="__pd_id"):
        curate(collided, CurationConfig(dedup_lines_min_chars=30))


def test_curate_near_dup_keep_by(spark):
    """Quality-aware near-dup keeper: the cluster keeps its best-scoring
    member, not the minimum id."""
    from vectrekker_spark.curation import CurationConfig, curate

    base = "spark shuffles the narrow stream of tokens across the cluster"
    docs = spark.createDataFrame(
        [
            (1, base + " one", "en", 0.2),
            (2, base + " two", "en", 0.9),   # best — must survive
            (9, "completely different words about database optimizers", "en", 0.5),
        ],
        "doc_id long, text string, lang string, score double",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.7, embed=False,
        near_dup_keep_by="score", chunk_size=4096,
    )
    res = curate(docs, cfg)
    kept = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    assert kept == {2, 9}
    # and the validation fires at run start for a missing column
    import pytest

    with pytest.raises(ValueError, match="near_dup_keep_by"):
        curate(docs.drop("score"), cfg)


def test_curate_token_budget_stage(spark):
    from vectrekker_spark.curation import CurationConfig, curate

    mk = lambda k: " ".join(f"unique{k} word{i}" for i in range(20))  # noqa: E731
    docs = spark.createDataFrame(
        [(i, mk(i), "en", "a.com") for i in range(6)]
        + [(10, mk(10), "en", "b.org")],
        "doc_id long, text string, lang string, source string",
    )
    cfg = CurationConfig(
        min_quality=0.0, near_dup_threshold=0.99, embed=False,
        max_tokens_per_stratum=100, chunk_size=8192,
    )
    res = curate(docs, cfg)
    funnel = dict(res.funnel)
    kept = {r["doc_id"] for r in res.chunks.collect()}
    res.unpersist()
    # each doc is 40 whitespace tokens; budget 100 → the fitting prefix
    # admits 2 docs per stratum (0+40 and 40+40 fit; 80+40 > 100 skips)
    assert funnel["after_token_budget"] == 3  # 2 from a.com + 1 from b.org
    assert 10 in kept and len(kept) == 3
    # run-START validation: missing stratum column
    import pytest

    with pytest.raises(ValueError, match="max_tokens_per_stratum"):
        curate(docs.drop("source"), cfg)
    with pytest.raises(ValueError, match="max_tokens_per_stratum"):
        curate(docs, CurationConfig(max_tokens_per_stratum=-1))


def test_token_budget_only_config_ignores_doc_cap_reserved_cols(spark):
    """Review regression (r14s3): the doc-cap validation block was briefly
    nested under the token-budget flag — a token-budget-only config must
    NOT enforce the doc cap's '__rn' reservation, and a doc-cap-only
    config must still fail fast on a missing stratum column."""
    from vectrekker_spark.curation import CurationConfig, curate

    docs = spark.createDataFrame(
        [(i, f"some unique words {i} here today", "en", "a.com", i)
         for i in range(3)],
        "doc_id long, text string, lang string, source string, __rn long",
    )
    cfg = CurationConfig(
        min_quality=0.0, embed=False, max_tokens_per_stratum=1000,
        chunk_size=8192,
    )
    res = curate(docs, cfg)  # __rn present: fine for the token budget
    assert res.funnel["after_token_budget"] == 3
    res.unpersist()
    import pytest

    with pytest.raises(ValueError, match="max_docs_per_stratum"):
        curate(
            docs.drop("source", "__rn"),
            CurationConfig(min_quality=0.0, embed=False,
                           max_docs_per_stratum=5),
        )


def test_unpersist_releases_localcheckpoint_blocks(spark):
    # advisor r14: DataFrame.unpersist() is a cache-manager no-op for a
    # localCheckpoint'd frame — CurationResult.unpersist() must release
    # the checkpointed RDD blocks explicitly or repeated curate() calls
    # pin executor storage for the session
    rows = [
        (0, GOOD_EN, "en"),
        (1, GOOD_EN, "en"),
        (2, NEAR, "en"),
        (3, GOOD_DE, "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    res = curate(docs, CurationConfig(chunk_size=60, chunk_overlap=10))
    assert res.checkpoints, "near-dup waist should be checkpointed in local mode"
    res.chunks.count()

    def stored_ids():
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {i.id() for i in infos}

    ck_ids = set()
    for df in res.checkpoints:
        try:
            ck_ids.add(df._jdf.queryExecution().analyzed().rdd().id())
        except Exception:  # noqa: BLE001
            pass
    assert ck_ids and ck_ids <= stored_ids(), "checkpoint blocks should be live"
    res.unpersist()
    assert not (ck_ids & stored_ids()), "unpersist must free checkpoint blocks"
