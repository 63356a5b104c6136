"""Perceptual image near-dup tests (operators/imagedup, r12): dHash over
the micro-decoders + pigeonhole-banded Hamming join. Oracles: a numpy
brute-force O(n²) pair scan (recall is EXACT by pigeonhole, so the banded
pipeline must match it bit-for-bit) and a DuckDB mirror of the band/
popcount SQL semantics on negative BIGINT hashes."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from vectrekker_spark.functions import webpcodec as wc
from vectrekker_spark.functions.bmpcodec import encode_bmp
from vectrekker_spark.functions.imagecodec import encode_png
from vectrekker_spark.functions.jpegcodec import encode_jpeg
from vectrekker_spark.operators.imagedup import (
    dhash_bits,
    dhash_dedup_pairs,
    image_dhash,
    image_near_dedup,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


def _gradient_img(seed, h=40, w=48):
    rng = _rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    a, b, c = rng.randint(1, 7, 3)
    base = (a * yy + b * xx + c * ((yy * xx) // 16)) % 256
    return np.stack([base, (base * 2) % 256, 255 - base], axis=2).astype(np.uint8)


def test_dhash_invariant_across_lossless_formats_and_brightness():
    img = _gradient_img(3)
    h_png = dhash_bits(img)
    # lossless containers carry the same pixels → identical hash
    from vectrekker_spark.functions.imagecodec import decode_image_array

    for enc in (encode_png(img), encode_bmp(img), wc.encode_webp(img)):
        assert dhash_bits(decode_image_array(enc)) == h_png
    # uniform brightness shift preserves every gradient sign → identical
    brighter = np.clip(img.astype(np.int32) + 25, 0, 255).astype(np.uint8)
    assert dhash_bits(brighter) == h_png
    # JPEG recompression moves only a few bits
    jpeg = decode_image_array(encode_jpeg(img, quality=85))
    d = bin((dhash_bits(jpeg) ^ h_png) & ((1 << 64) - 1)).count("1")
    assert d <= 6, d
    # a different image is far away
    other = _gradient_img(11)
    d2 = bin((dhash_bits(other) ^ h_png) & ((1 << 64) - 1)).count("1")
    assert d2 > 10, d2


def _brute_pairs(hashes, max_hamming):
    out = set()
    items = [(i, h) for i, h in hashes if h is not None]
    for a in range(len(items)):
        for b in range(a + 1, len(items)):
            (i, hi), (j, hj) = items[a], items[b]
            d = bin((hi ^ hj) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.add((min(i, j), max(i, j), d))
    return out


def _random_hashes(rng, n, planted=8):
    """Random signed-64 hashes with planted near pairs (few-bit flips)."""
    hashes = []
    for i in range(n):
        if i >= 2 and i < 2 + planted:
            base = hashes[rng.randint(0, i - 1)][1]
            flips = rng.choice(64, size=rng.randint(0, 7), replace=False)
            # flip in the UNSIGNED domain: xor-ing bit 63 of a signed
            # Python int escapes the int64 range (infinite two's
            # complement)
            v = (base if base is not None else 0) & ((1 << 64) - 1)
            for f in flips:
                v ^= 1 << int(f)
        elif rng.rand() < 0.05:
            hashes.append((i, None))
            continue
        else:
            v = int(rng.randint(0, 2**32)) << 32 | int(rng.randint(0, 2**32))
        v = v - (1 << 64) if v >= (1 << 63) else v
        hashes.append((i, v))
    return hashes


def test_banded_pairs_match_brute_force_exactly(spark):
    rng = _rng(13)
    for trial, mh in [(0, 4), (1, 6), (2, 10), (3, 0)]:
        hashes = _random_hashes(rng, 60)
        df = spark.createDataFrame(hashes, "media_id long, dhash long")
        got = {
            (r.l_id, r.r_id, r.hamming)
            for r in dhash_dedup_pairs(df, max_hamming=mh).collect()
        }
        assert got == _brute_pairs(hashes, mh), (trial, mh)


def test_duckdb_mirror_band_and_popcount_semantics(spark):
    """The band-extraction (arithmetic shift + mask) and popcount verify
    must be engine-portable: the same SQL in DuckDB over the same hashes
    (incl. negative ones — bit 63 set) yields the same pair set."""
    rng = _rng(29)
    hashes = [(i, h) for i, h in _random_hashes(rng, 50) if h is not None]
    mh, bands = 6, 8
    width, mask = 64 // bands, (1 << (64 // bands)) - 1
    df = spark.createDataFrame(hashes, "media_id long, dhash long")
    got = sorted(
        (r.l_id, r.r_id, r.hamming)
        for r in dhash_dedup_pairs(df, max_hamming=mh, bands=bands).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE h (media_id BIGINT, dhash BIGINT)"
    )
    con.executemany("INSERT INTO h VALUES (?, ?)", hashes)
    bands_sql = " UNION ALL ".join(
        f"SELECT media_id, dhash, {b} AS band_idx, "
        f"(dhash >> {b * width}) & {mask} AS band_val FROM h"
        for b in range(bands)
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH banded AS ({bands_sql}),
            cand AS (
              SELECT DISTINCT l.media_id AS l_id, r.media_id AS r_id,
                     l.dhash AS lh, r.dhash AS rh
              FROM banded l JOIN banded r
                ON l.band_idx = r.band_idx AND l.band_val = r.band_val
               AND l.media_id < r.media_id
            )
            SELECT l_id, r_id, bit_count(xor(lh, rh)) AS hamming
            FROM cand WHERE bit_count(xor(lh, rh)) <= {mh}
            ORDER BY l_id, r_id
            """
        ).fetchall()
    )
    con.close()
    assert got == want


def test_image_near_dedup_end_to_end(spark):
    img = _gradient_img(5)
    near = np.clip(img.astype(np.int32) + 30, 0, 255).astype(np.uint8)  # same hash
    other = _gradient_img(17)
    rows = [
        (1, encode_png(img)),
        (2, wc.encode_webp(near)),       # near-dup of 1 across formats
        (3, encode_png(other)),          # distinct
        (4, b"not an image at all"),     # undecodable → survives
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert hashes[4] is None and hashes[1] is not None
    kept = sorted(r.media_id for r in image_near_dedup(df, max_hamming=6).collect())
    assert kept == [1, 3, 4]


def test_banded_join_plan_has_no_cartesian(spark):
    rng = _rng(31)
    df = spark.createDataFrame(
        [(i, h) for i, h in _random_hashes(rng, 40)], "media_id long, dhash long"
    )
    plan = dhash_dedup_pairs(df, max_hamming=6)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bands_validation():
    from vectrekker_spark.operators.imagedup import _band_exprs

    with pytest.raises(ValueError, match="bands"):
        _band_exprs("dhash", 3)


def test_max_hamming_validation(spark):
    df = spark.createDataFrame([(1, 5)], "media_id long, dhash long")
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_dedup_pairs(df, max_hamming=64)


def test_image_dhash_keeps_caller_id_name_and_type(spark):
    img = _gradient_img(7)
    df = spark.createDataFrame(
        [("a", encode_png(img))], "img_key string, content binary"
    )
    out = image_dhash(df, id_col="img_key")
    assert out.columns == ["img_key", "dhash"]
    row = out.collect()[0]
    assert row.img_key == "a" and row.dhash is not None


def test_dhash_dup_against_matches_brute_force(spark):
    from vectrekker_spark.operators.imagedup import (
        dhash_band_index,
        dhash_dup_against,
    )

    rng = _rng(37)
    corpus = [(i, h) for i, h in _random_hashes(rng, 40) if h is not None]
    new = _random_hashes(rng, 20)
    # plant guaranteed cross-corpus near-dups
    new += [(100, corpus[0][1]), (101, corpus[3][1] ^ 0b111)]
    mh = 6
    cdf = spark.createDataFrame(corpus, "media_id long, dhash long")
    ndf = spark.createDataFrame(new, "media_id long, dhash long")
    got = {
        (r.new_id, r.dup_id, r.hamming)
        for r in dhash_dup_against(
            ndf, dhash_band_index(cdf), max_hamming=mh
        ).collect()
    }
    want = set()
    for ni, nh in new:
        if nh is None:
            continue
        for ci, ch in corpus:
            d = bin((nh ^ ch) & ((1 << 64) - 1)).count("1")
            if d <= mh:
                want.add((ni, ci, d))
    assert got == want and any(x[0] == 100 for x in got)


def test_streaming_image_dedup_lifecycle(spark, tmp_path):
    """ST7's image twin end-to-end: in-batch perceptual dedup, the
    persisted band index as the history check, NULL-hash survival,
    at-least-once redelivery idempotence, and the shape-generic compact."""
    from vectrekker_spark.streaming.jobs import (
        compact_near_dedup_corpus,
        foreach_batch_image_dedup,
    )

    a, b, c = _gradient_img(2), _gradient_img(21), _gradient_img(22)
    a_bright = np.clip(a.astype(np.int32) + 20, 0, 255).astype(np.uint8)
    src = tmp_path / "src"
    corpus = str(tmp_path / "corpus")
    schema = "media_id long, content binary"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )

    def run(ck="ck", only=None):
        stream = spark.readStream.schema(schema).parquet(
            str(src / (only or "*"))
        )
        foreach_batch_image_dedup(
            stream, corpus, str(tmp_path / ck), max_hamming=6
        ).awaitTermination()

    def kept_ids():
        return sorted(
            r.media_id
            for r in spark.read.parquet(f"{corpus}/docs").collect()
        )

    # batch 1: id 2 is a brightness near-dup of 1 (same dHash) -> in-batch
    # dedup keeps 1; id 3 undecodable -> survives with no band rows
    write_batch("b1", [(1, encode_png(a)), (2, wc.encode_webp(a_bright)),
                       (3, b"junk bytes")])
    run()
    assert kept_ids() == [1, 3]

    # batch 2: id 4 near-dups HISTORY image 1 (jpeg recompression, <= 6
    # bits) -> dropped via the persisted band index; id 5 novel
    write_batch("b2", [(4, encode_jpeg(a, quality=85)), (5, encode_png(b))])
    run()
    assert kept_ids() == [1, 3, 5]

    # same checkpoint, nothing new: no reprocessing
    run()
    assert kept_ids() == [1, 3, 5]

    # redelivery of batch 2 via a FRESH checkpoint: scorable row 5 meets
    # its appended twin at hamming 0 and drops; 4 still duplicates 1
    run(ck="ck_re", only="b2")
    assert kept_ids() == [1, 3, 5]

    # batch 3 novel + an exact pixel dup of history image b
    write_batch("b3", [(6, encode_png(c)), (7, encode_bmp(b))])
    run()
    assert kept_ids() == [1, 3, 5, 6]

    # redeliver b1: the undecodable id 3 re-appends (no content key) —
    # the documented window the compact reclaims
    run(ck="ck_re2", only="b1")
    assert kept_ids() == [1, 3, 3, 5, 6]
    rep = compact_near_dedup_corpus(spark, corpus, id_col="media_id")
    assert rep["docs_removed"] == 1
    assert kept_ids() == [1, 3, 5, 6]


def test_streaming_image_dedup_guards(spark, tmp_path):
    """Review r12 regressions: (a) builder validation fails at CALL time,
    not inside the first micro-batch; (b) a torn FIRST bands append
    (_temporary only) reads as absent instead of wedging redelivery on
    schema inference; (c) a restart with a different band count is
    refused (the persisted band_vals bake the width in)."""
    from pyspark.sql.streaming import StreamingQueryException

    from vectrekker_spark.streaming.jobs import foreach_batch_image_dedup

    src = tmp_path / "src"
    corpus = str(tmp_path / "corpus")
    schema = "media_id long, content binary"
    spark.createDataFrame(
        [(1, encode_png(_gradient_img(2)))], schema
    ).coalesce(1).write.parquet(str(src / "b1"))

    def start(ck, **kw):
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        return foreach_batch_image_dedup(
            stream, corpus, str(tmp_path / ck), **kw
        )

    # (a) misconfiguration surfaces before any query starts
    with pytest.raises(ValueError, match="bands"):
        start("ck_bad", max_hamming=10, bands=8)
    with pytest.raises(ValueError, match="divide"):
        start("ck_bad2", max_hamming=2, bands=12)

    # (b) torn first bands append: only _temporary inside
    import os

    os.makedirs(f"{corpus}/bands/_temporary")
    start("ck1", max_hamming=6).awaitTermination()
    assert [r.media_id for r in spark.read.parquet(f"{corpus}/docs").collect()] == [1]

    # (c) a restart with different bands is refused loudly
    spark.createDataFrame(
        [(2, encode_png(_gradient_img(9)))], schema
    ).coalesce(1).write.parquet(str(src / "b2"))
    with pytest.raises(StreamingQueryException, match="bands="):
        start("ck2", max_hamming=6, bands=16).awaitTermination()
    # and the original geometry still works
    start("ck3", max_hamming=6, bands=8).awaitTermination()
    kept = sorted(r.media_id for r in spark.read.parquet(f"{corpus}/docs").collect())
    assert kept == [1, 2]

    # (d) a torn/garbage bands_meta.json is a LOUD error naming the
    # remediation, not a bare JSONDecodeError every micro-batch
    # (advice r12: the write is temp+os.replace, so this state can only
    # arise from external corruption — but the read must still classify)
    with open(f"{corpus}/bands_meta.json", "w") as f:
        f.write("{\"bands\": ")  # torn mid-write shape
    spark.createDataFrame(
        [(9, encode_png(_gradient_img(5)))], schema
    ).coalesce(1).write.parquet(str(src / "b3"))
    with pytest.raises(StreamingQueryException, match="delete it to re-pin"):
        start("ck4", max_hamming=6, bands=8).awaitTermination()
    # operator follows the remediation: delete → re-pin → stream resumes
    os.remove(f"{corpus}/bands_meta.json")
    start("ck5", max_hamming=6, bands=8).awaitTermination()
    assert 9 in {r.media_id for r in spark.read.parquet(f"{corpus}/docs").collect()}


def test_dup_against_broadcasts_the_batch_side(spark):
    """The incremental form's contract is 'history never shuffles': the
    batch side must be broadcast (hinted, review r12 — a plan, not a
    hope)."""
    from vectrekker_spark.operators.imagedup import (
        dhash_band_index,
        dhash_dup_against,
    )

    rng = _rng(41)
    corpus = spark.createDataFrame(
        [(i, h) for i, h in _random_hashes(rng, 30) if h is not None],
        "media_id long, dhash long",
    )
    new = spark.createDataFrame(
        [(i, h) for i, h in _random_hashes(rng, 10) if h is not None],
        "media_id long, dhash long",
    )
    plan = (
        dhash_dup_against(new, dhash_band_index(corpus), max_hamming=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # advice r12: a large backfill batch must be able to opt OUT of the
    # broadcast (same results, no explicit broadcast hint in the plan)
    hinted = dhash_dup_against(new, dhash_band_index(corpus), max_hamming=6)
    shuffled = dhash_dup_against(
        new, dhash_band_index(corpus), max_hamming=6, broadcast_new=False
    )
    analyzed = shuffled._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert {tuple(r) for r in shuffled.collect()} == {
        tuple(r) for r in hinted.collect()
    }


def _natural_img(seed, h=64, w=64):
    """Sum-of-low-frequency-sinusoids content — a non-degenerate DCT
    block (synthetic ramps put the whole block at ~0 = the median, where
    threshold bits are noise; see phash_bits docstring)."""
    rng = _rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    a, b, c = rng.uniform(5, 14, 3)
    base = (
        128 + 60 * np.sin(yy / a) + 50 * np.cos(xx / b) + 30 * np.sin((yy + xx) / c)
    ).clip(0, 255)
    return np.stack([base, base * 0.8, base * 0.6], axis=2).astype(np.uint8)


def test_phash_survives_recompression_where_it_matters():
    from vectrekker_spark.functions.imagecodec import decode_image_array
    from vectrekker_spark.operators.imagedup import phash_bits

    img = _natural_img(5)
    h0 = phash_bits(img)
    for q, bound in ((85, 8), (60, 10), (40, 16)):
        j = decode_image_array(encode_jpeg(img, quality=q))
        d = bin((phash_bits(j) ^ h0) & ((1 << 64) - 1)).count("1")
        assert d <= bound, (q, d)
    # brightness shift moves only the DC coefficient — hash stays close
    bright = np.clip(img.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    db = bin((phash_bits(bright) ^ h0) & ((1 << 64) - 1)).count("1")
    assert db <= 6, db
    # a different natural image is far away
    other = _natural_img(11)
    d2 = bin((phash_bits(other) ^ h0) & ((1 << 64) - 1)).count("1")
    assert d2 > 16, d2


def test_image_phash_operator_and_banded_reuse(spark):
    """The pair machinery is hash-agnostic: the same banded join dedups
    on phash via hash_col — one operator family, two hash kernels."""
    from vectrekker_spark.operators.imagedup import image_phash

    img = _natural_img(7)
    recompressed = encode_jpeg(img, quality=50)
    rows = [
        (1, encode_png(img)),
        (2, recompressed),            # same content, heavy recompression
        (3, encode_png(_natural_img(13))),
        (4, b"undecodable"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = image_phash(df)
    assert hashes.columns == ["media_id", "phash"]
    got = {r.media_id: r.phash for r in hashes.collect()}
    assert got[4] is None
    pairs = dhash_dedup_pairs(
        hashes, max_hamming=10, hash_col="phash"
    ).collect()
    assert {(p.l_id, p.r_id) for p in pairs} == {(1, 2)}

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
