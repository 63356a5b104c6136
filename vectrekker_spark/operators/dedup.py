"""Deduplication operators for LLM-corpus curation (SURVEY.md §2.2 L1/L2 +
north-star additions): exact, MinHash-LSH, SimHash, n-gram Jaccard.

All deterministic and (except LSH banding's pair search) expressible in plain
SQL, so the DuckDB oracle can check them. Scale notes per operator below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectrekker_spark.functions.text import char_shingles, token_hash32, tokens, word_shingles

# Fixed-seed affine permutations h_i(x) = (a·x + b) mod P over 32-bit token
# hashes. a < 2^30 keeps a·x < 2^62 (no BIGINT overflow in either engine).
MINHASH_P = 2_147_483_647

# Per-task cap on the shingle-hash memo (same idiom as queries/vector.py's
# _TOKEN_CACHE): ~64 MB worst case; zipfian shingle vocab means the hot
# entries are cached long before the cap.
_SHINGLE_CACHE_MAX = 1 << 20
MINHASH_PERMS: list[tuple[int, int]] = [
    (387420489, 12345), (268435399, 54321), (536870909, 98765), (100000007, 11111),
    (715827883, 22222), (999999937, 33333), (805306457, 44444), (611686087, 55555),
    (429496729, 66666), (322122547, 77777), (214748357, 88888), (165580141, 99999),
    (131071017, 13579), (104729897, 24680), (982451653, 86420), (472882049, 97531),
]


def exact_dedup_map(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one row per distinct text with the keeper
    (min id) and the duplicate count. A single hash-shuffle on md5(text);
    at 100 TB, group keys are 32-byte digests, never the text itself.

    NULL text is NOT duplicate content: each null-text row gets a per-row
    sentinel key ('__null__<id>') so it survives as its own group instead of
    all null rows collapsing into one "duplicate" cluster (md5(NULL) is NULL,
    and a plain GROUP BY would merge them — real corpora do carry nulls).
    The q25 oracle mirrors the same COALESCE.
    """
    key = F.coalesce(
        F.md5(F.col(text_col)),
        F.concat(F.lit("__null__"), F.col(id_col).cast("string")),
    )
    return (
        df.groupBy(key.alias("content_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature rows (id, perm, minhash).

    Arrow kernel: shingle (word k-gram, distinct, lowercased) → md5-prefix
    32-bit hash (memoized — the distinct-shingle vocabulary is far smaller
    than the shingle stream) → all 16 affine permutations vectorized as one
    numpy broadcast → per-perm minima. Per-batch Python, no shuffle, no
    per-shingle expression work; values identical to the declarative form
    (which used explode + 16 codegen MIN aggs — see git history) and to the
    DuckDB oracle.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from vectrekker_spark.functions.pytokens import java_tokens

    A = np.array([a for a, _ in MINHASH_PERMS], dtype=np.int64)[:, None]
    B = np.array([b for _, b in MINHASH_PERMS], dtype=np.int64)[:, None]
    n_perms = len(MINHASH_PERMS)

    cache_max = _SHINGLE_CACHE_MAX  # bound at build time (tests shrink it)

    def gen(batches):
        # memo lives for one task; bounded so a high-cardinality corpus
        # (all-unique shingles) can't grow it without limit — past the cap
        # new shingles hash uncached, values unchanged
        cache: dict[str, int] = {}

        def shash(s: str) -> int:
            h = cache.get(s)
            if h is None:
                h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
                if len(cache) < cache_max:
                    cache[s] = h
            return h

        for pdf in batches:
            ids, perms, mins = [], [], []
            for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if text is None:
                    # null text has no shingles → no signature rows → never
                    # a near-dup candidate (matches exact_dedup_map's
                    # null-is-not-duplicate-content rule)
                    continue
                # java_tokens ≡ word_shingles' tokens()/the RE2 oracle
                # split — NOT Python/re Unicode \s (functions/pytokens);
                # n < k (incl. empty text) folds to the single all-token
                # join below, matching word_shingles' guard
                toks = java_tokens(text.lower())
                n = len(toks)
                upper = max(n - shingle_words, 0)
                shingles = {
                    " ".join(toks[i : i + shingle_words]) for i in range(upper + 1)
                }
                hs = np.fromiter(
                    (shash(s) for s in shingles), dtype=np.int64, count=len(shingles)
                )
                sig = ((A * hs + B) % MINHASH_P).min(axis=1)
                ids.extend([doc_id] * n_perms)
                perms.extend(range(n_perms))
                mins.extend(sig.tolist())
            yield pd.DataFrame({"doc_id": ids, "perm": perms, "minhash": mins})

    id_t = dict(df.dtypes)[id_col]
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema=f"{id_col} {id_t}, perm int, minhash long"
    )


def band_hashes(
    sig_rows: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
) -> DataFrame:
    """Signature rows → (id, band, band_hash): md5 of each band's
    positionally-ordered minhash slice. This is the persistable LSH index
    surface — an incremental pipeline stores this table for the corpus and
    joins each new batch against it (minhash_dedup_against).
    """
    n_perms = len(MINHASH_PERMS)
    # validate the geometry: bands > n_perms made rows_per_band 0, and
    # perm/0 is NULL under the session's non-ANSI division — every perm
    # silently collapsed into one band and LSH degenerated to
    # exact-signature equality; a non-divisor left a 1-perm spillover
    # band that floods the candidate join (r14s3 review)
    if not 1 <= bands <= n_perms:
        raise ValueError(
            f"bands must be in [1, {n_perms}] (the signature length), "
            f"got {bands}"
        )
    if n_perms % bands != 0:
        raise ValueError(
            f"bands={bands} does not divide the signature length "
            f"{n_perms} — the spillover band would be a 1-perm bucket"
        )
    rows_per_band = n_perms // bands
    # Band key must be the POSITIONAL signature slice: collect (perm, minhash)
    # structs and sort by perm, so (a,b) on perms (0,1) never collides with
    # (b,a) — a multiset key would admit invalid LSH collisions.
    # collect_SET, not list: rows replicated upstream (content-derived ids
    # give exact-duplicate docs the same id, so their signature rows
    # arrive twice) would otherwise double every value in the band key
    # ('m0,m0,m1,m1') and the doc would never bucket with normally-signed
    # near-duplicates (r14s3 review)
    return (
        sig_rows.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_set(F.struct("perm", "minhash"))),
                        lambda s: s.getField("minhash").cast("string"),
                    ),
                )
            ).alias("band_hash")
        )
    )


def _pairs_from_bands(banded: DataFrame, id_col: str) -> DataFrame:
    l = banded.select(F.col(id_col).alias("l_id"), "band", "band_hash")
    r = banded.select(F.col(id_col).alias("r_id"), "band", "band_hash")
    return (
        l.join(r, ["band", "band_hash"])
        .filter(F.col("l_id") < F.col("r_id"))
        .select("l_id", "r_id")
        .distinct()
    )


def lsh_candidate_pairs(
    sig_rows: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any band hash become candidate pairs.

    Signature rows → band hash → self-join on (band, hash). The join is on
    the band bucket — the classic sub-quadratic near-dup search; only
    same-bucket docs ever meet. Returns distinct (l_id, r_id) with l < r.
    """
    return _pairs_from_bands(band_hashes(sig_rows, id_col=id_col, bands=bands), id_col)


def _verify_jaccard(
    cands: DataFrame,
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    l_key: str,
    r_key: str,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (l_key, r_key) pairs: join the
    TEXT columns through the candidate spine and shingle AFTER the joins, so
    shingle arrays are computed only for actual candidates — a corpus with
    zero candidates pays zero shingle work (the old shape pre-projected
    shingles below the join, shingling every streamed row per consumer, and
    shuffled the ~3x-larger overlapping-gram arrays instead of the text).
    A doc appearing in k candidate pairs re-shingles k times — candidate
    counts are band-collision-bounded, so that stays duplicate-proportional."""
    l = left.select(F.col(id_col).alias(l_key), F.col(text_col).alias("__l_text"))
    r = right.select(F.col(id_col).alias(r_key), F.col(text_col).alias("__r_text"))
    inter = F.size(F.array_intersect("__l_sh", "__r_sh"))
    union = F.size("__l_sh") + F.size("__r_sh") - inter
    return (
        cands.join(l, l_key)
        .join(r, r_key)
        .withColumn("__l_sh", word_shingles(F.col("__l_text")))
        .withColumn("__r_sh", word_shingles(F.col("__r_text")))
        .withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select(l_key, r_key, "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands_df: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash near-dup pipeline: LSH candidates, then exact Jaccard
    verification on the candidate pairs only. Returns (l_id, r_id, jaccard).

    Pass ``bands_df`` (a band_hashes() table for ``df``, e.g. one the caller
    already computed and persisted for an index append) to skip the
    signature kernel entirely — the streaming ingest path signs each
    micro-batch exactly once this way."""
    if bands_df is None:
        bands_df = band_hashes(
            minhash_signatures(df, text_col=text_col, id_col=id_col),
            id_col=id_col,
        )
    cands = _pairs_from_bands(bands_df, id_col)
    return _verify_jaccard(
        cands, df, df, threshold, text_col, id_col, "l_id", "r_id"
    )


def minhash_dedup_against(
    new: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_bands: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dedup: which NEW docs near-duplicate an EXISTING
    corpus doc. The cross-corpus variant of minhash_dedup_pairs — the shape
    every incremental ingestion run needs (dedup the day's batch against
    100 TB of history without re-pairing history against itself).

    Pass ``corpus_bands`` (a persisted band_hashes() table for the corpus)
    to skip re-signaturing history, and ``new_bands`` (a band_hashes()
    table for ``new``) to skip signing the batch here too — the streaming
    ingest path signs each micro-batch exactly once and reuses the bands
    across in-batch dedup, this check, and the index append. With both
    passed the whole plan is Python-free: one band-bucket join against the
    index + exact Jaccard verification with shingles computed only for
    candidate rows (post-join — see _verify_jaccard; the corpus (id, text)
    scan to fetch candidate texts remains, which an id-bucketed docs table
    turns into a pruned lookup at scale). Returns
    (new_id, corpus_id, jaccard) for pairs at/above threshold; anti-join
    `new` on new_id to keep only novel documents.
    """
    if new_bands is None:
        new_bands = band_hashes(
            minhash_signatures(new, text_col=text_col, id_col=id_col),
            id_col=id_col,
        )
    nb = new_bands.select(F.col(id_col).alias("new_id"), "band", "band_hash")
    if corpus_bands is None:
        corpus_bands = band_hashes(
            minhash_signatures(corpus, text_col=text_col, id_col=id_col),
            id_col=id_col,
        )
    cb = corpus_bands.select(F.col(id_col).alias("corpus_id"), "band", "band_hash")
    cands = (
        nb.join(cb, ["band", "band_hash"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    return _verify_jaccard(
        cands, new, corpus, threshold, text_col, id_col, "new_id", "corpus_id"
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash per document (id, simhash).

    Token multiset → 16-bit token hash → per-bit signed vote → sign bit.

    r15 optimization (guide §2.3 taken to zero-shuffle + §4.2, the d23
    repetition precedent): SimHash is purely PER-DOCUMENT state, so the
    explode → groupBy(id) shape paid one md5 per token OCCURRENCE in
    interpreted expression code plus a corpus-wide hash exchange for
    row-local work. Now one Arrow kernel per row tokenizes with the exact
    ``java_tokens`` twin of ``tokens()`` (boundary ``''`` tokens included),
    hashes each DISTINCT token once per task (md5-prefix memo, bounded —
    the zipfian vocabulary makes the memo hit rate high), weights the ±1
    bit votes by the occurrence count, and packs the sign bits. All
    integer arithmetic — bit-identical to the exploded form by
    construction (property-pinned in tests/test_dedup.py against
    ``simhash16_exploded``) and to the DuckDB oracle (d02). Plan: scan →
    MapInPandas, ZERO shuffles (was 1 corpus-tokens exchange).

    Contract: ids must be unique (one row per document — the
    ``bm25_scores_pivot``/``repetition_report`` PRIMARY KEY contract).
    Duplicate ids hash per ROW here, where the exploded form merged their
    token votes per id; ``simhash16_exploded`` keeps the merging shape.
    Docs with no tokens (NULL/empty/whitespace-only text) emit no row,
    exactly like explode on an empty array."""
    import hashlib

    import numpy as np
    import pandas as pd

    from vectrekker_spark.functions.pytokens import java_tokens

    cache_max = _SHINGLE_CACHE_MAX  # bound at build time (tests shrink it)
    bit_range = np.arange(16, dtype=np.int64)

    def gen(batches):
        from collections import Counter

        cache: dict[str, int] = {}

        def thash(t: str) -> int:
            h = cache.get(t)
            if h is None:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % 65536
                if len(cache) < cache_max:
                    cache[t] = h
            return h

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                if text is None:
                    continue  # no tokens → no row (explode-on-NULL rule)
                toks = java_tokens(text)
                if not toks:
                    continue  # empty/ws-only text → no row
                counts = Counter(thash(t) for t in toks)
                hs = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
                cs = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
                bits = (hs[:, None] >> bit_range) & 1  # (distinct, 16) 0/1
                votes = (np.where(bits == 1, cs[:, None], -cs[:, None])).sum(axis=0)
                ids.append(doc_id)
                hashes.append(int(((votes > 0).astype(np.int64) << bit_range).sum()))
            out = pd.DataFrame({id_col: ids, "simhash": hashes})
            yield out.astype({"simhash": "int64"})

    id_t = dict(df.dtypes)[id_col]
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        gen, schema=f"{id_col} {id_t}, simhash bigint"
    )


def simhash16_exploded(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The declarative explode → single-groupBy SimHash (the pre-r15
    registered shape): one token explode then ONE groupBy(id) computing all
    16 bit-votes as conditional sums (r7: no ×16 bit-explosion, map-side
    partial agg before the single shuffle). Kept as the equivalence twin
    for ``simhash16``'s kernel — and as the merging-semantics form for
    corpora with duplicate ids."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    ).select(F.col(id_col), (token_hash32(F.col("t")) % 65536).alias("h"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    packed = None
    for j in range(16):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select(F.col(id_col), packed.cast("bigint").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    max_id: int = 40,
    k: int = 5,
    min_jaccard: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact character-k-gram Jaccard over a bounded id range (the brute-force
    baseline the LSH path is verified against). O(n²) by design — cap with
    max_id; the scale path is minhash_dedup_pairs.

    The cap is LOAD-BEARING, not advisory (r7 verdict): max_id bounds the
    broadcast side and the pair count (max_id² candidate pairs, each an
    array-intersect over shingle sets), so values past ~10³ turn the
    baseline into the quadratic blowup it exists to verify against."""
    if max_id > 1000:
        raise ValueError(
            f"ngram_jaccard_pairs is the O(n²) brute-force verification "
            f"baseline; max_id={max_id} exceeds the 1000-doc bound "
            "(max_id² pairs × array_intersect each). Use "
            "minhash_dedup_pairs (LSH banding, sub-quadratic) for real "
            "corpora."
        )
    # NULL text is never a near-dup candidate (the minhash_signatures
    # rule): char_shingles coalesces NULL to [''] and two NULL docs would
    # report jaccard 1.0, poisoning every baseline-vs-LSH comparison on a
    # corpus with NULLs (r14s3 review)
    sh = df.filter(
        (F.col(id_col) < max_id) & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col), char_shingles(F.col(text_col), k=k).alias("sh")
    )
    l = sh.select(F.col(id_col).alias("l_id"), F.col("sh").alias("l_sh"))
    r = sh.select(F.col(id_col).alias("r_id"), F.col("sh").alias("r_sh"))
    inter = F.size(F.array_intersect("l_sh", "r_sh"))
    union = F.size("l_sh") + F.size("r_sh") - inter
    return (
        l.join(F.broadcast(r), F.col("l_id") < F.col("r_id"))
        .withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("l_id", "r_id", "jaccard")
    )


def content_bloom(history, text_col: str = "text", fpp: float = 1e-3,
                  expected: int | None = None, **bloom_kw):
    """BloomFilter over a corpus's raw text (the bloom's own md5-prefix
    family IS a content hash, so no pre-hashing column is needed on either
    side). Sizing counts ROWS, not distinct texts — duplicate rows only
    re-set the same bits, and the over-estimate buys a LOWER effective fpp
    (the safe direction). Null-text rows are skipped (bloom_build drops
    null keys; exact_dedup_against keeps null-text rows unconditionally).
    Grow it per ingested batch with operators.bloom.bloom_add."""
    from vectrekker_spark.operators.bloom import bloom_build

    bf = bloom_build(history, text_col, expected=expected, fpp=fpp, **bloom_kw)
    bf.attrs.update({"kind": "content", "text_col": text_col})
    return bf


def exact_dedup_against(
    new: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    history_bloom=None,
    strategy: str = "auto",
) -> DataFrame:
    """Incremental EXACT dedup: drop rows of ``new`` whose text already
    exists verbatim in ``history`` — the exact-duplicate twin of
    minhash_dedup_against, for the 'dedup today's batch against the corpus'
    ingestion shape. Null-text rows always survive (same rule as
    exact_dedup_map's per-row sentinel: NULL is not duplicate content).

    Without a bloom: one left-anti join of the batch against history's
    distinct md5 digests — correct, but every batch SHUFFLES the history
    key set.

    With ``history_bloom`` (see content_bloom): rows the bloom rejects are
    DEFINITELY new (a Bloom filter has no false negatives) and bypass the
    join; only the maybe-set (true dups + ~fpp of the batch) is verified,
    by broadcasting its distinct digests as a semi-filter over history —
    history is scanned narrowly but never shuffled, and the final
    anti-join sides are both maybe-set-sized. Exactness is preserved under
    ANY bloom state (a saturated filter just routes everything through
    verification — property-tested), so the bloom is purely an
    accelerator.

    Measured honestly (sf1-derived, local[32]): with history keys cheap to
    shuffle the plain join WINS (5M in-memory rows: 1.9 vs 3.7 s on a
    dup-heavy batch); the bloom path pulls ahead for mostly-fresh batches
    over disk-backed history (1.16 vs 1.46 s at 5M) and its advantage is
    the removed history-side SHUFFLE — the regime where that dominates is
    network-bound clusters with 10⁹+ history keys, not a local box. Pair
    with a digest-bucketed history table to prune the remaining scan.

    On the bloom path the probe frame is persisted (three consumers —
    definite-new, maybe, and the broadcast maybe-keys — must not re-run
    md5 + the probe); it rides the result as ``_cached_probe`` so a
    long-lived driver can ``result._cached_probe.unpersist()`` after
    materializing (None on the plain path).
    """
    from vectrekker_spark.operators.bloom import _reserve

    _reserve(new, "__h", "__maybe", what="exact_dedup_against temp columns")
    text = F.col(text_col)
    nulls = new.where(text.isNull())
    hashed = new.where(text.isNotNull()).withColumn("__h", F.md5(text))
    hist_keys = (
        history.where(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col)).alias("__h"))
    )
    if history_bloom is None:
        kept = hashed.join(hist_keys.distinct(), "__h", "left_anti")
    else:
        from vectrekker_spark.operators.bloom import might_contain

        attrs = history_bloom.attrs
        # EMPTY attrs must fail too: a raw bloom_build filter (no
        # provenance) probed here would read 'definitely new' for nearly
        # every duplicate and leak them past verification — exactly the
        # failure this guard's message warns about, previously bypassed
        # by the `attrs and` short-circuit (r14s3 review)
        if (
            attrs.get("kind") != "content" or attrs.get("text_col") != text_col
        ):
            raise ValueError(
                f"history_bloom provenance {attrs!r} does not match a "
                f"content bloom over {text_col!r}: a filter built over "
                f"different keys rejects texts that ARE in history, and "
                f"those rows would skip verification — exact duplicates "
                f"would leak through. Build it with content_bloom(history, "
                f"text_col={text_col!r})."
            )
        flagged = might_contain(
            hashed, text_col, history_bloom, out_col="__maybe", strategy=strategy
        ).persist()  # three consumers below — probe + md5 must run once
        definite_new = flagged.where(~F.col("__maybe"))
        maybe = flagged.where(F.col("__maybe"))
        maybe_keys = maybe.select("__h").distinct()
        hits = hist_keys.join(F.broadcast(maybe_keys), "__h", "left_semi").distinct()
        # hits ⊆ maybe_keys, which this plan already broadcasts — force the
        # same decision here (static stats can't see the bound and would
        # plan a sort-merge join of two maybe-sized sides)
        kept = definite_new.unionByName(
            maybe.join(F.broadcast(hits), "__h", "left_anti")
        )
        kept = kept.drop("__maybe")
    result = kept.drop("__h").unionByName(nulls)
    # the bm25/_cached_base idiom: the persisted probe frame rides the
    # result so a long-lived driver can release it once consumed
    result._cached_probe = flagged if history_bloom is not None else None
    return result
