"""Span-level exact substring dedup (operators/spandedup.py): planted
cross-doc and self-repetition fixtures, a hypothesis property against an
independent brute-force Python oracle, and edge/plan checks."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectrekker_spark.operators.spandedup import (
    duplicate_spans,
    strip_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- independent oracle (plain Python, no Spark) ----------------------------


def brute_spans(docs, n, min_tokens=None):
    """{doc_id: [(start, end)]} redundant spans per the module contract:
    non-corpus-minimal occurrences of duplicated n-grams, merged at gap
    <= n-1, filtered to >= min_tokens covered tokens."""
    min_tokens = n if min_tokens is None else min_tokens
    toks = {
        i: (t or "").lower().split() for i, t in docs.items() if t is not None
    }
    occ: dict[tuple, list] = {}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - n + 1):
            occ.setdefault(tuple(tk[p : p + n]), []).append((i, p))
    flagged: dict[int, list] = {}
    for places in occ.values():
        if len(places) > 1:
            first = min(places)
            for i, p in places:
                if (i, p) != first:
                    flagged.setdefault(i, []).append(p)
    out = {}
    for i, ps in flagged.items():
        ps = sorted(set(ps))
        spans = []
        s = e = ps[0]
        for p in ps[1:]:
            if p - e <= n - 1:
                e = p
            else:
                spans.append((s, e + n - 1))
                s = e = p
        spans.append((s, e + n - 1))
        spans = [(a, b) for a, b in spans if b - a + 1 >= min_tokens]
        if spans:
            out[i] = spans
    return out


def brute_strip(docs, n, min_tokens=None):
    spans = brute_spans(docs, n, min_tokens)
    out = {}
    for i, t in docs.items():
        if t is None:
            out[i] = None
            continue
        tk = t.split()
        cov = set()
        for a, b in spans.get(i, []):
            cov.update(range(a, b + 1))
        out[i] = " ".join(tok for j, tok in enumerate(tk) if j not in cov)
    return out


def _spark_spans(df, **kw):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, **kw).collect()
    }


# --- planted fixtures -------------------------------------------------------

BOILER = "this license text is repeated verbatim across many documents here"


def test_cross_doc_duplicate_span(spark):
    # doc 1 and doc 2 share the 10-token BOILER paragraph; doc 1 (lower id)
    # keeps its copy, doc 2's occurrence is one exact maximal span
    rows = [
        (1, f"alpha beta {BOILER} gamma delta"),
        (2, f"unrelated words surround it {BOILER} and then diverge fully"),
        (3, "a completely different document with no overlap at all"),
    ]
    df = _docs(spark, rows)
    got = _spark_spans(df, n=10)
    # doc 2 tokens: 4 lead-in tokens, BOILER at positions 4..13
    assert got == {(2, 4, 13, 10)}
    cleaned = {
        r["doc_id"]: r["text_clean"]
        for r in strip_duplicate_spans(df, n=10).collect()
    }
    assert cleaned[1] == rows[0][1]  # canonical copy untouched
    assert cleaned[2] == "unrelated words surround it and then diverge fully"
    assert cleaned[3] == rows[2][1]
    assert brute_strip(dict(rows), 10) == cleaned


def test_self_repetition_and_case_insensitivity(spark):
    # "x1..x5" repeated three times: occurrences 2 and 3 are redundant and
    # merge into ONE span (gap n-1); detection ignores case, strip keeps
    # the original casing of the canonical copy
    body = "X1 x2 x3 x4 x5"
    df = _docs(spark, [(7, f"{body} {body.lower()} {body}")])
    got = _spark_spans(df, n=5)
    assert got == {(7, 5, 14, 10)}
    cleaned = strip_duplicate_spans(df, n=5).collect()[0]["text_clean"]
    assert cleaned == body  # original-case canonical copy survives


def test_min_tokens_threshold(spark):
    rows = [
        (1, f"lead {BOILER} tail"),
        (2, f"other intro {BOILER} outro words"),
    ]
    df = _docs(spark, rows)
    assert _spark_spans(df, n=10, min_tokens=11) == set()
    assert len(_spark_spans(df, n=10, min_tokens=10)) == 1


def test_edges_null_short_and_fully_duplicated(spark):
    rows = [
        (1, "one two three four five"),  # = doc 2: fully duplicated
        (2, "one two three four five"),
        (3, "short text"),  # < n tokens: no grams
        (4, None),
        (5, "   "),
    ]
    df = _docs(spark, rows)
    got = _spark_spans(df, n=5)
    assert got == {(2, 0, 4, 5)}
    cleaned = {
        r["doc_id"]: r["text_clean"]
        for r in strip_duplicate_spans(df, n=5).collect()
    }
    assert cleaned == {
        1: "one two three four five",
        2: "",  # entirely redundant → empty training text
        3: "short text",
        4: None,
        5: "",
    }


def test_n_guard():
    with pytest.raises(ValueError, match="n must be >= 2"):
        duplicate_spans(None, n=1)


# --- property: Spark == brute force on random corpora -----------------------

_WORDS = ["aa", "bb", "cc", "dd"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=18),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_spans_match_brute_force(spark, data, n):
    docs = {i: " ".join(ws) for i, ws in enumerate(data)}
    df = _docs(spark, sorted(docs.items()))
    expect = {
        (i, a, b, b - a + 1)
        for i, spans in brute_spans(docs, n).items()
        for a, b in spans
    }
    assert _spark_spans(df, n=n) == expect
    cleaned = {
        r["doc_id"]: r["text_clean"]
        for r in strip_duplicate_spans(df, n=n).collect()
    }
    assert cleaned == brute_strip(docs, n)


# --- plan hygiene -----------------------------------------------------------


def test_plan_no_cartesian_arrow_only_python(spark):
    df = _docs(spark, [(1, BOILER), (2, BOILER)])
    plan = (
        strip_duplicate_spans(df, n=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan
    # the only Python in the plan is the Arrow gram kernel — the strip
    # itself (HOF filter) and the span algebra stay JVM-side
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF


def test_kernel_matches_expression_twin(spark):
    from vectrekker_spark.operators.spandedup import (
        _gram_occurrences,
        _gram_occurrences_expr,
    )

    rows = [
        (1, f"Alpha BETA {BOILER} x  y\tz"),  # case + run-whitespace
        (2, None),
        (3, "  "),
        (4, "short"),
        (5, f"{BOILER} {BOILER}"),
        # ASCII-vs-Unicode whitespace: tokens() is Java split — \xa0 /
        #   / 　 are TOKEN CONTENT, and leading \t / trailing \n
        # produce boundary empty tokens (trim strips only spaces). The
        # kernel must replicate all of it or strip positions misalign.
        (6, f"intro text {BOILER}"),
        (7, f"\tlead {BOILER} tail\n"),
        (8, f"a　b c {BOILER}"),
        (9, f" spaced   out {BOILER} "),
    ]
    df = _docs(spark, rows)
    k = {tuple(r) for r in _gram_occurrences(df, 10, "doc_id", "text").collect()}
    e = {
        tuple(r)
        for r in _gram_occurrences_expr(df, 10, "doc_id", "text").collect()
    }
    assert k == e and k  # identical and non-empty


def test_strip_aligns_on_unicode_whitespace(spark):
    # regression: the kernel once tokenized with Python str.split()
    # (Unicode whitespace) while strip indexes tokens() (Java ASCII \s) —
    # a \xa0 doc had its span positions applied to a shifted token array,
    # deleting a unique token and keeping boilerplate. 'intro\xa0text' is
    # ONE token under the contract, so BOILER sits at positions 1..10.
    df = _docs(
        spark,
        [(1, f"aa bb {BOILER}"), (2, f"intro text {BOILER} zz")],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, n=10).collect()
    }
    assert spans == {(2, 1, 10)}
    cleaned = {
        r["doc_id"]: r["text_clean"]
        for r in strip_duplicate_spans(df, n=10).collect()
    }
    assert cleaned == {1: f"aa bb {BOILER}", 2: "intro text zz"}


def test_cache_lifecycle_and_precomputed_spans(spark):
    from vectrekker_spark.operators.spandedup import release

    df = _docs(spark, [(1, BOILER), (2, f"pre {BOILER} post")])
    spans = duplicate_spans(df, n=10)
    assert spans._cached_grams is not None
    spans.collect()
    assert spans._cached_grams.storageLevel.useMemory
    # strip against the precomputed spans: no new cache handle taken
    stripped = strip_duplicate_spans(df, n=10, spans=spans)
    assert stripped._cached_grams is None
    got = {r["doc_id"]: r["text_clean"] for r in stripped.collect()}
    assert got == {1: BOILER, 2: "pre post"}
    release(spans)
    assert not spans._cached_grams.storageLevel.useMemory
    # derived-internally path: the strip result carries the handle
    s2 = strip_duplicate_spans(df, n=10)
    assert s2._cached_grams is not None
    s2.collect()
    release(s2)
    release(s2)  # idempotent / no-op safe

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
