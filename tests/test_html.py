"""HTML→text extraction (functions/html.py): structural stripping, block
boundaries, entity tiers, the exact Arrow variant, and the composed
WARC-response→document reader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.functions.html import (
    html_to_text,
    html_to_text_exact,
    warc_html_docs,
)

PAGE = """<!DOCTYPE html><html><head><title>T</title>
<style>body { color: red; }</style></head>
<body><!-- nav below -->
<script type="text/javascript">var x = "<p>not text</p>";</script>
<h1>Heading One</h1>
<p>First paragraph with <b>bold</b> &amp; <a href="/x">a link</a>.</p>
<p>Second&nbsp;paragraph.</p>
<ul><li>item one</li><li>item two</li></ul>
<div>tail text</div></body></html>"""

WANT_LINES = [
    "Heading One",
    "First paragraph with bold & a link .",
    "Second paragraph.",
    "item one",
    "item two",
    "tail text",
]


def _one(spark, html, fn=html_to_text):
    df = spark.createDataFrame([(html,)], "text string")
    return df.select(fn("text").alias("t")).first().t


def test_html_to_text_structure(spark):
    got = _one(spark, PAGE)
    assert got.split("\n") == WANT_LINES


def test_block_boundaries_prevent_word_fusion(spark):
    got = _one(spark, "<p>end of one</p><p>start of two</p>")
    assert got == "end of one\nstart of two"
    # inline tags do NOT break lines
    assert _one(spark, "a <b>bold</b> word") == "a bold word"


def test_entities_two_tiers(spark):
    html = "x &amp; y &#8217;s &lt;tag&gt; &copy; &#x27;q"
    fast = _one(spark, html)
    # named decoded; numeric/hex DROPPED by the expression tier
    assert fast == "x & y s <tag> © q"
    df = spark.createDataFrame([(html,)], "text string")
    exact = html_to_text_exact(df).first().text
    assert exact == "x & y ’s <tag> © 'q"


def test_exact_matches_fast_on_entity_free_docs(spark):
    df = spark.createDataFrame([(PAGE.replace("&amp;", "and"),), (None,)],
                               "text string")
    fast = df.select(html_to_text("text").alias("t")).collect()
    exact = html_to_text_exact(df, out_col="t").select("t").collect()
    assert [r.t for r in fast] == [r.t for r in exact]
    assert fast[1].t is None  # NULL → NULL on both tiers


def test_script_containing_markup_is_gone(spark):
    got = _one(spark, PAGE)
    assert "not text" not in got and "color: red" not in got
    assert "nav below" not in got


def test_expression_tier_is_jvm_only(spark):
    df = spark.createDataFrame([(PAGE,)], "text string")
    plan = (
        df.select(html_to_text("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_warc_html_docs_end_to_end(spark, tmp_path):
    from tests.test_text_formats import _fixture_warc, _http_block, _warc_record

    data = _fixture_warc() + _warc_record(
        "response", "http://example.com/page",
        _http_block(b"<html><body><p>real body text</p></body></html>"),
    )
    p = tmp_path / "h.warc"
    p.write_bytes(data)
    docs = warc_html_docs(spark, str(p))
    rows = {r.url: r.text for r in docs.collect()}
    # only HTML-mime responses: the WET conversion + non-HTTP rows drop
    assert rows == {
        "http://example.com/a": "alpha beta gamma delta page one",
        "http://example.com/page": "real body text",
    }


def test_amp_decodes_last_no_double_decode(spark):
    """Advisor r13: '&amp;' replaced first double-decoded '&amp;lt;' to
    '<'; single-pass html.unescape (the exact tier) yields the literal
    '&lt;'. '&amp;' now decodes after every other entity AND after the
    unknown-reference dropper, so the tiers agree on chained entities."""
    cases = {
        "a &amp;lt; b": "a &lt; b",
        "a &amp;amp; b": "a &amp; b",
        "x &amp;foo; y": "x &foo; y",   # unknown ref survives via &amp;
        "&quot;&amp;quot;": '"&quot;',
        "p &amp; q": "p & q",
    }
    df = spark.createDataFrame([(h,) for h in cases], "text string")
    fast = {r["text"]: r["o"] for r in df.select(
        "text", html_to_text("text").alias("o")).collect()}
    exact = {r["text"]: r["o"] for r in html_to_text_exact(
        df, "text", "o").select("text", "o").collect()}
    for h, want in cases.items():
        assert fast[h] == want, (h, fast[h])
        assert exact[h] == want, (h, exact[h])


def test_html_title_and_noindex(spark):
    from vectrekker_spark.functions.html import html_noindex, html_title

    pages = [
        (0, "<html><head><title> My &amp; Page \n Title </title></head></html>"),
        (1, "<html><head><meta name=robots content='nofollow, NOINDEX'>"
            "<title>t</title></head></html>"),
        (2, '<html><head><meta content="noindex" name="GoogleBot"></head>'),
        (3, "<html><head><meta name='robots' content='all'></head>"),
        (4, "<html><body>no head</body></html>"),
        (5, None),
        # 'noindexable' must NOT match (word boundary)
        (6, "<meta name=robots content=noindexable>"),
    ]
    df = spark.createDataFrame(pages, "i long, h string").select(
        "i", html_title("h").alias("t"), html_noindex("h").alias("nx")
    )
    rows = {r["i"]: (r["t"], r["nx"]) for r in df.collect()}
    assert rows[0] == ("My & Page Title", False)
    assert rows[1] == ("t", True)
    assert rows[2] == (None, True)   # attribute order + case insensitive
    assert rows[3] == (None, False)
    assert rows[4] == (None, False)
    assert rows[5] == (None, None)   # NULL html classifies NULL
    assert rows[6] == (None, False)

    # JVM-only
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
