"""HTML → text extraction — the step a WET generator performs between a
crawl's HTTP responses and its plain-text corpus. Paired with
sources/text_formats.read_warc (which yields raw HTML for `response`
records) and functions/text.keep_content_lines (the boilerplate
line-filter this feeds), it closes the crawl→corpus path end-to-end.

Two tiers, same contract (NULL → NULL, never raises):

- ``html_to_text``: pure Catalyst expression chain (regexp_replace —
  JVM-side, codegen'd, zero Python). Strips comments/script/style/head
  blocks, turns block-level closers into newlines, drops remaining tags,
  decodes the common named entities and collapses whitespace. Numeric
  character references (&#8217;) are DROPPED rather than decoded (an
  expression can't compute chr(n)); on web text this loses typographic
  punctuation, not words. This is the 100 TB hot path.
- ``html_to_text_exact``: Arrow-batched pandas_udf over stdlib
  html.unescape + the same structural regexes — full entity fidelity
  (named + numeric) for when the corpus is entity-heavy. ~the usual
  Python-boundary premium; same output modulo entity handling,
  property-tested equal on entity-free documents.

Scope honesty: this is tag stripping with block-boundary awareness, not
DOM-aware readability extraction (no main-content scoring, no table
linearization). That is exactly what WET files themselves contain, and
the downstream boilerplate filter (C19) is the layer that removes nav
chrome — same division of labor as the reference pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?is) = case-insensitive + dotall; Java regex accepts inline flags.
_BLOCK_STRIP = (
    r"(?is)<!--.*?-->",
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<head\b[^>]*>.*?</head\s*>",
    r"(?is)<(?:noscript|template|svg)\b[^>]*>.*?</(?:noscript|template|svg)\s*>",
)
# closing (or void) tags that end a visual block → newline so words from
# adjacent blocks don't fuse ("</p><p>" must not glue sentences)
_NEWLINE_TAGS = (
    r"(?i)<(?:br|hr)\s*/?\s*>|</(?:p|div|h[1-6]|li|ul|ol|tr|table|"
    r"section|article|header|footer|blockquote|pre|figcaption|dd|dt)\s*>"
)
_ANY_TAG = r"(?s)<[^>]*>"
_NAMED_ENTITIES = (
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&apos;", "'"), ("&#39;", "'"), ("&#34;", '"'),
    ("&mdash;", "—"), ("&ndash;", "–"), ("&hellip;", "…"), ("&copy;", "©"),
)


def html_to_text(html: Column | str) -> Column:
    """Expression-only HTML→text (see module docstring for the tier
    contract). Output: newline-separated visual blocks, runs of
    spaces/tabs collapsed, leading/trailing whitespace trimmed."""
    c = F.col(html) if isinstance(html, str) else html
    out = c
    for pat in _BLOCK_STRIP:
        out = F.regexp_replace(out, pat, "")
    out = F.regexp_replace(out, _NEWLINE_TAGS, "\n")
    out = F.regexp_replace(out, _ANY_TAG, " ")
    # '&amp;' must decode LAST (after the unknown-reference dropper too):
    # chained replacements would double-decode '&amp;lt;' into '<' where
    # single-pass html.unescape (the exact tier) yields the literal
    # '&lt;' (advisor r13)
    for ent, rep in _NAMED_ENTITIES:
        if ent != "&amp;":
            out = F.regexp_replace(out, ent, rep)
    # un-decoded references (numeric or exotic named) drop, not linger;
    # the lookahead spares '&amp;' for the final decode below
    out = F.regexp_replace(out, r"&(?!amp;)#?[A-Za-z0-9]{1,10};", "")
    out = F.regexp_replace(out, "&amp;", "&")
    out = F.regexp_replace(out, r"[ \t\r\f]+", " ")  # collapse within lines
    out = F.regexp_replace(out, r" ?\n ?", "\n")  # tidy line boundaries
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    # F.trim strips spaces ONLY (not newlines) — regex-trim both ends
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def html_to_text_exact(
    df: DataFrame, html_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """Arrow-batched full-fidelity variant: identical structural handling,
    entities via stdlib html.unescape (named + numeric + hex)."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    strip_res = [re.compile(p.replace("(?is)", ""), re.I | re.S)
                 for p in _BLOCK_STRIP]
    nl_re = re.compile(_NEWLINE_TAGS.replace("(?i)", ""), re.I)
    tag_re = re.compile(_ANY_TAG.replace("(?s)", ""), re.S)

    def _conv(s):
        import html as html_mod

        def one(v):
            if v is None:
                return None
            for r in strip_res:
                v = r.sub("", v)
            v = nl_re.sub("\n", v)
            v = tag_re.sub(" ", v)
            v = html_mod.unescape(v)
            # unescape yields U+00A0 for &nbsp;; corpus text wants a
            # plain space (the fast tier's mapping)
            v = v.replace("\xa0", " ")
            v = re.sub(r"[ \t\r\f]+", " ", v)
            v = re.sub(r" ?\n ?", "\n", v)
            v = re.sub(r"\n{2,}", "\n", v)
            return v.strip()

        return s.map(one)

    # this module uses `from __future__ import annotations`, which turns
    # inline annotations into strings pandas_udf can't interpret — attach
    # the real types explicitly instead
    _conv.__annotations__ = {"s": pd.Series, "return": pd.Series}
    conv = pandas_udf(_conv, "string")

    return df.withColumn(out_col, conv(F.col(html_col)))


def html_title(html: Column | str) -> Column:
    """The page's <title> text, entity-decoded through the expression
    tier and whitespace-collapsed; NULL when absent/NULL — the one piece
    of document metadata every crawl keeps. Pure Catalyst."""
    c = F.col(html) if isinstance(html, str) else html
    raw = F.regexp_extract(c, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    # titles are one line: fold the text tier's block boundaries to spaces.
    # The absence test runs on the CLEANED value: a whitespace- or
    # dropped-entity-only title previously returned '' while a missing
    # one returned NULL — an inconsistent tri-state for isNotNull
    # consumers (r14s3 review)
    cleaned = F.trim(F.regexp_replace(html_to_text(raw), r"\s+", " "))
    return F.when(
        c.isNull() | (cleaned == ""), F.lit(None).cast("string")
    ).otherwise(cleaned)


def html_noindex(html: Column | str) -> Column:
    """True when the page carries a robots/googlebot noindex meta
    directive (`<meta name="robots" content="... noindex ...">`, either
    attribute order, either quote style) — the standard pre-curation
    drop real pipelines apply (CCNet/C4 respect noindex). NULL html →
    NULL (classify, never guess). Pure Catalyst, one regex."""
    c = F.col(html) if isinstance(html, str) else html
    pat = (
        r"(?is)<meta\b(?=[^>]*\bname\s*=\s*['\"]?(?:robots|googlebot)\b)"
        r"(?=[^>]*\bcontent\s*=\s*['\"]?[^'\">]*\bnoindex\b)[^>]*>"
    )
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
        c.rlike(pat)
    )


def warc_html_docs(spark, path: str, min_chars: int = 1) -> DataFrame:
    """The composed crawl→corpus reader: WARC response records whose mime
    is HTML → html_to_text → the document schema (doc_id, text, url, ts,
    mime). WET `conversion` records should use warc_docs directly (their
    text is already extracted)."""
    from vectrekker_spark.sources.text_formats import _with_doc_id, read_warc

    df = read_warc(spark, path, kinds=("response",))
    df = df.filter(
        F.col("mime").isin("text/html", "application/xhtml+xml")
    ).withColumn("text", html_to_text("text"))
    return _with_doc_id(
        df.filter(F.length("text") >= min_chars), None, "text"
    ).select("doc_id", "text", "url", "ts", "mime")
