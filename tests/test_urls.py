"""URL pipeline functions (functions/urls.py): RFC 3986 syntax-based
normalization, host/domain extraction, URL-level dedup, host stats,
blocklist filtering — the WARC→curation bridge ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrekker_spark.functions.urls import (
    dedup_by_url,
    filter_hosts,
    host_domain,
    host_stats,
    normalized_url,
    url_host,
)


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


NORM_CASES = [
    # (input, expected normalized)
    ("HTTP://WWW.Example.COM/a/b", "http://www.example.com/a/b"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com/a/#frag", "http://example.com/a"),
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/", "http://example.com/"),  # root slash kept
    ("http://example.com", "http://example.com/"),  # empty path → '/'
    ("http://example.com/a?b=1&a=2", "http://example.com/a?b=1&a=2"),
    ("http://example.com/a?b=1#frag", "http://example.com/a?b=1"),
    ("not a url at all", "not a url at all"),  # pass-through, never NULL
    (None, None),
]


def test_normalized_url_cases(spark):
    df = _urls(spark, [c[0] for c in NORM_CASES]).withColumn(
        "norm", normalized_url("url")
    )
    got = {r.doc_id: r.norm for r in df.collect()}
    for i, (_, want) in enumerate(NORM_CASES):
        assert got[i] == want, (i, NORM_CASES[i][0], got[i])


def test_host_and_domain_heuristic(spark):
    df = _urls(
        spark,
        [
            "https://www.Example.COM/x",
            "http://a.b.example.co.uk/y",
            "http://localhost/z",
            "http://deep.sub.host.example.org/",
        ],
    ).select(url_host("url").alias("h"), host_domain("url").alias("d"))
    rows = [tuple(r) for r in df.collect()]
    assert rows[0] == ("www.example.com", "example.com")
    assert rows[1] == ("a.b.example.co.uk", "example.co.uk")
    assert rows[2] == ("localhost", "localhost")
    assert rows[3] == ("deep.sub.host.example.org", "example.org")


def test_dedup_by_url_keeper_and_null_rule(spark):
    df = _urls(
        spark,
        [
            "http://example.com/a/",
            "HTTP://EXAMPLE.com:80/a",  # same resource after normalization
            "http://example.com/b",
            None,
            None,  # NULL urls are never duplicates of each other
        ],
    )
    kept = sorted(r.doc_id for r in dedup_by_url(df).collect())
    assert kept == [0, 2, 3, 4]


def test_host_stats_and_blocklist(spark):
    df = _urls(
        spark,
        [
            "http://a.example.com/1",
            "http://b.example.com/2",
            "http://spam.bad.net/3",
            "http://ok.org/4",
            None,
        ],
    )
    stats = {r.host: (r.domain, r.n_docs) for r in host_stats(df).collect()}
    assert stats["a.example.com"] == ("example.com", 1)
    assert stats[None][1] == 1  # NULL-url docs are visible in the inventory

    bl = spark.createDataFrame([("bad.net",), ("A.EXAMPLE.COM",)], "host string")
    kept = sorted(r.doc_id for r in filter_hosts(df, bl).collect())
    # 0 blocked by exact host, 2 blocked by registered DOMAIN, NULL passes
    assert kept == [1, 3, 4]


def test_normalization_matches_duckdb_mirror(spark):
    """Engine-portable semantics: the same normalization written as
    DuckDB SQL over the same inputs produces identical strings (the
    oracle idiom — pins the regex/port/path rules, not just examples)."""
    import duckdb

    urls = [c[0] for c in NORM_CASES if c[0] is not None] + [
        "https://X.Y:443/p/q/?k=v#f",
        "ftp://Host.Example/Dir/",
        "http://h:8080/",
    ]
    df = _urls(spark, urls).withColumn("norm", normalized_url("url"))
    got = {r.url: r.norm for r in df.collect()}
    con = duckdb.connect()
    sql = r"""
WITH u AS (SELECT unnest(?) AS url),
p AS (
  SELECT url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1)) AS host,
         nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)', 1), '') AS port,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         nullif(regexp_extract(regexp_extract(url, '^[^#]*', 0), '\?(.*)', 1), '') AS query
  FROM u)
SELECT url, CASE WHEN scheme = '' OR host = '' THEN url ELSE
  scheme || '://' || host
  || CASE WHEN port IS NULL OR (scheme='http' AND port='80')
            OR (scheme='https' AND port='443') THEN ''
       ELSE ':' || port END
  || CASE WHEN path = '' THEN '/'
       WHEN length(path) > 1 AND path LIKE '%/' THEN substr(path, 1, length(path)-1)
       ELSE path END
  || CASE WHEN query IS NULL THEN '' ELSE '?' || query END
END AS norm FROM p
"""
    want = dict(con.execute(sql, [urls]).fetchall())
    con.close()
    assert got == want


def test_warc_to_url_dedup_end_to_end(spark, tmp_path):
    """The composed crawl shape: WARC fixtures → warc_docs → URL dedup."""
    from tests.test_text_formats import _fixture_warc
    from vectrekker_spark.sources.text_formats import warc_docs

    p = tmp_path / "c.warc"
    p.write_bytes(_fixture_warc())
    docs = warc_docs(spark, str(p))
    deduped = dedup_by_url(docs)
    assert deduped.count() == docs.count() == 3  # fixture urls all distinct
    assert "url" in deduped.columns and "text" in deduped.columns
