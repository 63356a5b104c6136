"""robots.txt parsing + frontier filtering (functions/robots.py) against
RFC 9309's own worked examples."""

from __future__ import annotations

import pytest

from vectrekker_spark.functions.robots import (
    _parse_one,
    decide_robots,
    match_robots_pattern,
    parse_robots,
    robots_allowed,
)

EXAMPLE = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: /*.gif$
Disallow: /fish

User-agent: goodbot
User-agent: nicebot
Disallow: /only-for-star/

User-agent: emptybot
Disallow:
"""


def test_pattern_matching_rfc_cases():
    assert match_robots_pattern("/fish", "/fish")
    assert match_robots_pattern("/fishing", "/fish")  # prefix
    assert match_robots_pattern("/fish/salmon", "/fish")
    assert not match_robots_pattern("/Fish", "/fish")  # case-sensitive paths
    assert match_robots_pattern("/a/pic.gif", "/*.gif$")
    assert not match_robots_pattern("/a/pic.gifs", "/*.gif$")  # $ anchors
    assert match_robots_pattern("/x/y/z.php", "/*.php")
    assert not match_robots_pattern("/windows.PHP", "/*.php")


def test_group_selection_and_empty_disallow():
    star = _parse_one(EXAMPLE, "*")
    assert ("/private/", False, 9) in star and ("/fish", False, 5) in star
    good = _parse_one(EXAMPLE, "GoodBot")  # case-insensitive token
    assert good == [("/only-for-star/", False, 15)]
    nice = _parse_one(EXAMPLE, "nicebot")  # stacked UA lines share rules
    assert nice == good
    # emptybot's sole Disallow is empty → no rules → everything allowed
    assert _parse_one(EXAMPLE, "emptybot") == []
    # unknown agent falls back to the * group
    assert _parse_one(EXAMPLE, "otherbot") == star


def test_decide_longest_match_and_allow_tie():
    rules = [("/private/", False, 9), ("/private/public.html", True, 20)]
    assert not decide_robots("/private/secret.html", rules)
    assert decide_robots("/private/public.html", rules)  # longer allow wins
    # equal length: allow wins the tie (RFC 9309 §2.2.2)
    tie = [("/page", False, 5), ("/page", True, 5)]
    assert decide_robots("/page", tie)
    assert decide_robots("/unmatched", [("/private/", False, 9)])


def test_parse_and_filter_end_to_end(spark):
    robots = spark.createDataFrame(
        [
            ("a.example", EXAMPLE),
            ("b.example", "User-agent: *\nDisallow: /\nAllow: /open/"),
            ("c.example", None),  # fetched nothing → no rules
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots, agent="*")
    got = {
        (r.host, r.pattern, r.is_allow, r.prec) for r in rules.collect()
    }
    assert ("a.example", "/fish", False, 5) in got
    assert ("b.example", "/open/", True, 6) in got
    assert not any(h == "c.example" for h, *_ in got)

    frontier = spark.createDataFrame(
        [
            (0, "http://a.example/fish/salmon"),
            (1, "http://a.example/private/public.html"),
            (2, "http://a.example/ok/page.html"),
            (3, "http://b.example/anything"),
            (4, "http://b.example/open/door.html"),
            (5, "http://nobots.example/x"),
            (6, "http://c.example/"),  # host with robots fetched but empty
            (7, None),
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: r.robots_allowed
        for r in robots_allowed(frontier, rules).collect()
    }
    assert out == {
        0: False,   # /fish prefix disallow
        1: True,    # longest-match allow overrides /private/
        2: True,    # no matching rule
        3: False,   # Disallow: /
        4: True,    # Allow: /open/ is longer than Disallow: /
        5: True,    # no robots for host
        6: True,    # robots with no rules
        7: True,    # NULL url carries no fetch
    }


def test_robots_allowed_validation(spark):
    frontier = spark.createDataFrame([(0, "http://x/")], "doc_id long, url string")
    with pytest.raises(ValueError, match="parse_robots"):
        robots_allowed(frontier, frontier)
    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /")], "host string, robots_txt string"
    )
    rules = parse_robots(robots)
    with pytest.raises(ValueError, match="already exists"):
        robots_allowed(
            frontier.withColumn("robots_allowed", frontier.doc_id), rules
        )
    with pytest.raises(ValueError, match="agent"):
        parse_robots(robots, agent="")


def test_crawl_delay_parsing(spark):
    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: slowbot\nCrawl-delay: 10.5\n\n"
        "User-agent: fastbot\nDisallow: /y\n"
    )
    from vectrekker_spark.functions.robots import (
        crawl_delay_for,
        parse_crawl_delays,
    )

    assert crawl_delay_for(body, "*") == 2.0
    assert crawl_delay_for(body, "slowbot") == 10.5
    assert crawl_delay_for(body, "fastbot") is None  # its group has none
    assert crawl_delay_for("User-agent: *\nCrawl-delay: nope", "*") is None
    assert crawl_delay_for("User-agent: *\nCrawl-delay: -3", "*") is None
    # several applicable groups: the polite maximum wins
    two = "User-agent: *\nCrawl-delay: 1\n\nUser-agent: *\nCrawl-delay: 4\n"
    assert crawl_delay_for(two, "*") == 4.0

    robots = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nDisallow: /")],
        "host string, robots_txt string",
    )
    got = {
        r.host: r.crawl_delay
        for r in parse_crawl_delays(robots, agent="*").collect()
    }
    assert got == {"a.example": 2.0}
    # crawl-delay groups don't leak rules: the parse still works after
    rules = {
        (r.host, r.pattern) for r in __import__(
            "vectrekker_spark.functions.robots", fromlist=["parse_robots"]
        ).parse_robots(robots).collect()
    }
    assert ("a.example", "/x") in rules and ("b.example", "/") in rules


def test_review_findings_query_rules_and_host_case(spark):
    """r14s2 review pins: (a) query-targeted rules are enforced — the REP
    matching unit is path+query, not PATH alone; (b) a mixed-case robots
    host still matches its lowercased frontier host."""
    robots = spark.createDataFrame(
        [("Example.COM", "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /search?")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    assert {r.host for r in rules.collect()} == {"example.com"}
    frontier = spark.createDataFrame(
        [
            (0, "http://example.com/page?sessionid=abc"),
            (1, "http://EXAMPLE.com/search?q=x"),
            (2, "http://example.com/page"),
            (3, "http://example.com/search"),  # no query: '/search?' misses
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: r.robots_allowed
        for r in robots_allowed(frontier, rules).collect()
    }
    assert out == {0: False, 1: False, 2: True, 3: True}


def test_robots_reserved_helper_columns(spark):
    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /")], "host string, robots_txt string"
    )
    rules = parse_robots(robots)
    frontier = spark.createDataFrame(
        [(0, "http://h/x", 1)], "doc_id long, url string, __rb_path int"
    )
    with pytest.raises(ValueError, match="__rb_path"):
        robots_allowed(frontier, rules)


def test_sitemap_extraction(spark):
    """robots Sitemap lines + sitemap <loc> parsing (functions/urls),
    with a DuckDB mirror for both regexes."""
    from pyspark.sql import functions as F

    from vectrekker_spark.functions.urls import robots_sitemaps, sitemap_urls

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.example/sitemap.xml\n"
        "  sitemap:\thttps://a.example/news.xml\n"
    )
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.example/p?x=1&amp;y=2 </loc></url>"
        "<url><loc>https://a.example/q</loc></url></urlset>"
    )
    df = spark.createDataFrame([(body, xml)], "robots string, xml string")
    row = df.select(
        robots_sitemaps("robots").alias("s"), sitemap_urls("xml").alias("l")
    ).first()
    assert row["s"] == [
        "https://a.example/sitemap.xml",
        "https://a.example/news.xml",
    ]
    # whitespace trimmed, &amp; decoded
    assert row["l"] == ["https://a.example/p?x=1&y=2", "https://a.example/q"]
    nulls = spark.createDataFrame([(None, None)], "robots string, xml string")
    r2 = nulls.select(
        robots_sitemaps("robots").alias("s"), sitemap_urls("xml").alias("l")
    ).first()
    assert r2["s"] is None and r2["l"] is None

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(robots VARCHAR, xml VARCHAR)")
    con.execute("INSERT INTO t VALUES (?, ?)", [body, xml])
    m = con.execute(
        r"""
        SELECT regexp_extract_all(robots, '(?im)^[ \t]*sitemap:[ \t]*(\S+)', 1),
               list_transform(
                 regexp_extract_all(xml, '(?is)<loc>\s*([^<]*?)\s*</loc>', 1),
                 u -> replace(replace(replace(replace(replace(u,
                      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                      '&apos;', ''''), '&amp;', '&'))
        FROM t
        """
    ).fetchone()
    con.close()
    assert m[0] == row["s"] and m[1] == row["l"]


def test_unknown_directives_do_not_split_groups():
    """RFC 9309: unrecognized lines (Sitemap, Host) are ignored — they
    must not flush a stacked User-agent group into zero rules (the
    under-blocking bug: the exact-match group won with NO rules and the
    agent crawled the whole disallowed site; r14s3 review)."""
    from vectrekker_spark.functions.robots import _parse_one

    body = (
        "User-agent: mybot\n"
        "Sitemap: https://x.example/s.xml\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    rules = _parse_one(body, "mybot")
    assert rules == [("/", False, 1)]  # mybot shares the stacked group


def test_crawl_delay_rejects_infinity():
    from vectrekker_spark.functions.robots import crawl_delay_for

    body = "User-agent: *\nCrawl-delay: inf\nDisallow: /x\n"
    assert crawl_delay_for(body, "*") is None
    body2 = "User-agent: *\nCrawl-delay: 2.5\n"
    assert crawl_delay_for(body2, "*") == 2.5
