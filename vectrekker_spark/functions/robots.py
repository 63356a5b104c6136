"""robots.txt parsing + frontier filtering (RFC 9309) — the politeness
gate between frontier extraction (functions/urls.html_links → dedup) and
fetching. A crawl that ignores robots both wastes fetches and gets itself
blocked; every production pipeline filters the frontier first.

Spark shape: robots.txt files are tiny (RFC caps parseable size at
500 KiB) and one-per-host, so the PARSE is a per-file imperative walk in
an Arrow map (the WARC/S3 precedent — the distributed unit is the host),
producing a narrow ``(host, pattern, is_allow, prec)`` rules table. The
MATCH side never broadcasts rule state through closures: rules are
grouped to one array row per host and JOINED to the frontier on host (a
few rules × hosts — small side, broadcastable by AQE), then one Arrow
map decides each URL against its co-located rule array. At 100 TB of
frontier the cost is one small-side join + a zero-shuffle map.

Semantics implemented (RFC 9309 §2):

- group selection: the group(s) whose ``User-agent`` token equals the
  crawler's product token case-insensitively; if none, the ``*``
  group(s). Token matching is exact-or-star — the RFC's longest-prefix
  product-token refinement is deliberately out of scope (documented).
- rule matching: ``Allow``/``Disallow`` values match as PATH PREFIXES
  with ``*`` (any chars) and a trailing ``$`` (end anchor); the rule
  with the LONGEST pattern wins; on a tie Allow wins; no matching rule
  (or no robots.txt for the host) → allowed. An empty Disallow value
  allows everything (ignored, per RFC).
- lines are split on ``#`` comments; unknown directives are skipped;
  ``User-agent`` lines STACK onto the following rule block.

Reference scope note: the reference (vectrekker/main.py) has no crawl
surface; this completes the r13/r14 frontier loop (html_links →
dedup_by_url → filter_hosts → robots_allowed → fetch).
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULES_SCHEMA = "host string, pattern string, is_allow boolean, prec int"


def _parse_groups(text: str):
    """[(agents, rules, crawl_delay)] blocks of a robots.txt body."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay, in_rules = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:  # empty Disallow allows everything: skip (RFC)
                cur_rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            in_rules = True  # a group-scoped directive ends the UA stack
            try:
                d = float(val)
                # finite only: 'Crawl-delay: inf' would win the polite
                # maximum and stall a scheduler forever (r14s3 review)
                if d >= 0 and math.isfinite(d):
                    cur_delay = d
            except ValueError:
                pass  # unparseable delay: ignore the directive
        # UNKNOWN directives (Sitemap, Host, ...) are ignored entirely —
        # RFC 9309 §2.2.4: they neither belong to a group nor end one.
        # Treating them as group-enders made "User-agent: a\nSitemap: x\n
        # User-agent: *\nDisallow: /" flush agent a with ZERO rules, and
        # the exact-match selection then let a crawl the whole disallowed
        # site (r14s3 review — the under-blocking direction).
    flush()
    return groups


def _select_groups(groups, agent: str):
    agent = agent.lower()
    if any(agent in agents for agents, *_ in groups):
        return [g for g in groups if agent in g[0]]
    return [g for g in groups if "*" in g[0]]


def _parse_one(text: str, agent: str) -> list[tuple[str, bool, int]]:
    """(pattern, is_allow, prec) rules of the applicable group(s)."""
    chosen = _select_groups(_parse_groups(text), agent)
    return [
        (pat, allow, len(pat)) for _, rules, _ in chosen for pat, allow in rules
    ]


def crawl_delay_for(text: str, agent: str) -> float | None:
    """The applicable group's Crawl-delay in seconds (the de-facto
    extension most crawlers honor; not part of RFC 9309). When several
    applicable groups declare one, the MAXIMUM wins (polite direction)."""
    delays = [
        d for *_, d in _select_groups(_parse_groups(text), agent) if d is not None
    ]
    return max(delays) if delays else None


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, pattern, is_allow, prec) rules for ``agent`` from per-host
    robots.txt bodies. NULL text / NULL host rows contribute no rules
    (absent robots means allowed — the downstream default)."""
    if not agent:
        raise ValueError("agent must be a non-empty product token or '*'")

    def gen(batches):
        for pdf in batches:
            out = {"host": [], "pattern": [], "is_allow": [], "prec": []}
            for host, text in zip(pdf[host_col], pdf[text_col]):
                if host is None or text is None:
                    continue
                for pat, allow, prec in _parse_one(text, agent):
                    # hostnames are case-insensitive; url_host lowercases
                    # the frontier side, so the join key must match
                    # (review finding: a mixed-case robots parquet host
                    # silently disabled its whole robots.txt)
                    out["host"].append(str(host).lower())
                    out["pattern"].append(pat)
                    out["is_allow"].append(allow)
                    out["prec"].append(prec)
            yield pd.DataFrame(out)

    return df.select(host_col, text_col).mapInPandas(gen, _RULES_SCHEMA)


def parse_crawl_delays(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, crawl_delay) rows for hosts whose applicable group declares
    a Crawl-delay — join to a per-host fetch scheduler. Hosts without one
    are absent (crawler default applies)."""
    if not agent:
        raise ValueError("agent must be a non-empty product token or '*'")

    def gen(batches):
        for pdf in batches:
            out = {"host": [], "crawl_delay": []}
            for host, text in zip(pdf[host_col], pdf[text_col]):
                if host is None or text is None:
                    continue
                d = crawl_delay_for(text, agent)
                if d is not None:
                    out["host"].append(str(host).lower())
                    out["crawl_delay"].append(d)
            yield pd.DataFrame(out)

    return df.select(host_col, text_col).mapInPandas(
        gen, "host string, crawl_delay double"
    )


@lru_cache(maxsize=4096)
def _pattern_rx(pattern: str):
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


def match_robots_pattern(path: str, pattern: str) -> bool:
    """RFC 9309 path matching: prefix with '*' wildcards and an optional
    trailing '$' end anchor."""
    return _pattern_rx(pattern).match(path) is not None


def decide_robots(path: str, rules) -> bool:
    """Longest-pattern rule wins; Allow wins ties; no match → allowed."""
    best_prec = -1
    best_allow = True
    for pat, is_allow, prec in rules:
        if prec < best_prec or (prec == best_prec and not is_allow):
            continue
        if match_robots_pattern(path, pat):
            best_prec, best_allow = prec, is_allow
    return best_allow


def robots_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """All frontier columns + ``out_col: boolean`` — whether ``agent``'s
    rules admit each URL. Hosts with no rules (no/empty robots.txt) are
    allowed; NULL urls are allowed=true (they carry no fetch). Pass a
    ``parse_robots`` result as ``rules``."""
    from vectrekker_spark.functions.urls import url_host

    for needed in ("host", "pattern", "is_allow", "prec"):
        if needed not in rules.columns:
            raise ValueError(
                f"rules must be a parse_robots result (missing {needed!r})"
            )
    for col in (out_col, "__rb_h", "__rb_host", "__rb_rules", "__rb_path"):
        if col in frontier.columns:
            raise ValueError(
                f"column {col!r} already exists on the input — reserved "
                f"by robots_allowed; rename it first"
            )
    per_host = rules.groupBy(F.col("host").alias("__rb_host")).agg(
        F.collect_list(F.struct("pattern", "is_allow", "prec")).alias(
            "__rb_rules"
        )
    )
    joined = frontier.withColumn("__rb_h", url_host(F.col(url_col))).join(
        per_host,
        F.col("__rb_h").eqNullSafe(F.col("__rb_host")),
        "left",
    )
    # the REP matching unit is path + query ('Disallow: /search?q=' and
    # '/*?sessionid=' are common real rules); PATH alone silently
    # un-enforces every query-targeted rule (review finding)
    path = F.coalesce(
        F.nullif(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
        F.lit("/"),
    )
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    target = F.when(
        query.isNotNull(), F.concat(path, F.lit("?"), query)
    ).otherwise(path)
    joined = joined.withColumn("__rb_path", target)

    def _decide(batch: pd.DataFrame) -> pd.Series:
        out = []
        for p, rls in zip(batch["__rb_path"], batch["__rb_rules"]):
            if rls is None or len(rls) == 0 or p is None:
                out.append(True)
            else:
                out.append(
                    decide_robots(
                        p, [(r["pattern"], r["is_allow"], r["prec"]) for r in rls]
                    )
                )
        return pd.Series(out)

    udf = F.pandas_udf(_decide, "boolean")
    return (
        joined.withColumn(
            out_col, udf(F.struct("__rb_path", "__rb_rules"))
        )
        .drop("__rb_h", "__rb_host", "__rb_rules", "__rb_path")
    )
