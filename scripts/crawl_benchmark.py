"""Crawl→corpus pipeline benchmark: the r13 surface measured end-to-end.

Generates a synthetic crawl (N HTML pages across F per-record-gzip
.warc.gz shards — the Common Crawl layout — with planted URL refetch
aliases and exact content duplicates), then measures each stage on
local[32]:

    read_warc → warc_html_docs (record walk + HTML→text)
    → dedup_by_url (normalization + min-id keeper)
    → host_stats (inventory)
    → curate() (exact dedup → near-dedup → quality → chunk)

Usage: python scripts/crawl_benchmark.py [n_pages] [n_shards]
       (default 20000 pages, 16 shards)
Prints one JSON line; record the numbers in SCALE.md.
"""

from __future__ import annotations

import gzip
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [f"word{i}" for i in range(800)]


def _page_html(rng: random.Random, seed: int) -> str:
    paras = "".join(
        "<p>" + " ".join(rng.choices(VOCAB, k=rng.randint(20, 60))) + "</p>"
        for _ in range(rng.randint(2, 6))
    )
    return (
        "<html><head><title>t</title><style>a{color:red}</style></head>"
        f"<body><script>var x={seed};</script><h1>Doc {seed}</h1>"
        f"{paras}<div>footer text</div></body></html>"
    )


def _warc_record(url: str, html: bytes) -> bytes:
    block = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "WARC-Date: 2026-08-16T00:00:00Z\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode() + block + b"\r\n\r\n"


def generate(out_dir: str, n_pages: int, n_shards: int) -> None:
    rng = random.Random(13)
    shards = [[] for _ in range(n_shards)]
    for i in range(n_pages):
        base = i
        # 20%: a URL-alias refetch of an earlier page (same canonical url)
        if i % 5 == 1 and i > 10:
            base = i - rng.randint(1, 10)
            url = f"HTTP://Site{base % 200}.example.COM:80/page/{base}/"
        else:
            url = f"http://site{base % 200}.example.com/page/{base}"
        # 10%: exact content duplicate under a DIFFERENT url (mirrors)
        content_seed = base if i % 10 != 3 else max(base - 7, 0)
        html = _page_html(random.Random(content_seed), content_seed).encode()
        shards[i % n_shards].append(_warc_record(url, html))
    for s, records in enumerate(shards):
        with open(os.path.join(out_dir, f"shard-{s:03d}.warc.gz"), "wb") as f:
            for r in records:
                f.write(gzip.compress(r))


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from vectrekker_spark.curation import CurationConfig, curate
    from vectrekker_spark.functions.html import warc_html_docs
    from vectrekker_spark.functions.urls import dedup_by_url, host_stats
    from vectrekker_spark.session import get_spark
    from vectrekker_spark.sources.text_formats import warc_file_report

    work = tempfile.mkdtemp(prefix="crawl_bench_")
    try:
        t0 = time.time()
        generate(work, n_pages, n_shards)
        t_gen = time.time() - t0
        spark = get_spark(app_name="crawl-benchmark")
        report: dict = {
            "n_pages": n_pages,
            "n_shards": n_shards,
            "t_generate_sec": round(t_gen, 2),
            "corpus_mb": round(
                sum(os.path.getsize(os.path.join(work, f))
                    for f in os.listdir(work)) / 1e6, 1,
            ),
        }

        t0 = time.time()
        audit = warc_file_report(spark, work + "/*.warc.gz").collect()
        report["t_file_report_sec"] = round(time.time() - t0, 2)
        assert all(r["status"] is None for r in audit), "corrupt shard?"
        report["warc_records"] = sum(r["n_records"] for r in audit)

        t0 = time.time()
        docs = warc_html_docs(spark, work + "/*.warc.gz").persist()
        n_docs = docs.count()
        report["t_extract_sec"] = round(time.time() - t0, 2)
        report["docs_extracted"] = n_docs
        report["extract_pages_per_sec"] = round(
            n_docs / max(time.time() - t0, 1e-9), 1
        )

        t0 = time.time()
        kept = dedup_by_url(docs).persist()
        n_kept = kept.count()
        report["t_url_dedup_sec"] = round(time.time() - t0, 2)
        report["after_url_dedup"] = n_kept

        t0 = time.time()
        hs = host_stats(kept).collect()
        report["t_host_stats_sec"] = round(time.time() - t0, 2)
        report["n_hosts"] = len(hs)

        t0 = time.time()
        res = curate(
            kept.select("doc_id", "text"),
            CurationConfig(min_quality=0.0, embed=False),
        )
        funnel = dict(res.funnel)
        report["t_curate_sec"] = round(time.time() - t0, 2)
        report["after_exact_dedup"] = funnel.get("after_exact_dedup")
        report["after_near_dedup"] = funnel.get("after_near_dedup")
        report["chunks"] = funnel.get("chunks", res.chunks.count())
        docs.unpersist()
        kept.unpersist()
        report["total_pipeline_sec"] = round(
            report["t_file_report_sec"] + report["t_extract_sec"]
            + report["t_url_dedup_sec"] + report["t_curate_sec"], 2,
        )
        print(json.dumps(report))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
