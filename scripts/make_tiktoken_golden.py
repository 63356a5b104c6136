"""Regenerate tests/golden/tiktoken_counts_documents_sf0001.json.

Uses the REAL tiktoken cl100k_base the moment an environment has it
installed (then the golden carries true reference-parity counts —
`vectrekker/main.py:170` tokenizes with this exact encoding); falls back to
the deterministic stand-in in tests/fake_tiktoken.py otherwise. The
`encoder` field records which one produced the file.
tests/test_tiktoken_parity.py always checks Spark-UDF counts against the
ACTIVE encoder driver-side, pins the golden when its encoder kind matches,
and FAILS (not skips) when the real library appears while the golden is
still fake-produced — run this script then to refresh it.

Usage: python scripts/make_tiktoken_golden.py [documents.parquet]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

FIXTURE = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/testdata/sf0.001/documents.parquet"
)
OUT = os.path.join(REPO, "tests", "golden", "tiktoken_counts_documents_sf0001.json")


def main() -> None:
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{FIXTURE}') order by doc_id"
    ).fetchall()
    try:
        import tiktoken

        enc = tiktoken.get_encoding("cl100k_base")
        counts = {str(d): len(enc.encode(t or "")) for d, t in rows}
        src = "tiktoken"
    except ImportError:
        import fake_tiktoken

        counts = {str(d): fake_tiktoken.fake_count(t) for d, t in rows}
        src = "fake_tiktoken (deterministic stand-in; see tests/fake_tiktoken.py)"
    with open(OUT, "w") as f:
        json.dump(
            {"encoder": src, "fixture": FIXTURE, "counts": counts},
            f,
            indent=0,
            sort_keys=True,
        )
    print(f"{OUT}: {len(counts)} docs via {src}")


if __name__ == "__main__":
    main()
