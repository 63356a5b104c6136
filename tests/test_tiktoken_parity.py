"""Real-tiktoken-path parity (r7 verdict #4): prove the `tiktoken_count_udf`
plumbing and the 8191-token gate (functions/tokenize.py:46,:66; reference
`vectrekker/main.py:170,175,178`) beyond the BPE-ish regex proxy.

tiktoken is not installable here (and cl100k's ranks file is a network
download), so the tests inject `tests/fake_tiktoken.py` — a deterministic
module implementing the exact surface the UDF touches, with counts that
deliberately DIFFER from the proxy's. Seeing fake counts come out of Spark
therefore proves the real-library code path executed end-to-end (module
import, encoder capture, Arrow batching, null handling, int cast, the gate's
availability switch, and quarantine routing). A golden file pins the fake's
counts on the sf0.001 documents fixture; scripts/make_tiktoken_golden.py
regenerates it with the REAL library the moment an environment has one.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

import fake_tiktoken

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "tiktoken_counts_documents_sf0001.json"
)


def _real_tiktoken_importable() -> bool:
    try:
        import tiktoken  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture()
def active_tiktoken(monkeypatch):
    """Make SOME tiktoken importable and return (module, is_real): the real
    library when present (no injection — the UDF path then runs for real),
    else the fake installed into sys.modules. Either way the UDF tests
    below exercise the real-library code path with a known encoder."""
    if _real_tiktoken_importable():
        import tiktoken

        yield tiktoken, True
        return
    # the pandas_udf closure captures the ENCODER OBJECT; ship the fake
    # module's code to Spark's python workers by value, not by reference
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(fake_tiktoken)
    monkeypatch.setitem(sys.modules, "tiktoken", fake_tiktoken)
    yield fake_tiktoken, False
    cloudpickle.unregister_pickle_by_value(fake_tiktoken)


@pytest.fixture()
def with_fake_tiktoken(active_tiktoken):
    """Tests pinned to the FAKE's specific counts skip under the real
    library (its counts differ by design)."""
    mod, is_real = active_tiktoken
    if is_real:
        pytest.skip("real tiktoken present; fake-specific counts don't apply")
    yield


def test_count_udf_matches_golden_through_spark(spark, active_tiktoken):
    """Spark-UDF counts must equal the active encoder's driver-side counts
    on the documents fixture — plumbing parity regardless of which encoder
    is importable. The committed golden is additionally pinned when it was
    produced by the active encoder kind; under a REAL tiktoken with a
    fake-produced golden the test flags the stale file instead of silently
    skipping (regenerate via scripts/make_tiktoken_golden.py)."""
    import duckdb
    from pyspark.sql import functions as F

    from vectrekker_spark.functions.tokenize import (
        tiktoken_available,
        tiktoken_count_udf,
    )

    mod, is_real = active_tiktoken
    assert tiktoken_available()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {
        str(r["doc_id"]): r["n"]
        for r in docs.select(
            "doc_id", tiktoken_count_udf()(F.col("text")).alias("n")
        ).collect()
    }
    enc = mod.get_encoding("cl100k_base")
    rows = duckdb.sql(
        "select doc_id, text from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    driver_counts = {str(d): len(enc.encode(t or "")) for d, t in rows}
    assert out == driver_counts  # Spark plumbing ≡ driver-side encoder

    with open(GOLDEN) as f:
        gold = json.load(f)
    golden_is_real = gold["encoder"] == "tiktoken"
    if golden_is_real == is_real:
        assert out == {k: int(v) for k, v in gold["counts"].items()}
    else:
        pytest.fail(
            "golden encoder kind doesn't match the importable tiktoken — "
            "regenerate: python scripts/make_tiktoken_golden.py"
        )


def test_gate_switches_off_the_proxy_when_tiktoken_imports(
    spark, with_fake_tiktoken
):
    # one 12-char word: the proxy counts 1 token, the fake's 4-char piece
    # rule counts 3 — the gate must report 3 (i.e. it took the UDF branch)
    from pyspark.sql import functions as F

    from vectrekker_spark.functions.tokenize import (
        bpe_like_token_count,
        gate_token_count,
    )

    df = spark.createDataFrame(
        [(1, "unbelievable"), (2, None)], "doc_id int, text string"
    )
    rows = {
        r["doc_id"]: (r["gate"], r["proxy"])
        for r in df.select(
            "doc_id",
            gate_token_count(F.col("text")).alias("gate"),
            bpe_like_token_count(F.col("text")).alias("proxy"),
        ).collect()
    }
    assert rows[1] == (3, 1)  # tiktoken path, provably not the proxy
    assert rows[2] == (0, None)  # null text: 0 tokens via encode_batch(["" ])


def test_8191_gate_quarantines_on_tiktoken_counts(
    spark, tmp_path, with_fake_tiktoken
):
    """The reference hard-asserts <8191 cl100k tokens (main.py:175,178); our
    pipeline routes offenders to quarantine. Craft a doc the PROXY would
    wave through (one giant alnum run = 1 proxy token) but whose tiktoken
    count is 10000 — only the real-path gate quarantines it."""
    from vectrekker_spark.pipeline import PipelineConfig, run_pipeline

    content = tmp_path / "content"
    content.mkdir()
    (content / "ok.md").write_text("short document well under the gate")
    (content / "huge.md").write_text("a" * 40_000)  # fake: ceil(40000/4)=10000
    cfg = PipelineConfig(
        content_dir=str(content),
        state_path=str(tmp_path / "state.parquet"),
        index_path=str(tmp_path / "index.parquet"),
        quarantine_path=str(tmp_path / "quarantine.parquet"),
    )
    r = run_pipeline(spark, cfg)
    assert r["quarantined"] == 1 and r["indexed"] == 1
    q = spark.read.parquet(cfg.quarantine_path).collect()
    assert len(q) == 1 and q[0]["n_tokens"] == 10_000
    assert q[0]["path"].endswith("huge.md")

# QA tail: excluded from the default run (see pytest.ini header)
pytestmark = pytest.mark.slow
