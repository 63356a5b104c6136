"""Tokenization (SURVEY.md §2.1 T1/T2, §2.2 L5).

The reference tokenizes with tiktoken cl100k_base and hard-asserts <8191
tokens (`vectrekker/main.py:170,175,178`). tiktoken is not in this
container, so:

- `bpe_like_token_count` — the default: a BPE-ish regex token count (pure
  Catalyst expression, oracle-checkable, ~cl100k-magnitude counts)
- `tiktoken_count_udf` — the real thing, gated on the library importing;
  Arrow pandas_udf, batched (vs the reference's per-file loop)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Contractions / words / numbers / non-space symbols — a simplified cousin of
# the cl100k pretokenizer pattern (public knowledge from the tiktoken docs).
# No lookarounds: both Java regex (Spark) and RE2 (DuckDB) must agree.
# Alternation order puts letter-runs (the common case) first so Java's NFA
# fails fewer alternatives per position (~1.7× faster than contraction-first
# on English text). Count-equivalent to contraction-first under leftmost-
# first matching in BOTH engines: an apostrophe can never start a letter/
# digit run, and a letter can never start the contraction alternative, so
# the same positions match the same alternatives.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|'(?:s|t|re|ve|m|ll|d)|[^A-Za-z0-9\s]"


def bpe_like_token_count(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    # regexp_count, not size(regexp_extract_all(...)): counting matches
    # without materializing the match array is ~2× cheaper on long docs.
    return F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).cast("int")


def tiktoken_available() -> bool:
    try:
        import tiktoken  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def tiktoken_count_udf():
    """Arrow-batched cl100k_base token counter. Raises ImportError when
    tiktoken is absent — callers should fall back to bpe_like_token_count.

    pandas must be a MODULE-level import: with ``from __future__ import
    annotations`` the `pd.Series` hints are strings that pandas_udf's
    signature inference resolves against the module globals — a
    function-local ``import pandas`` left them unresolvable and the UDF
    construction raised UNSUPPORTED_SIGNATURE (caught by the fake-encoder
    parity test, tests/test_tiktoken_parity.py)."""
    import tiktoken  # noqa: PLC0415

    enc = tiktoken.get_encoding("cl100k_base")

    def count(texts: pd.Series) -> pd.Series:
        # null-safe: encode_batch rejects None; null text counts 0 tokens
        return pd.Series(
            [len(x) for x in enc.encode_batch([t or "" for t in texts])]
        )

    return F.pandas_udf(count, "int")


def gate_token_count(text: Column | str) -> Column:
    """Token count for the reference's 8191-token limit
    (vectrekker/main.py:175,178) — that limit is a *BPE*-token limit, and
    whitespace tokens undercount it ~1.3-2× on English (worse on code), so
    the gate must never count whitespace tokens. Chain: exact tiktoken when
    the library is importable, else the BPE-like proxy."""
    if tiktoken_available():
        t = F.col(text) if isinstance(text, str) else text
        return tiktoken_count_udf()(t)
    return bpe_like_token_count(text)
