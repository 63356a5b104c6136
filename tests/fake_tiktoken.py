"""A deterministic stand-in for the `tiktoken` module (cl100k_base).

The container cannot install tiktoken (and cl100k's BPE ranks file is a
network download), so REAL cl100k counts cannot be produced here. This fake
implements the exact module surface `tiktoken_count_udf` touches —
``get_encoding("cl100k_base").encode_batch(list[str]) -> list[list[int]]`` —
with a fully-specified tokenization that is deliberately DIFFERENT from the
BPE-ish regex proxy (`bpe_like_token_count`), so a test that sees fake
counts has proven the real-tiktoken code path ran, not the fallback.

Fake tokenization spec (frozen; the golden file pins it):
  - alphanumeric runs are split into pieces of at most 4 characters
    (the proxy counts a whole letter run as ONE token, so counts differ
    on any word longer than 4 chars),
  - every other non-whitespace character is one token,
  - whitespace produces no tokens,
  - token ids are byte-length-stable hashes of the piece (the counter only
    uses len(), but ids are deterministic so encode() output is too).

Tests inject this module as ``sys.modules["tiktoken"]`` (driver side — the
pandas_udf closure captures the ENCODER OBJECT, which pyspark's cloudpickle
ships to workers by value via register_pickle_by_value in the test).
"""

from __future__ import annotations

import re
import zlib

_PIECES = re.compile(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]")


class _FakeEncoding:
    name = "cl100k_base"

    def encode(self, text: str) -> list[int]:
        # crc32, not hash(): str hash is per-process randomized, and the
        # driver and Spark's python workers must agree on encode() output
        return [zlib.crc32(p.encode("utf-8")) for p in _PIECES.findall(text)]

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        return [self.encode(t) for t in texts]


def get_encoding(name: str) -> _FakeEncoding:
    if name != "cl100k_base":
        raise ValueError(f"fake tiktoken only models cl100k_base, got {name!r}")
    return _FakeEncoding()


def fake_count(text: str | None) -> int:
    """Driver-side reference count (what the golden file records)."""
    return 0 if text is None else len(_PIECES.findall(text))
