"""Executor-Python twins of the engine's JVM tokenization.

Every Arrow kernel that tokenizes text in Python (minhash signatures,
Count-Min sketch, the hash embedder, span dedup) must split EXACTLY like
the Catalyst/DuckDB side it is verified or oracled against, or positions,
shingle sets, and counts silently diverge on real-world text:

- ``functions.text.tokens()`` is Spark ``split(trim(x), '\\s+')``: trim
  removes ONLY ASCII spaces and Java ``\\s`` is the ASCII class
  ``[ \\t\\n\\x0B\\f\\r]`` — so leading/trailing non-space whitespace
  yields boundary ``''`` tokens, and Unicode whitespace (U+00A0, U+2028,
  U+3000 — common in scraped web text) is TOKEN CONTENT.
- Python ``str.split()`` / ``re.split(r'\\s+', ...)`` split on Unicode
  whitespace and drop/strip differently — NOT equivalent.

The DuckDB oracle twin ``string_split_regex(trim(text), '\\s+')`` is RE2,
whose ``\\s`` is ``[ \\t\\n\\f\\r]`` — identical to Java except U+000B
(vertical tab), the one documented residual divergence (absent from every
fixture; Java semantics win here because in-engine verification paths use
``tokens()``).
"""

from __future__ import annotations

import re

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_JAVA_NON_WS = re.compile(r"[^ \t\n\x0b\f\r]+")


def java_tokens(text: str) -> list[str]:
    """Exact twin of ``functions.text.tokens()`` for every input: space-only
    trim, then ASCII-whitespace-run split with boundary empties preserved
    (``'\\tfoo'`` → ``['', 'foo']``), empty/space-only text → ``[]``."""
    s = text.strip(" ")
    return [] if s == "" else _JAVA_WS.split(s)


def java_words(text: str) -> list[str]:
    """Non-empty ASCII-whitespace-separated words: the twin of Java
    ``\\S+`` runs (``functions.text.token_count``) and of the oracle idiom
    ``unnest(string_split_regex(...)) ... WHERE t <> ''``."""
    return _JAVA_NON_WS.findall(text)
