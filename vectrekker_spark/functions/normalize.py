"""Text normalization for crawl corpora: the pre-dedup cleanup stage every
real pipeline runs before hashing anything (C4/CCNet normalize before
dedup; ftfy's mojibake repair is standard ahead of quality scoring).

Two tiers, same division of labor as functions/html.py:

- ``normalize_ws`` — pure Catalyst COLUMN expression (the 100 TB hot
  path): CRLF/CR → LF, C0 control chars (except tab/newline) + DEL
  stripped, space/tab runs collapsed to one space, spaces trimmed around
  newlines, 3+ blank-line runs collapsed to one blank line, leading and
  trailing ASCII whitespace trimmed. Every rule is a Java-regex
  ``regexp_replace`` with an EXPLICIT character class (never ``\\s`` —
  Java's is ASCII, Python's is unicode; explicit classes make the Python
  mirror exact by construction).
- ``normalize_text_exact`` — Arrow-batched pandas_udf adding what an
  expression can't do: unicode NFKC (or NFC) normalization via stdlib
  unicodedata and conservative mojibake repair, then the SAME whitespace
  rules. On ASCII-clean text the two tiers are property-tested equal.

Mojibake repair (``fix_mojibake_str``) is deliberately conservative —
it never corrupts text it doesn't understand:

1. attempt only when a UTF-8-as-cp1252 lead-byte image is present
   ('Ã' 'Â' 'â' 'ð' — the cp1252 faces of 0xC3/0xC2/0xE2/0xF0);
2. the whole string must STRICTLY round-trip encode(cp1252|latin-1) →
   decode(utf-8) — any error leaves the text unchanged;
3. the fix is accepted only if it strictly REDUCES the count of
   lead-byte artifact characters — legit text containing 'Ã' can
   round-trip by coincidence but never gets "fixed" into more artifacts;
4. at most two passes (double-encoded text needs two, anything deeper
   is unrecoverable garbage anyway).

``compression_ratio`` is the cheap spam/repetition signal (used by
Gopher-style quality stacks): zlib-compressed bytes / raw bytes — spam
and templated text compress far below prose (~0.3 vs ~0.55). One
zero-shuffle Arrow map; pairs with operators/repetition.py's exact
metrics as the coarse first gate.

Reference scope note: the reference (vectrekker/main.py) reads files
verbatim with no normalization; north-star pipeline addition.
"""

from __future__ import annotations

import re
import unicodedata
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — applied in order; Java and Python regex agree
# on every construct used here (explicit classes, no \s, no lookaround)
_WS_RULES: tuple[tuple[str, str], ...] = (
    (r"\r\n?", "\n"),
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""),
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^[ \n]+|[ \n]+$", ""),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_ws(col: Column | str) -> Column:
    """Catalyst whitespace/control normalization (see module docstring
    for the exact rule list). NULL-safe: NULL stays NULL."""
    c = _c(col)
    for pat, repl in _WS_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def normalize_ws_str(s: str | None) -> str | None:
    """The exact Python mirror of ``normalize_ws`` (shared by the exact
    tier and the tests' oracle)."""
    if s is None:
        return None
    for pat, repl in _WS_RULES:
        s = re.sub(pat, repl, s)
    return s


# cp1252/latin-1 faces of the UTF-8 LEAD bytes 0xC3/0xC2/0xE2/0xF0 — the
# chars every 2-/3-/4-byte mojibake sequence starts with. The acceptance
# rule counts ONLY these: counting continuation-byte images too would
# penalize the repaired output itself (a fixed '’' or '—' is a legit char,
# but lives in the same high-latin block the artifacts do).
_MOJI_LEADS = ("Ã", "Â", "â", "ð")


def _susp_count(s: str) -> int:
    return sum(s.count(lead) for lead in _MOJI_LEADS)


def fix_mojibake_str(s: str | None) -> str | None:
    """Repair UTF-8-decoded-as-cp1252/latin-1 text (see module docstring
    for the conservative acceptance contract)."""
    if s is None:
        return None
    for _ in range(2):
        if not any(lead in s for lead in _MOJI_LEADS):
            break
        try:
            b = s.encode("cp1252")
        except UnicodeEncodeError:
            try:
                b = s.encode("latin-1")
            except UnicodeEncodeError:
                break
        try:
            fixed = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if _susp_count(fixed) >= _susp_count(s):
            break
        s = fixed
    return s


def normalize_text_str(
    s: str | None, form: str = "NFKC", fix_encoding: bool = True
) -> str | None:
    """Full normalization of one string: mojibake → unicode ``form`` →
    whitespace rules. The exact tier's kernel and the tests' oracle."""
    if s is None:
        return None
    if fix_encoding:
        s = fix_mojibake_str(s)
    s = unicodedata.normalize(form, s)
    return normalize_ws_str(s)


def normalize_text_exact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text",
    form: str = "NFKC",
    fix_encoding: bool = True,
) -> DataFrame:
    """Arrow-batched full normalization (mojibake repair + unicode
    ``form`` + the normalize_ws rules). ``form`` ∈ NFC/NFKC/NFD/NFKD."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be a unicodedata form, got {form!r}")

    def _norm(s):
        return s.map(lambda v: normalize_text_str(v, form, fix_encoding))

    _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_norm, "string")
    return df.withColumn(out_col, udf(F.col(text_col)))


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """All input columns + ``out_col: double`` — zlib(level)-compressed
    bytes / UTF-8 bytes (NULL text → NULL; empty text → NULL, a 0-byte
    doc has no meaningful ratio). Spam/templated text sits far below
    prose; gate with e.g. ``< 0.25`` alongside operators/repetition."""
    if not 1 <= level <= 9:
        raise ValueError(f"zlib level must be in [1, 9], got {level}")

    def _ratio(s):
        def one(v):
            if v is None or v == "":
                return None
            raw = v.encode("utf-8")
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    _ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_ratio, "double")
    return df.withColumn(out_col, udf(F.col(text_col)))
