"""Deterministic tokenization + sentence segmentation.

One rule, three mirrors (Python / Spark column expression / DuckDB SQL)
so tokenization-level aggregates are oracle-checkable:

    TOKEN RULE: pad the punctuation class [.,!?;:()"] with spaces, then
    split on whitespace, dropping empties.

    SENTENCE RULE: sentences end at '.', '!' or '?'.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PUNCT_CLASS = r'([.,!?;:()"])'
_PUNCT_RE = re.compile(_PUNCT_CLASS)
_WS_RE = re.compile(r"\s+")
SENT_END = {".", "!", "?"}


def tokenize(text: str) -> list[str]:
    """Python mirror (used inside pandas UDFs)."""
    padded = _PUNCT_RE.sub(r" \1 ", text)
    return [t for t in _WS_RE.split(padded.strip()) if t]


def tokenize_spark(col: Column) -> Column:
    """Spark mirror: array<string> of tokens of ``col``."""
    padded = F.regexp_replace(col, _PUNCT_CLASS, r" $1 ")
    return F.filter(
        F.split(F.trim(padded), r"\s+"), lambda t: t != F.lit("")
    )


def tokenize_sql(col: str) -> str:
    """DuckDB SQL mirror: list of tokens of ``col``."""
    return (
        f"list_filter(string_split_regex(trim(regexp_replace({col}, "
        f"'([.,!?;:()\"])', ' \\1 ', 'g')), '\\s+'), _tk -> _tk <> '')"
    )


def sentences(tokens: list[str]) -> list[list[str]]:
    """Split a token list into sentences (terminator kept with its
    sentence). Mirrors the reference's per-sentence match scoping
    (reference: structural_matching.py:821-880 reports sentence spans).
    """
    out: list[list[str]] = []
    cur: list[str] = []
    for t in tokens:
        cur.append(t)
        if t in SENT_END:
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return out
