"""Deterministic tokenization + sentence segmentation.

One rule, three mirrors (Python / Spark column expression / DuckDB SQL)
so tokenization-level aggregates are oracle-checkable:

    TOKEN RULE: pad the punctuation class [.,!?;:()"-] with spaces, then
    split on whitespace, dropping empties and bare hyphens.

    Hyphens are word separators and never tokens: "cat-chasing" yields
    ["cat", "chasing"].  This mirrors the reference's English hyphen
    normalization (lang/en/language_specific_rules.py:799-807 replaces
    internal hyphens with spaces in matching reprs); the parser
    additionally records which token pairs were hyphen-joined via
    ``tokenize_with_joins`` so hyphenated participle compounds
    ("cat-chasing dog") can emit advmodobj/advmodsubj deps.

    SENTENCE RULE: sentences end at '.', '!' or '?'.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PUNCT_CLASS = r'([.,!?;:()"-])'
_PUNCT_RE = re.compile(_PUNCT_CLASS)
_WORD_PUNCT_RE = re.compile(r'([.,!?;:()"])')  # '-' handled separately
_WS_RE = re.compile(r"\s+")
SENT_END = {".", "!", "?"}


def tokenize(text: str) -> list[str]:
    """Python mirror (used inside pandas UDFs)."""
    padded = _PUNCT_RE.sub(r" \1 ", text)
    return [t for t in _WS_RE.split(padded.strip()) if t and t != "-"]


def tokenize_with_joins(text: str) -> tuple[list[str], list[bool]]:
    """Same token stream as :func:`tokenize`, plus a parallel flag list:
    ``joins[k]`` is True when token *k* was joined to token *k-1* by a
    hyphen inside one whitespace word ("cat-chasing" → cat, chasing
    with joins [False, True])."""
    padded = _WORD_PUNCT_RE.sub(r" \1 ", text)
    toks: list[str] = []
    joins: list[bool] = []
    for w in _WS_RE.split(padded.strip()):
        if not w:
            continue
        prev_in_word = False
        for p in w.split("-"):
            if not p:
                continue
            toks.append(p)
            joins.append(prev_in_word)
            prev_in_word = True
    return toks, joins


def tokenize_spark(col: Column) -> Column:
    """Spark mirror: array<string> of tokens of ``col``."""
    padded = F.regexp_replace(col, _PUNCT_CLASS, r" $1 ")
    return F.filter(
        F.split(F.trim(padded), r"\s+"),
        lambda t: (t != F.lit("")) & (t != F.lit("-")),
    )


def tokenize_sql(col: str) -> str:
    """DuckDB SQL mirror: list of tokens of ``col``."""
    return (
        f"list_filter(string_split_regex(trim(regexp_replace({col}, "
        f"'([.,!?;:()\"-])', ' \\1 ', 'g')), '\\s+'), "
        f"_tk -> _tk <> '' AND _tk <> '-')"
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
