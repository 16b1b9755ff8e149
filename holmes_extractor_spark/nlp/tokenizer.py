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


_TOKEN_SPAN_RE = re.compile(r'[.,!?;:()"]|[^\s.,!?;:()"-]+')
_PUNCT_TOKENS = set('.,!?;:()"')


def tokenize_full(text: str) -> tuple[list[str], list[bool], list[int]]:
    """Token stream of :func:`tokenize` plus per-token metadata:

    - ``joins[k]`` — True when token *k* was joined to token *k-1* by a
      hyphen inside one whitespace word ("cat-chasing" → cat, chasing
      with joins [False, True]);
    - ``starts[k]`` — character offset of token *k* in the ORIGINAL
      text (the reference reports char-span word infos/answers in its
      topic match dicts, topic_matching.py:1288-1483 — spaCy keeps
      ``token.idx``; we keep the same offset through a span-preserving
      scan instead of the pad-and-split rule, which is token-stream
      equivalent: punctuation chars are single tokens, everything else
      splits on whitespace and hyphens).
    """
    toks: list[str] = []
    joins: list[bool] = []
    starts: list[int] = []
    prev_end = -1
    for m in _TOKEN_SPAN_RE.finditer(text):
        tok = m.group(0)
        gap = text[prev_end:m.start()] if prev_end >= 0 else ""
        join = (bool(gap) and set(gap) == {"-"}
                and tok not in _PUNCT_TOKENS
                and bool(toks) and toks[-1] not in _PUNCT_TOKENS)
        toks.append(tok)
        joins.append(join)
        starts.append(m.start())
        prev_end = m.end()
    return toks, joins, starts


def tokenize_with_joins(text: str) -> tuple[list[str], list[bool]]:
    """Back-compat wrapper over :func:`tokenize_full`."""
    toks, joins, _ = tokenize_full(text)
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
