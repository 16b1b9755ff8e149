"""Text analysis ops over the `documents` table: token counting,
language identification, quality scoring, rolling-hash fingerprints,
SimHash signatures.

All JVM-side column expressions (whole-stage codegen — zero Python in
the hot path), each with a DuckDB SQL mirror for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..nlp.lexicon import LANGID_STOPWORDS
from ..nlp.tokenizer import tokenize_spark, tokenize_sql
from . import P_MOD, token_val_spark, token_val_sql

# --------------------------------------------------------- token count

def token_counts(documents: DataFrame) -> DataFrame:
    toks = tokenize_spark(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(F.transform(toks, F.lower))).alias("n_distinct_tokens"),
    )


def token_counts_sql() -> str:
    toks = tokenize_sql("text")
    return f"""
SELECT doc_id,
       len({toks}) AS n_tokens,
       len(list_distinct(list_transform({toks}, t -> lower(t)))) AS n_distinct_tokens
FROM documents
ORDER BY doc_id
"""


# ----------------------------------------------------------- langid

def _lang_score(toks: Column, lang: str) -> Column:
    sw = LANGID_STOPWORDS[lang]
    arr = F.array(*[F.lit(s) for s in sw])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID; deterministic argmax with
    lexicographic tie-break on language code."""
    toks = tokenize_spark(F.col("text"))
    langs = sorted(LANGID_STOPWORDS)
    scored = documents.select(
        "doc_id", "lang",
        *[_lang_score(toks, lg).alias(f"score_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("unk")
    for lg in reversed(langs):  # earlier lang wins ties → apply last
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id", F.col("lang").alias("actual_lang"),
        F.when(best > 0, pred).otherwise(F.lit("unk")).alias("pred_lang"),
        best.alias("best_score"),
    )


def lang_id_sql() -> str:
    toks = tokenize_sql("text")
    langs = sorted(LANGID_STOPWORDS)
    score_exprs = []
    for lg in langs:
        lits = ",".join(f"'{s}'" for s in LANGID_STOPWORDS[lg])
        score_exprs.append(
            f"len(list_filter({toks}, t -> lower(t) IN ({lits}))) AS score_{lg}")
    best = "greatest(" + ",".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} THEN '{lg}'" for lg in langs) + " END"
    return f"""
SELECT doc_id, actual_lang,
       CASE WHEN {best} > 0 THEN {case} ELSE 'unk' END AS pred_lang,
       {best} AS best_score
FROM (
  SELECT doc_id, lang AS actual_lang, {", ".join(score_exprs)}
  FROM documents
)
ORDER BY doc_id
"""


# ------------------------------------------------------ quality score

def quality_scores(documents: DataFrame) -> DataFrame:
    """Deterministic quality heuristics: length, lexical diversity,
    mean token length — the standard web-text quality gates."""
    toks = tokenize_spark(F.col("text"))
    n = F.size(toks)
    nd = F.size(F.array_distinct(F.transform(toks, F.lower)))
    mean_len = F.round(F.length(F.col("text")).cast("double") / F.greatest(n, F.lit(1)), 4)
    diversity = F.round(nd.cast("double") / F.greatest(n, F.lit(1)), 4)
    return documents.select(
        "doc_id", n.alias("n_tokens"), diversity.alias("diversity"),
        mean_len.alias("mean_token_len"),
        F.round(diversity * F.least(n, F.lit(100)).cast("double"), 4).alias("quality"),
    )


def quality_scores_sql() -> str:
    toks = tokenize_sql("text")
    return f"""
SELECT doc_id,
       len({toks}) AS n_tokens,
       round(len(list_distinct(list_transform({toks}, t -> lower(t))))::DOUBLE
             / greatest(len({toks}), 1), 4) AS diversity,
       round(length(text)::DOUBLE / greatest(len({toks}), 1), 4) AS mean_token_len,
       round(round(len(list_distinct(list_transform({toks}, t -> lower(t))))::DOUBLE
             / greatest(len({toks}), 1), 4) * least(len({toks}), 100)::DOUBLE, 4) AS quality
FROM documents
ORDER BY doc_id
"""


# ------------------------------------------------------- fingerprint

def _token_val(t: Column) -> Column:
    return token_val_spark(t)


def fingerprints(documents: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint over the token stream:
    acc = (acc * 131 + token_val) mod P. Order-sensitive — two docs get
    the same fingerprint iff their token streams hash identically."""
    toks = tokenize_spark(F.lower(F.col("text")))
    fp = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * 131 + _token_val(t)) % P_MOD)
    return documents.select("doc_id", fp.alias("fingerprint"))


def fingerprints_sql() -> str:
    toks = tokenize_sql("lower(text)")
    tv = token_val_sql("t")
    return f"""
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT,
                                list_transform({toks}, t -> {tv}::BIGINT)),
                   (acc, x) -> (acc * 131 + x) % {P_MOD}) AS fingerprint
FROM documents
ORDER BY doc_id
"""


# ----------------------------------------------------------- simhash

SIMHASH_BITS = 16
_MULT = 40503  # 16-bit Knuth multiplicative constant


def simhash(documents: DataFrame) -> DataFrame:
    """16-bit SimHash over token hashes: bit b is 1 iff the sum of
    (+1/-1) votes from each token's hash bit b is positive. Near-dup
    docs differ in few bits (Hamming distance).

    Doc-local plan: the token-hash array is materialized once per row,
    then each bit's vote tally is an `aggregate` fold over that array
    (bit index unrolled at plan time). Zero shuffle, zero row blowup —
    the whole signature stays inside one whole-stage-codegen project,
    so the operator scales as a narrow map over the corpus."""
    toks = tokenize_spark(F.lower(F.col("text")))
    hs = F.transform(
        toks, lambda t: (_token_val(t).cast("long") * _MULT) % (2 ** SIMHASH_BITS))
    # zero-token docs have no votes and are absent from the signature
    # table (mirrors the oracle's unnest semantics)
    with_h = documents.select("doc_id", hs.alias("hs")).filter(F.size("hs") > 0)

    def vote(b: int):
        # +1 when hash bit b is set, −1 otherwise, folded over all tokens
        return F.aggregate(
            F.col("hs"), F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    sig = None
    for b in range(SIMHASH_BITS):
        bit = F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return with_h.select("doc_id", sig.alias("simhash"))


def simhash_sql() -> str:
    toks = tokenize_sql("lower(text)")
    tv = token_val_sql("t")
    return f"""
WITH th AS (
  SELECT doc_id, ({tv} * {_MULT}) % {2 ** SIMHASH_BITS} AS h
  FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM th CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS b)
),
agg AS (
  SELECT doc_id, b, CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS bit
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id, sum(bit << b)::BIGINT AS simhash
FROM agg GROUP BY doc_id ORDER BY doc_id
"""
