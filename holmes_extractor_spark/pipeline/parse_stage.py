"""Parse stage: pages → docs (Arrow-batched, mapInPandas).

The expensive stage (the reference's spaCy+holmes pipe per document,
reference: manager.py:375-384, parsing.py:974-1042). One Python call
per Arrow batch of documents; all ~14 normalization passes are
doc-local so this stage has NO shuffle — it is a pure narrow map and
scales linearly with executors.

Skew note (north rule): document *length* is the skew axis here, not a
join key. ``repartition(salt)`` in run_pipeline spreads long-document
hosts; at cluster scale the same column feeds AQE.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import types as T

from .. import PARSER_VERSION
from ..nlp.parser import parse_document
from ..pipeline.phraselets import extract_candidate_edges, extract_word_phraselets
from ..schema import DOCS, EDGES, WORDS

# fused-parse output: docs plus the per-doc candidate-edge / word-
# phraselet rows as nested arrays, extracted in the SAME Python pass
# that parsed the document (guide §4/§8: decode once — the nested
# tokens/deps never re-cross the JVM↔Python boundary for extraction;
# edges/words become pure JVM explodes)
_EDGE_FIELDS = [f for f in EDGES.fields if f.name not in ("url", "lang")]
_WORD_FIELDS = [f for f in WORDS.fields if f.name not in ("url", "lang")]
DOCS_FULL = T.StructType(list(DOCS.fields) + [
    T.StructField("cand_edges", T.ArrayType(T.StructType(_EDGE_FIELDS))),
    # question-mode rows differ (initial question words emit question
    # templates instead of literal matching-only rows), so they are a
    # separate array, not a flag on cand_edges
    T.StructField("cand_edges_q", T.ArrayType(T.StructType(_EDGE_FIELDS))),
    T.StructField("word_rows", T.ArrayType(T.StructType(_WORD_FIELDS))),
])
_EDGE_NAMES = [f.name for f in _EDGE_FIELDS]


def _parse_batches(batches: Iterator[pd.DataFrame],
                   ontology_multiwords: frozenset[str] | None = None
                   ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["text"]):
            parsed = parse_document(
                text, lang, ontology_multiwords=ontology_multiwords)
            rows.append({
                "url": url,
                "lang": lang,
                "parser_version": PARSER_VERSION,
                "n_tokens": len(parsed["tokens"]),
                "text": text,
                "tokens": parsed["tokens"],
                "deps": parsed["deps"],
            })
        yield pd.DataFrame(rows, columns=["url", "lang", "parser_version",
                                          "n_tokens", "text", "tokens",
                                          "deps"])


def parse_pages(pages: DataFrame,
                ontology_multiwords: frozenset[str] | None = None
                ) -> DataFrame:
    """pages(url, text, lang) → docs table (schema.DOCS).
    ``ontology_multiwords`` ships the loaded ontology's multiword
    entries to the executors (tiny closure capture — the reference
    indexes ontology multiwords at parse time,
    word_matching/ontology.py:180-210)."""
    from functools import partial
    fn = (partial(_parse_batches, ontology_multiwords=ontology_multiwords)
          if ontology_multiwords else _parse_batches)
    return (
        pages.select("url", "lang", "text")
        .mapInPandas(fn, schema=DOCS)
    )


def _parse_full_batches(batches: Iterator[pd.DataFrame],
                        ontology_multiwords: frozenset[str] | None = None
                        ) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in DOCS_FULL.fields]
    for pdf in batches:
        rows = []
        for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["text"]):
            parsed = parse_document(
                text, lang, ontology_multiwords=ontology_multiwords)
            edges = [{k: e[k] for k in _EDGE_NAMES}
                     for e in extract_candidate_edges(parsed, lang)]
            edges_q = [{k: e[k] for k in _EDGE_NAMES}
                       for e in extract_candidate_edges(
                           parsed, lang, include_questions=True)]
            words = [{"word": w["word"], "label": w["label"],
                      "idx": w["idx"], "negated": w["negated"],
                      "any_tag": w["any_tag"],
                      "span_start": w["span_start"],
                      "span_end": w["span_end"],
                      "subword_idx": w.get("subword_idx", -1)}
                     for w in extract_word_phraselets(
                         parsed, lang, match_all_words=True,
                         per_occurrence=True)]
            rows.append({
                "url": url,
                "lang": lang,
                "parser_version": PARSER_VERSION,
                "n_tokens": len(parsed["tokens"]),
                "text": text,
                "tokens": parsed["tokens"],
                "deps": parsed["deps"],
                "cand_edges": edges,
                "cand_edges_q": edges_q,
                "word_rows": words,
            })
        yield pd.DataFrame(rows, columns=cols)


def parse_pages_full(pages: DataFrame,
                     ontology_multiwords: frozenset[str] | None = None
                     ) -> DataFrame:
    """pages → docs_full (schema.DOCS columns + nested cand_edges /
    cand_edges_q / word_rows): parse + edge + word extraction fused in
    one Python stage. Downstream edge/word tables are column-pruned
    explodes — no second trip of tokens/deps through Arrow."""
    from functools import partial
    fn = (partial(_parse_full_batches,
                  ontology_multiwords=ontology_multiwords)
          if ontology_multiwords else _parse_full_batches)
    return (
        pages.select("url", "lang", "text")
        .mapInPandas(fn, schema=DOCS_FULL)
    )


def edges_from_docs_full(docs_full: DataFrame, q: bool = False) -> DataFrame:
    """Nested candidate edges → EDGES-shaped frame (pure Catalyst
    explode; narrow, no Python)."""
    col = "cand_edges_q" if q else "cand_edges"
    return (docs_full.select("url", "lang", F.explode(col).alias("e"))
            .select("url", "lang",
                    *[F.col(f"e.{n}").alias(n) for n in _EDGE_NAMES]))


def words_from_docs_full(docs_full: DataFrame) -> DataFrame:
    """Nested word-phraselet rows → WORDS-shaped frame (pure Catalyst
    explode)."""
    names = [f.name for f in _WORD_FIELDS]
    return (docs_full.select("url", "lang", F.explode("word_rows").alias("w"))
            .select("url", "lang",
                    *[F.col(f"w.{n}").alias(n) for n in names]))


def _docs_to_parsed(row_tokens, row_deps) -> dict:
    """Rebuild the parse dict from columnar docs arrays (Arrow gives
    arrays of dicts back)."""
    return {"tokens": [dict(t) for t in row_tokens],
            "deps": [dict(d) for d in row_deps]}


def _edges_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in EDGES.fields]
    for pdf in batches:
        rows = []
        for url, lang, toks, deps in zip(pdf["url"], pdf["lang"],
                                         pdf["tokens"], pdf["deps"]):
            parsed = _docs_to_parsed(toks, deps)
            for e in extract_candidate_edges(parsed, lang):
                e = dict(e)
                e["url"] = url
                e["lang"] = lang
                rows.append(e)
        yield pd.DataFrame(rows, columns=cols)


def extract_edges(docs: DataFrame) -> DataFrame:
    """docs → candidate_edges (one row per relation-phraselet instance,
    SURVEY.md §2.5). Narrow map — no shuffle."""
    return docs.select("url", "lang", "tokens", "deps").mapInPandas(
        _edges_batches, schema=EDGES)


def _edges_q_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in EDGES.fields]
    for pdf in batches:
        rows = []
        for url, lang, toks, deps in zip(pdf["url"], pdf["lang"],
                                         pdf["tokens"], pdf["deps"]):
            parsed = _docs_to_parsed(toks, deps)
            for e in extract_candidate_edges(parsed, lang,
                                             include_questions=True):
                e = dict(e)
                e["url"] = url
                e["lang"] = lang
                rows.append(e)
        yield pd.DataFrame(rows, columns=cols)


def extract_edges_q(docs: DataFrame) -> DataFrame:
    """Question-mode extraction (process_initial_question_words=True,
    reference parsing.py:2147-2160): relation edges PLUS question-
    template edges (head-WHsubj/WHadv/…)."""
    return docs.select("url", "lang", "tokens", "deps").mapInPandas(
        _edges_q_batches, schema=EDGES)


def _fused_edges_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in EDGES.fields]
    for pdf in batches:
        data: dict[str, list] = {c: [] for c in cols}
        for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["text"]):
            parsed = parse_document(text, lang)
            for e in extract_candidate_edges(parsed, lang):
                data["url"].append(url)
                data["lang"].append(lang)
                for k in cols:
                    if k not in ("url", "lang"):
                        data[k].append(e[k])
        yield pd.DataFrame(data, columns=cols)


def extract_edges_fused(pages: DataFrame) -> DataFrame:
    """pages → candidate_edges in ONE python stage (parse + extract
    fused). Skips materializing the nested docs schema through Arrow —
    the fast path when only triples are needed (the docs table is still
    the checkpointable artifact for match/posting queries)."""
    return pages.select("url", "lang", "text").mapInPandas(
        _fused_edges_batches, schema=EDGES)


def _words_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in WORDS.fields]
    for pdf in batches:
        rows = []
        for url, lang, toks, deps in zip(pdf["url"], pdf["lang"],
                                         pdf["tokens"], pdf["deps"]):
            parsed = _docs_to_parsed(toks, deps)
            for w in extract_word_phraselets(parsed, lang,
                                             match_all_words=True,
                                             per_occurrence=True):
                rows.append({"url": url, "lang": lang, "word": w["word"],
                             "label": w["label"], "idx": w["idx"],
                             "negated": w["negated"],
                             "any_tag": w["any_tag"],
                             "span_start": w["span_start"],
                             "span_end": w["span_end"],
                             "subword_idx": w.get("subword_idx", -1)})
        yield pd.DataFrame(rows, columns=cols)


def extract_words(docs: DataFrame) -> DataFrame:
    """docs → single-word phraselets (template 'word')."""
    return docs.select("url", "lang", "tokens", "deps").mapInPandas(
        _words_batches, schema=WORDS)


def with_salt(df: DataFrame, buckets: int = 64) -> DataFrame:
    """Salted repartition column for host-level skew (north rule):
    xxhash64(url) is uniform across hosts regardless of per-host page
    counts."""
    return df.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(buckets)))
