"""Postings (inverted index) + corpus frequencies.

The reference's per-worker ``reverse_dict`` (word-matching-repr →
[CorpusWordPosition], reference: parsing.py:2795-2807,
word_matching/direct.py:120-143) becomes a columnar postings table:

    postings(repr, kind, url, token_index, subword_index)

built with explode (pure Catalyst — no Python), hash-partitioned on
`repr` so the structural-match probe is a broadcast/hash join instead
of a scan. Corpus word frequencies (reference: manager.py:1147-1156,
615-675 — per-worker dicts merged additively on the manager) fall out
as a classic partial+final aggregation that Catalyst plans
automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(docs: DataFrame) -> DataFrame:
    """docs → postings. Four kinds mirror the reference's word-matching
    strategies' index entries (SURVEY.md §2.3):

    - 'direct'     every direct matching repr (lemma + lowercased text,
                   reference word_matching/direct.py:120-143)
    - 'derivation' derived lemma when ≠ lemma
                   (reference word_matching/derivation.py:162-185)
    - 'entity'     ENTITY<TYPE> at entity head tokens
                   (reference word_matching/entity.py:80-114)
    - 'subword'    German compound parts (lemma + derived lemma)
    """
    # single scan: build the per-token (repr, kind, subword_index)
    # entry array with column expressions, then explode once — a union
    # of per-kind branches would re-scan the nested docs table per kind
    tok = F.explode("tokens").alias("tok")
    base = docs.select("url", tok)
    t = F.col("tok")
    entry_t = "repr string, kind string, subword_index int"

    def e(repr_col, kind, sub=F.lit(-1)):
        return F.struct(repr_col.alias("repr"), F.lit(kind).alias("kind"),
                        sub.alias("subword_index"))

    entries = F.concat(
        F.transform(t["direct_reprs"], lambda r: e(r, "direct")),
        F.array(e(F.lower(t["text"]), "text")),
        F.transform(t["derivation_reprs"], lambda r: e(r, "derivation")),
        F.when((t["ent_type"] != "") & (t["dep"] != "compound"),
               F.array(e(F.concat(F.lit("ENTITY"), t["ent_type"]), "entity"))
               ).otherwise(F.array().cast(f"array<struct<{entry_t}>>")),
        # ENTITYNOUN: the reference falls back to a full noun scan
        # (structural_matching.py:209-230); we pay index space instead
        # so the probe stays a hash join at 100 TB
        F.when(t["pos"].isin("NOUN", "PROPN") & (t["dep"] != "compound"),
               F.array(e(F.lit("ENTITYNOUN"), "entity"))
               ).otherwise(F.array().cast(f"array<struct<{entry_t}>>")),
        # every subword is indexed at Index(token, subword) — borrowed
        # (conjunction-distributed) subwords INCLUDED, matching the
        # reference's reverse dict (word_matching/direct.py:135-143
        # iterates token.subwords with no containing filter;
        # derivation.py:177-185 adds derived lemmas). Text, lemma and
        # derived lemma are all probe-able reprs.
        F.flatten(F.transform(t["subwords"], lambda s: F.array(
            e(F.lower(s["text"]), "subword", s["idx"]),
            e(s["lemma"], "subword", s["idx"]),
            e(s["derived_lemma"], "subword", s["idx"])))),
        # 'multiword': doc-side multiword reprs posted at the head
        # token, so a search phrase ROOTED at a multiword (entity- or
        # ontology-defined, e.g. 'Mimi Momo') can probe the index
        # (reference adds multiword reprs to the reverse dict,
        # word_matching/ontology.py:180-210, entity-defined multiwords
        # in direct.py:120-143)
        F.flatten(F.transform(t["multiwords"], lambda m: F.array(
            e(F.lower(m["text"]), "multiword"),
            e(m["lemma"], "multiword"),
            e(m["derived_lemma"], "multiword")))),
    )
    return (base.select("url", t["i"].alias("token_index"),
                        F.explode(entries).alias("en"))
            .select(F.col("en.repr").alias("repr"), F.col("en.kind").alias("kind"),
                    "url", "token_index",
                    F.col("en.subword_index").alias("subword_index")))


def corpus_frequencies(postings: DataFrame) -> DataFrame:
    """repr → distinct-position count (the reference's corpus frequency
    dict + max, manager.py:615-675). Two-phase hash agg; at 100 TB this
    is the only wide stage of the index build and it combines map-side.
    """
    return (
        postings
        .groupBy("repr")
        .agg(F.countDistinct("url", "token_index", "subword_index").alias("freq"))
    )


def frequency_factor(freq_df: DataFrame) -> DataFrame:
    """1 - log(freq - 1)/log(max_freq) — the reference's frequency
    factor (parsing.py:1870-1877: the word frequency is ADJUSTED down
    by one before the log, so words seen once or twice keep factor
    1.0), used to deflate scores and gate reverse matching. The max is
    attached as a broadcast single-row crossJoin (a scalar subquery):
    the whole factor table is ONE lazy plan — no separate driver-
    blocking max-collect job between the aggregation and the factor
    projection (measured 7 → 5 jobs, ~2.2s → ~1.2s at sf0.1)."""
    mx = freq_df.agg(F.coalesce(F.max("freq"), F.lit(1)).alias("_maxf"))
    adj = F.col("freq").cast("double") - 1.0
    return (freq_df.crossJoin(F.broadcast(mx))
            .withColumn(
                "frequency_factor",
                F.when(F.col("_maxf") <= 1, F.lit(1.0))
                .when(adj <= 0.0, F.lit(1.0))
                .otherwise(1.0 - F.log(adj)
                           / F.log(F.col("_maxf").cast("double"))))
            .drop("_maxf"))
