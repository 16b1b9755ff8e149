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
    tok = F.explode("tokens").alias("tok")
    base = docs.select("url", tok).select(
        "url",
        F.col("tok.i").alias("token_index"),
        F.col("tok.dep").alias("dep"),
        F.col("tok.ent_type").alias("ent_type"),
        F.lower(F.col("tok.text")).alias("word_lower"),
        F.col("tok.pos").alias("pos"),
        F.col("tok.direct_reprs").alias("direct_reprs"),
        F.col("tok.derivation_reprs").alias("derivation_reprs"),
        F.col("tok.subwords").alias("subwords"),
    )
    direct = base.select(
        F.explode("direct_reprs").alias("repr"), F.lit("direct").alias("kind"),
        "url", "token_index", F.lit(-1).alias("subword_index"))
    text_kind = base.select(
        F.col("word_lower").alias("repr"), F.lit("text").alias("kind"),
        "url", "token_index", F.lit(-1).alias("subword_index"))
    deriv = base.select(
        F.explode("derivation_reprs").alias("repr"),
        F.lit("derivation").alias("kind"),
        "url", "token_index", F.lit(-1).alias("subword_index"))
    entity = base.filter((F.col("ent_type") != "") & (F.col("dep") != "compound")).select(
        F.concat(F.lit("ENTITY"), "ent_type").alias("repr"),
        F.lit("entity").alias("kind"),
        "url", "token_index", F.lit(-1).alias("subword_index"))
    # ENTITYNOUN: the reference falls back to a full noun scan
    # (structural_matching.py:209-230); we pay index space instead so
    # the probe stays a hash join at 100 TB
    entity_noun = base.filter((F.col("pos").isin("NOUN", "PROPN"))
                              & (F.col("dep") != "compound")).select(
        F.lit("ENTITYNOUN").alias("repr"), F.lit("entity").alias("kind"),
        "url", "token_index", F.lit(-1).alias("subword_index"))
    sub = base.select(
        "url", "token_index", F.explode("subwords").alias("sw")).select(
        F.col("sw.lemma").alias("repr"), F.lit("subword").alias("kind"),
        "url", "token_index", F.col("sw.idx").alias("subword_index"))
    return (direct.unionByName(text_kind).unionByName(deriv)
            .unionByName(entity).unionByName(entity_noun).unionByName(sub))


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
    """1 - log(freq)/log(max_freq) — the reference's frequency factor
    (reference parsing.py:1852-1885), used to gate reverse matching.
    Computed with a scalar broadcast of the max (no shuffle on the big
    side)."""
    max_freq = freq_df.agg(F.max("freq")).collect()[0][0] or 1
    return freq_df.withColumn(
        "frequency_factor",
        F.when(F.lit(max_freq) <= 1, F.lit(1.0)).otherwise(
            1.0 - F.log(F.greatest(F.col("freq").cast("double"), F.lit(1.0)))
            / F.log(F.lit(float(max_freq)))
        ),
    )
