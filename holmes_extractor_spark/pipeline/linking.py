"""Ontology-aware entity linking.

The reference loads an OWL 2 ontology via rdflib and eagerly computes
the hyponym/synonym/instance closure at load time
(reference: ontology.py:91-353, README.md:2085 "Ontology implication
rules are now calculated eagerly"). Here the ontology is a small edge
DataFrame and the closure is computed by iterative self-joins (depth-
bounded — ontologies are shallow), then *broadcast* against the big
edges table: the closure is always tiny relative to the corpus, so
linking is a broadcast hash join, never a shuffle of the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# Fixture ontology — content equivalent in spirit to the reference's
# tests/en/test_ontology.owl (animal/hound hierarchy); re-authored.
# relation ∈ {subClassOf (hyponym→hypernym), equivalentClass (synonym),
# type (individual→class)} per FIXTURES.md §3.
ONTOLOGY_EDGES: list[tuple[str, str, str]] = [
    ("dog", "subClassOf", "animal"),
    ("cat", "subClassOf", "animal"),
    ("puppy", "subClassOf", "dog"),
    ("kitten", "subClassOf", "cat"),
    ("hound", "equivalentClass", "dog"),
    ("feline", "equivalentClass", "cat"),
    ("mammal", "subClassOf", "animal"),
    ("fido", "type", "dog"),
    ("hund", "subClassOf", "tier"),
    ("katze", "subClassOf", "tier"),
    # cross-language entity/predicate merging (synonyms)
    ("hund", "equivalentClass", "dog"),
    ("katze", "equivalentClass", "cat"),
    ("jagen", "equivalentClass", "chase"),
    ("tier", "equivalentClass", "animal"),
]

MAX_DEPTH = 8


def ontology_edges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ONTOLOGY_EDGES, "subject string, relation string, object string")


def ontology_closure(spark: SparkSession, edges: DataFrame | None = None) -> DataFrame:
    """(query_word, matched_word, depth, is_individual): query_word
    matches matched_word at hyponym/instance depth > 0, synonym depth 0.
    Matches the reference's Ontology.match_dict semantics
    (reference: ontology.py:224-353): a search word matches itself, its
    synonyms, and all transitive hyponyms/instances.
    """
    if edges is None:
        edges = ontology_edges_df(spark)
    # canonicalize synonyms into an undirected depth-0 relation
    syn = edges.filter(F.col("relation") == "equivalentClass")
    syn_pairs = (
        syn.select(F.col("object").alias("query_word"), F.col("subject").alias("matched_word"))
        .unionByName(syn.select(F.col("subject").alias("query_word"), F.col("object").alias("matched_word")))
        .withColumn("depth", F.lit(0)).withColumn("is_individual", F.lit(False))
    )
    hypo = edges.filter(F.col("relation") == "subClassOf").select(
        F.col("object").alias("query_word"), F.col("subject").alias("matched_word"),
        F.lit(1).alias("depth"), F.lit(False).alias("is_individual"))
    inst = edges.filter(F.col("relation") == "type").select(
        F.col("object").alias("query_word"), F.col("subject").alias("matched_word"),
        F.lit(1).alias("depth"), F.lit(True).alias("is_individual"))
    self_rows = (
        edges.select(F.col("subject").alias("w"))
        .unionByName(edges.select(F.col("object").alias("w"))).distinct()
        .select(F.col("w").alias("query_word"), F.col("w").alias("matched_word"),
                F.lit(0).alias("depth"), F.lit(False).alias("is_individual"))
    )
    closure = syn_pairs.unionByName(hypo).unionByName(inst).unionByName(self_rows)
    frontier = hypo.unionByName(inst).unionByName(syn_pairs)
    step = hypo.unionByName(inst).unionByName(syn_pairs)
    for _ in range(MAX_DEPTH):
        nxt = (
            frontier.alias("f")
            .join(step.alias("s"), F.col("f.matched_word") == F.col("s.query_word"))
            .select(F.col("f.query_word").alias("query_word"),
                    F.col("s.matched_word").alias("matched_word"),
                    (F.col("f.depth") + F.col("s.depth")).alias("depth"),
                    (F.col("f.is_individual") | F.col("s.is_individual")).alias("is_individual"))
        )
        nxt = nxt.join(closure, ["query_word", "matched_word"], "left_anti").cache()
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    # keep min depth per pair
    return (closure.groupBy("query_word", "matched_word")
            .agg(F.min("depth").alias("depth"), F.max("is_individual").alias("is_individual")))


def link_edges(cand_edges: DataFrame, closure: DataFrame) -> DataFrame:
    """Entity-link candidate edges: attach, per endpoint, the most
    general ontology class that subsumes the word (min-depth ancestor ≠
    itself when one exists). Broadcast join — corpus side untouched."""
    anc = (
        closure.filter(F.col("depth") > 0)
        .groupBy(F.col("matched_word").alias("w"))
        .agg(F.min_by("query_word", "depth").alias("ontology_class"))
    )
    b = broadcast(anc)
    return (
        cand_edges
        .join(b.withColumnRenamed("w", "subj").withColumnRenamed("ontology_class", "subj_class"), "subj", "left")
        .join(b.withColumnRenamed("w", "obj").withColumnRenamed("ontology_class", "obj_class"), "obj", "left")
        .withColumn("subj_class", F.coalesce("subj_class", "subj"))
        .withColumn("obj_class", F.coalesce("obj_class", "obj"))
    )
