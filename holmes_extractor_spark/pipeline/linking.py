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
    # ontology-defined multiword (reference test ontology's
    # 'cat creature'; indexed as a single repr)
    ("cat creature", "equivalentClass", "cat"),
    ("fido", "type", "dog"),
    ("hund", "subClassOf", "tier"),
    ("katze", "subClassOf", "tier"),
    # cross-language entity/predicate merging (synonyms). Both the
    # German verb lemma (jagen) and its noun-canonical derived lemma
    # (jagd, reference lang/de/data/derivation.csv:211) are linked:
    # document reprs carry the lemma, KG edge endpoints the derived one.
    ("hund", "equivalentClass", "dog"),
    ("katze", "equivalentClass", "cat"),
    # noun-canonical derived form of 'katze' (final -e after a
    # consonant stripped, reference de rules :1086-1094) — KG edge
    # endpoints carry the derived lemma, like jagd for jagen
    ("katz", "equivalentClass", "cat"),
    ("jagen", "equivalentClass", "chase"),
    ("jagd", "equivalentClass", "chase"),
    ("tier", "equivalentClass", "animal"),
]

MAX_DEPTH = 8


def ontology_edges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ONTOLOGY_EDGES, "subject string, relation string, object string")


def ontology_closure_local(edges: list[tuple[str, str, str]] | None = None,
                           symmetric: bool = False) -> list[tuple[str, str, int, bool]]:
    """Eager driver-side closure (the reference computes the closure in
    memory at ontology load, ontology.py:91-125, README.md:2085 —
    ontologies are driver-sized by nature). BFS over the synonym/
    hyponym/instance graph; min depth kept per pair.

    ``symmetric`` mirrors the reference's Ontology(symmetric_matching=
    True): hypernyms also match, recorded with NEGATIVE depths (the
    reference's convention; penalties use |depth|). Paths are monotone —
    all-down or all-up plus synonyms — so 'cousins' never match
    (reference ontology.py symmetric handling).

    Returns [(query_word, matched_word, depth, is_individual)].
    """
    edges = edges if edges is not None else ONTOLOGY_EDGES
    down: dict[str, list[tuple[str, int, bool]]] = {}
    up: dict[str, list[tuple[str, int, bool]]] = {}
    words = set()
    for (s, r, o) in edges:
        words |= {s, o}
        if r == "equivalentClass":
            for m in (down, up):
                m.setdefault(s, []).append((o, 0, False))
                m.setdefault(o, []).append((s, 0, False))
        elif r == "subClassOf":
            down.setdefault(o, []).append((s, 1, False))
            up.setdefault(s, []).append((o, 1, False))
        elif r == "type":
            down.setdefault(o, []).append((s, 1, True))
            up.setdefault(s, []).append((o, 1, True))

    def bfs(q: str, step: dict) -> dict[str, tuple[int, bool]]:
        best: dict[str, tuple[int, bool]] = {q: (0, False)}
        frontier = [(q, 0, False)]
        for _ in range(MAX_DEPTH):
            nxt = []
            for (w, d, ind) in frontier:
                for (w2, d2, ind2) in step.get(w, []):
                    nd, nind = d + d2, ind or ind2
                    if w2 not in best or nd < best[w2][0]:
                        best[w2] = (nd, nind)
                        nxt.append((w2, nd, nind))
            if not nxt:
                break
            frontier = nxt
        return best

    out: dict[tuple[str, str], tuple[int, bool]] = {}
    for q in sorted(words):
        for w2, (d, ind) in bfs(q, down).items():
            out[(q, w2)] = (d, ind)
        if symmetric:
            for w2, (d, ind) in bfs(q, up).items():
                # hypernym matches: negative depth; never overwrite an
                # existing (closer or downward) entry
                if (q, w2) not in out or abs(out[(q, w2)][0]) > d:
                    if (q, w2) not in out:
                        out[(q, w2)] = (-d, ind)
    # derivation-aware matched side (reference's ontology word matching
    # consults derived lemmas via ontology_reverse_derived_dict,
    # word_matching/ontology.py + parsing.py:981): each matched word
    # also matches its derived form, so search 'modest' (≡ monthly)
    # matches document 'month'
    from ..nlp.lemmatizer import derived_lemma_en
    extra: dict[tuple[str, str], tuple[int, bool]] = {}
    for (q, w), (d, ind) in out.items():
        dw = " ".join(derived_lemma_en(p, None) for p in w.split(" "))
        dq = " ".join(derived_lemma_en(p, None) for p in q.split(" "))
        for key in ((q, dw), (dq, w), (dq, dw)):
            if key != (q, w) and key not in out:
                extra[key] = (d, ind)
    out.update(extra)
    return [(q, w, d, ind) for (q, w), (d, ind) in sorted(out.items())]


def ontology_closure(spark: SparkSession, edges: DataFrame | None = None) -> DataFrame:
    """Closure as a (broadcastable) DataFrame. Semantics per the
    reference's Ontology.match_dict (ontology.py:224-353): a search word
    matches itself, its synonyms (depth 0), and all transitive
    hyponyms/instances (depth > 0)."""
    rows = ontology_closure_local(
        [tuple(r) for r in edges.collect()] if edges is not None else None)
    return spark.createDataFrame(
        rows, "query_word string, matched_word string, depth int, is_individual boolean")


def hypernym_ancestors(edges: list[tuple[str, str, str]] | None = None) -> dict[str, str]:
    """word → most general hypernym ancestor (reference
    ontology.py get_most_general_hypernym_ancestor, used for
    classification phraselet generalization, classification.py:384-397).
    Synonyms share their class's ancestor; roots map to themselves."""
    edges = edges if edges is not None else ONTOLOGY_EDGES
    parent: dict[str, str] = {}
    syn: dict[str, set[str]] = {}
    for (s, r, o) in edges:
        if r in ("subClassOf", "type"):
            parent[s] = o
        elif r == "equivalentClass":
            syn.setdefault(s, set()).add(o)
            syn.setdefault(o, set()).add(s)

    def top(w: str) -> str:
        seen = set()
        cur = w
        while cur not in seen:
            seen.add(cur)
            if cur in parent:
                cur = parent[cur]
                continue
            nxt = next((x for x in sorted(syn.get(cur, ())) if x in parent), None)
            if nxt is None:
                return cur
            cur = parent[nxt]
        return cur

    words = set(parent) | set(p for p in parent.values()) | set(syn)
    out = {w: top(w) for w in sorted(words)}
    # derivation-aware keys: document reprs carry derived lemmas
    # ('wastage horse' surfaces as 'waste horse'), and the reference's
    # ontology lookup consults derived forms (parsing.py:981 +
    # word_matching/ontology.py) — mirror ontology_closure_local
    from ..nlp.lemmatizer import derived_lemma_en
    for w, a in list(out.items()):
        dw = " ".join(derived_lemma_en(p, None) for p in w.split(" "))
        if dw != w and dw not in out:
            out[dw] = a
    return out


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
