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


def _node_label(node: str) -> str:
    """Node id → entry label. Node ids may carry a '~sense' suffix to
    model the reference's IRI-distinct homonyms (two OWL classes whose
    IRI fragments render the same label — e.g. the reference test
    ontology's animals#horse vs sports#horse, ontology.py:210-222):
    'horse~animals' and 'horse~sports' are distinct graph nodes sharing
    the label 'horse'."""
    return node.split("~", 1)[0]


def _ontology_graphs(edges: list[tuple[str, str, str]]):
    """Node-id-keyed adjacency for the monotone down/up walks."""
    down: dict[str, list[tuple[str, int, bool]]] = {}
    up: dict[str, list[tuple[str, int, bool]]] = {}
    nodes = set()
    for (s, r, o) in edges:
        nodes |= {s, o}
        if r == "equivalentClass":
            for m in (down, up):
                m.setdefault(s, []).append((o, 0, False))
                m.setdefault(o, []).append((s, 0, False))
        elif r == "subClassOf":
            down.setdefault(o, []).append((s, 1, False))
            up.setdefault(s, []).append((o, 1, False))
        elif r == "type":
            down.setdefault(o, []).append((s, 1, True))
            # upward through a type link reaches a CLASS — the matched
            # entry is not an individual (reference passes
            # is_individual=False on the upward type walk,
            # ontology.py:333-351)
            up.setdefault(s, []).append((o, 1, False))
    return down, up, nodes


def _bfs(q: str, step: dict) -> dict[str, tuple[int, bool]]:
    """Min-depth BFS over one monotone direction (all-down or all-up
    plus zero-cost synonyms) — the reference's recursion never turns
    around mid-path ('prevent recursive traversal of adjacent
    branches', ontology.py:259), so cousins never match."""
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


def ontology_closure_local(edges: list[tuple[str, str, str]] | None = None,
                           symmetric: bool = False,
                           derivation_aware: bool = True) -> list[tuple[str, str, int, bool]]:
    """Eager driver-side closure (the reference computes the closure in
    memory at ontology load, ontology.py:91-125, README.md:2085 —
    ontologies are driver-sized by nature). BFS over the synonym/
    hyponym/instance graph; min depth kept per pair.

    ``symmetric`` mirrors the reference's Ontology(symmetric_matching=
    True): hypernyms also match, recorded with NEGATIVE depths (the
    reference's convention; penalties use |depth|). Paths are monotone —
    all-down or all-up plus synonyms — so 'cousins' never match
    (reference ontology.py symmetric handling).

    Node ids may be '~sense'-suffixed for homonyms (see _node_label);
    output pairs are LABELS, merged across senses like the reference's
    label-keyed match_dict (ontology.py:94-125). A label never matches
    itself through another sense ('word does not match itself',
    ontology.py:256-258).

    Returns [(query_word, matched_word, depth, is_individual)].
    """
    edges = edges if edges is not None else ONTOLOGY_EDGES
    down, up, nodes = _ontology_graphs(edges)

    out: dict[tuple[str, str], tuple[int, bool]] = {}
    for q in sorted(nodes):
        ql = _node_label(q)
        for w2, (d, ind) in _bfs(q, down).items():
            wl = _node_label(w2)
            if wl == ql and d > 0:
                continue  # cross-sense label self-match
            key = (ql, wl)
            # min depth per label pair; downward entries beat hypernym ones
            if key not in out or (out[key][0] < 0 <= d) \
                    or (0 <= d < out[key][0]):
                out[key] = (d, ind)
        if symmetric:
            for w2, (d, ind) in _bfs(q, up).items():
                wl = _node_label(w2)
                if wl == ql:
                    continue
                # hypernym matches: negative depth; never overwrite an
                # existing (closer or downward) entry
                key = (ql, wl)
                if key not in out:
                    out[key] = (-d, ind)
    if derivation_aware:
        # derivation-aware matched side (reference's ontology word
        # matching consults derived lemmas via
        # ontology_reverse_derived_dict, word_matching/ontology.py +
        # parsing.py:981): each matched word also matches its derived
        # form, so search 'modest' (≡ monthly) matches document 'month'.
        # Skipped by the Ontology facade, whose surface mirrors the raw
        # reference Ontology object (derivation applies at word-match
        # time, not in the facade's match_dict).
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
    ontology.py get_most_general_hypernym_ancestor :174-208, used for
    classification phraselet generalization): the symmetric up-walk's
    entries with depth < 0, sorted by (depth, word), first wins — i.e.
    the DEEPEST ancestor, ties broken alphabetically; homonym senses
    merge before the sort. Words with no hypernym map to themselves."""
    edges = edges if edges is not None else ONTOLOGY_EDGES
    _, up, nodes = _ontology_graphs(edges)

    # per label: union of ancestor candidates over all its senses
    cand: dict[str, dict[str, int]] = {}
    for q in sorted(nodes):
        ql = _node_label(q)
        per = cand.setdefault(ql, {})
        for w2, (d, _ind) in _bfs(q, up).items():
            wl = _node_label(w2)
            if d > 0 and wl != ql:
                if wl not in per or d < per[wl]:
                    per[wl] = d

    def top(w: str) -> str:
        per = cand.get(w, {})
        if not per:
            return w
        # reference sort key (entry.depth, entry.word) with negative
        # depths: most negative (deepest) first, then alphabetical
        return min(per.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    out = {w: top(w) for w in sorted(cand)}
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


class OntologyEntry:
    """One matched ontology entry (reference ontology.py Entry:8-30):
    depth = hyponym links from the search word (negative for hypernyms
    under symmetric matching), is_individual = OWL NamedIndividual."""

    def __init__(self, word: str, depth: int, is_individual: bool):
        self.word = word
        self.reprs = [word.lower()]
        self.depth = depth
        self.is_individual = is_individual


class Ontology:
    """Reference-shaped ontology facade (reference ontology.py:33-353)
    over a list of (subject, relation, object) triples — the repo's
    OWL stand-in (relation ∈ subClassOf/equivalentClass/type; '~sense'
    node-id suffixes model IRI-distinct homonyms). Matching is
    case-insensitive; a word never matches itself. Pass a list of
    edge lists to combine several ontologies (reference multi-path
    load, ontology.py:76-80)."""

    def __init__(self, edges: list, symmetric_matching: bool = False):
        if edges and isinstance(edges[0], list):
            combined: list[tuple[str, str, str]] = []
            for part in edges:
                combined.extend(part)
            edges = combined
        self.symmetric_matching = symmetric_matching
        self._pairs = {
            (q, w): (d, ind)
            for (q, w, d, ind) in ontology_closure_local(
                edges, symmetric=symmetric_matching,
                derivation_aware=False)}
        labels = {_node_label(n) for e in edges for n in (e[0], e[2])}
        self.words = sorted(labels)
        self._multiwords = {w for w in labels if " " in w}
        self._ancestors = hypernym_ancestors(edges)

    def contains_word(self, word: str) -> bool:
        return word.lower() in set(self.words)

    def contains_multiword(self, multiword: str) -> bool:
        """Reference ontology.py:131-133."""
        return multiword.lower() in self._multiwords

    def get_words_matching(self, word: str) -> set[str]:
        """Labels matching *word* — synonyms, hyponyms, instances, plus
        hypernyms under symmetric matching (reference
        get_matching_entries reprs union, ontology.py:150-158)."""
        q = word.lower()
        return {w for (qq, w) in self._pairs if qq == q and w != q}

    def matches(self, search_phrase_word: str,
                candidate_words) -> OntologyEntry | None:
        """First candidate that the search word subsumes (reference
        ontology.py:135-148); deterministic min-depth entry per pair."""
        if isinstance(candidate_words, str):
            candidate_words = [candidate_words]
        q = search_phrase_word.lower()
        for c in candidate_words:
            cl = c.lower()
            if cl == q:
                continue
            hit = self._pairs.get((q, cl))
            if hit is not None:
                return OntologyEntry(cl, hit[0], hit[1])
        return None

    def get_most_general_hypernym_ancestor(self, word: str) -> str:
        """Reference ontology.py:174-208."""
        return self._ancestors.get(word.lower(), word.lower())


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
