"""Topic matching — the reference's
``Manager.topic_match_documents_against()`` (reference:
manager.py:677-898, topic_matching.py) re-planned on columnar tables.

The reference runs 4 matching passes per worker (single words →
forward relations → frequency-gated reverse relations →
embedding retries, topic_matching.py:224-327). Our corpus-side
``edges`` table *is* the set of all relation-phraselet instances
(SURVEY.md §2.5), so relation matching collapses into a broadcast join
query-phraselets ⋈ edges — the staged re-probing the reference does
imperatively becomes join-side selection that AQE handles, with the
frequency gates kept as explicit filters (reference's
reverse_only/frequency-threshold planning, topic_matching.py:379-549).

Scoring follows the reference's activation model
(topic_matching.py:867-1054; defaults manager.py:683-701):
per-phraselet linear decay over 75 words, relation matches 300,
reverse-only 200, single noun 50 / other 20, ×1.5 when two relations
overlap on a word, × the phraselet frequency factor; passages are
greedy non-overlapping peaks extended sideways ≤100 words while
neighbor score ≥15; global top-k with tie ranking at quotient 0.9.
Activation is doc-local and docs are bounded (≤1M chars), so the scan
runs in an Arrow-batched applyInPandas per url — the only wide ops are
the phraselet join and the final TakeOrderedAndProject.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..nlp.parser import parse_document
from ..pipeline.phraselets import (ACTOR_TEMPLATES, REVERSE_ONLY_TEMPLATES,
                                   extract_candidate_edges,
                                   extract_word_phraselets)

# answer_idxs carrying a SUBWORD answer are encoded as
# SUB_ANSWER_BASE + token_index*1000 + subword_index (plain token
# answers stay small non-negative ints; WH-adverb-promoted ones are
# -(idx+1))
SUB_ANSWER_BASE = 1_000_000_000

DEFAULTS = dict(
    maximum_activation_distance=75,
    relation_score=300.0,
    reverse_only_relation_score=200.0,
    single_word_score=50.0,
    single_word_any_tag_score=20.0,
    initial_question_word_answer_score=600.0,
    overlapping_relation_multiplier=1.5,
    embedding_penalty=0.6,
    ontology_penalty=0.9,
    sideways_match_extent=100,
    different_match_cutoff_score=15.0,
    number_of_results=10,
    tied_result_quotient=0.9,
    # keep only the highest-scoring passage per document (reference
    # manager.py:757 + topic_matching.py:1104-1111)
    only_one_result_per_document=False,
    # selective retry planning (reference manager.py:695-696 +
    # topic_matching.py:379-549): a relation phraselet whose parent is
    # corpus-frequent (ff below the relation threshold) is only matched
    # reverse (via the child); if the child is frequent too it is never
    # relation-matched. Embedding retries require the opposite pole's
    # ff to clear the embedding threshold.
    relation_matching_frequency_threshold=0.25,
    embedding_matching_frequency_threshold=0.5,
)

# question template → the corpus edge templates whose PARENT answers it
# (reference question phraselets match answering dependencies,
# word_matching/question.py + en language_specific_rules.py:1247-1312)
QUESTION_ANSWER_TEMPLATES = {
    "head-WHsubj": ("predicate-actor", "predicate-passivesubject",
                    "verb-nom"),
    "head-WHobj": ("predicate-patient", "verb-acc"),
    "head-WHattr": ("be-attribute", "verb-pd"),
    "head-WHadv": ("prepgovernor-noun",),
    "headprep-WH": ("prepgovernor-noun", "word-ofword",
                    "predicate-actor"),
    "headprepto-WH": ("predicate-recipient", "verb-dat"),
    # DE question phraselets also reach inside compounds: 'Was
    # betrachtet man?' answers with the INFORMATION subword of
    # 'Informationsbetrachtung' (reference de
    # tests/de/test_questions_DE.py:35-57 — wh pole ↔ intcompound in
    # the de match-implication table, de rules :1612-1693)
    "head-WHnom": ("verb-nom", "predicate-actor", "intcompound"),
    "head-WHacc": ("verb-acc", "predicate-patient", "intcompound"),
    "head-WHdat": ("verb-dat", "predicate-recipient"),
}

TOPIC_MATCH = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("start_idx", T.IntegerType()),
    T.StructField("end_idx", T.IntegerType()),
    # token position of the activation peak (the reference's
    # index_within_document); also drives the is_highest_activation
    # flag assignment in with_passage_text
    T.StructField("index_within_document", T.IntegerType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("n_matches", T.IntegerType()),
    # per-word explanations + question answers (reference
    # topic_matching.py:1288-1483 word_infos/answers) — token-indexed
    # here, converted to passage-relative char spans (multiword-aware
    # via `word`) by with_passage_text
    T.StructField("word_infos", T.ArrayType(T.StructType([
        T.StructField("token_idx", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("explanation", T.StringType()),
        # the matched DOCUMENT word (multiword-resolving); NULL for
        # entity-label matches, which span the token's entity multiword
        T.StructField("word", T.StringType()),
        # compound-part index when the match hit a German SUBWORD —
        # its char span narrows to the part (reference WordInfo spans
        # subword extents, de tests :380-456)
        T.StructField("subword_idx", T.IntegerType()),
    ]))),
    # subword index of the activation peak (reference subword_index)
    T.StructField("subword_index", T.IntegerType()),
    T.StructField("answer_idxs", T.ArrayType(T.IntegerType())),
])


def query_phraselets(query_text: str, lang: str = "en",
                     include_questions: bool = False,
                     ontology_multiwords: set[str] | None = None
                     ) -> tuple[list[dict], list[dict]]:
    """Compile the query document into relation + single-word
    phraselets (reference: parsing.py:2418-2458 two-pass production);
    ``include_questions`` admits initial interrogatives (the
    reference's process_initial_question_words)."""
    parsed = parse_document(query_text, lang,
                            ontology_multiwords=ontology_multiwords)
    # matching-only rows (multiword own-lemma variants, noun-mention
    # exchanges) are corpus-side constructs; phraselet PRODUCTION uses
    # the substituted multiword only (reference parsing.py:2036-2066)
    rels = [p for p in extract_candidate_edges(
                parsed, lang, include_questions=include_questions)
            if not p.get("mention")]
    # two-pass single-word production (reference parsing.py:2418-2458):
    # pass 1 (tags checked) keeps entity/ontology multiword
    # substitution and scores single_word_score; pass 2 (all words)
    # adds what pass 1 missed as any-tag phraselets — for a multiword
    # head that means its OWN lemma (reference parsing.py:1972-1977),
    # so 'Richard Paul Hudson kam' carries word: richard paul hudson
    # AND any-tag word: hudson/richard/paul like the reference dict
    words1 = extract_word_phraselets(parsed, lang, match_all_words=False)
    words2 = extract_word_phraselets(parsed, lang, match_all_words=True)
    by_label = {w["label"]: w for w in words1}
    for w in words2:
        if w["label"] not in by_label:
            # everything the tag-checked pass missed is created
            # without matching tags (reference pass-2
            # checking_tags=False → single_word_any_tag_score)
            w = dict(w)
            w["any_tag"] = True
            by_label[w["label"]] = w
    words = list(by_label.values())
    if include_questions:
        # governed interrogatives ("WHICH politician lied?"): a pole
        # whose noun is determined by which/what makes every match of
        # that phraselet an answer (reference governed question words,
        # tests/en/test_questions_EN.py:60-170)
        toks = parsed["tokens"]

        def _wh_governed(i: int) -> bool:
            k = i - 1
            while k >= 0 and toks[k]["pos"] in ("ADJ", "NUM"):
                k -= 1
            return (k >= 0 and toks[k]["pos"] == "DET"
                    and toks[k]["text"].lower() in (
                        "which", "what",
                        # DE governed interrogatives ("WELCHE
                        # Information betrachtet man?", reference
                        # tests/de/test_questions_DE.py:38-57)
                        "welche", "welcher", "welches", "welchen",
                        "welchem"))

        for p in rels:
            if _wh_governed(p["child_idx"]):
                p["wh_governed"] = "child"
            elif _wh_governed(p["parent_idx"]):
                p["wh_governed"] = "parent"
        for w in words:
            if _wh_governed(w["idx"]):
                w["wh_governed"] = True
    return rels, words


import re as _re

_ENT_CHILD_RE = _re.compile(r"^entity([a-z]+)$")

# reference word-match explanation strings as column expressions
# (word_matching/direct.py:17-18, ontology.py:23-46, embedding.py:12-22,
# entity.py:12-15, entity_embedding.py:13-23, question.py:13-16) —
# emitted per pole by match_phraselets so topic word_infos carry the
# reference's per-word explanations (topic_matching.py:1288-1483)
_DEPTH_NAMES = {
    -4: "an ancestor", -3: "a great-grandparent", -2: "a grandparent",
    -1: "a parent", 0: "a synonym", 1: "a child", 2: "a grandchild",
    3: "a great-grandchild", 4: "a descendant",
}


def _direct_expl(word_col):
    return F.concat(F.lit("Matches "), F.upper(word_col),
                    F.lit(" directly."))


def _onto_expl(word_col, depth_col):
    d = F.greatest(F.lit(-4), F.least(F.lit(4), depth_col))
    name = F.lit(None).cast("string")
    for k, v in _DEPTH_NAMES.items():
        name = F.when(d == k, F.lit(v)).otherwise(name)
    return F.concat(F.lit("Is "), name, F.lit(" of "), F.upper(word_col),
                    F.lit(" in the ontology."))


# driver-side mirrors of the explanation columns — used when the query
# side (phraselet table × driver-sized closure/vector fixture) is
# expanded in Python instead of through broadcast joins + a shuffle
# (guide §2.4: remove shuffles outright; the q side is never corpus-
# scale, exactly like the reference's eager driver closure)

def _direct_expl_py(word: str) -> str:
    return f"Matches {word.upper()} directly."


def _onto_expl_py(word: str, depth: int) -> str:
    d = max(-4, min(4, depth))
    return f"Is {_DEPTH_NAMES[d]} of {word.upper()} in the ontology."


def _round_half_up(x: float, digits: int) -> float:
    """Exact mirror of Catalyst Round(double, s): BigDecimal.valueOf
    (shortest round-trip decimal repr — identical to Python repr) with
    HALF_UP scaling."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-digits),
                                           rounding=ROUND_HALF_UP))


def _as_closure_rows(closure) -> list[tuple] | None:
    """Normalize an ontology closure to driver rows [(query_word,
    matched_word, depth)]. Closures are driver-sized by contract (the
    reference computes them eagerly at ontology load, ontology.py:
    91-125); accepting rows lets callers skip the createDataFrame/
    broadcast-join round trip."""
    if closure is None:
        return None
    if isinstance(closure, DataFrame):
        return [(r["query_word"], r["matched_word"], r["depth"])
                for r in closure.select("query_word", "matched_word",
                                        "depth").collect()]
    return [(r[0], r[1], r[2]) for r in closure]


def match_phraselets(spark: SparkSession, edges: DataFrame, words: DataFrame,
                     rel_ph: list[dict], word_ph: list[dict],
                     closure: DataFrame | list | None = None,
                     vectors: dict[str, list[float]] | None = None,
                     embedding_threshold: float = 1.0,
                     ents: DataFrame | None = None,
                     chains: DataFrame | None = None) -> DataFrame:
    """Phraselet matches against the corpus:
    (url, phraselet_label, kind, position, base_score).

    Relation phraselets join the edges table on (template, pred-pole,
    child-pole) with ontology expansion of each pole via the broadcast
    closure; word phraselets join the words table. Both joins broadcast
    the (tiny) query side. ``ents`` (url, idx, ent_type, is_noun)
    enables ENTITY-placeholder poles (reference entity word matching in
    topic phraselets, tests/en/test_topic_matching_EN.py:93-116)."""
    ontology_penalty = DEFAULTS["ontology_penalty"]
    all_rel = [p for p in rel_ph if not p["template"].startswith("head")]
    ent_rel = [p for p in all_rel
               if _ENT_CHILD_RE.match(
                   p["obj"] if p["template"] not in ACTOR_TEMPLATES
                   else p["subj"])]
    # ENTITY placeholder at the PARENT pole ("tired ENTITYPERSON" →
    # governor-adjective: entityperson-tired): join on the child word,
    # gate the parent token's entity label
    ent_par = [p for p in all_rel if p not in ent_rel
               and _ENT_CHILD_RE.match(p["pred"])]
    rel_ph_plain = [p for p in all_rel
                    if p not in ent_rel and p not in ent_par]
    ent_word_ph = [w for w in word_ph if _ENT_CHILD_RE.match(w["word"])]
    word_ph = [w for w in word_ph
               if not _ENT_CHILD_RE.match(w["word"])]
    rel_rows = [(p["template"], p["label"], p["pred"],
                 p["obj"] if p["template"] not in ACTOR_TEMPLATES else p["subj"],
                 bool(p.get("reverse_only"))
                 or p["template"] in REVERSE_ONLY_TEMPLATES,
                 float(p.get("freq_factor", 1.0)), False,
                 p.get("pred_disp") or p["pred"],
                 p.get("child_disp") or (
                     p["obj"] if p["template"] not in ACTOR_TEMPLATES
                     else p["subj"]))
                for p in rel_ph_plain]
    # reverse-polarity dependency matching (reference
    # use_reverse_dependency_matching, structural_matching.py:597-617:
    # verbal-argument deps match amod/acomp in inverse polarity and
    # vice versa, en rules reverse_document_dependencies :880-1080):
    # the phraselet ALSO probes the inverse corpus template with
    # swapped poles — "Someone adopts a child" matches "An adopted
    # child" and vice versa (tests/en/test_topic_matching_EN.py:755-768)
    _INVERSE_TEMPLATES = {
        "predicate-actor": ("governor-adjective",),
        "predicate-patient": ("governor-adjective",),
        "predicate-passivesubject": ("governor-adjective",),
        "predicate-recipient": ("governor-adjective",),
        "word-ofword": ("governor-adjective",),
        "predicate-toughmovedargument": ("governor-adjective",),
        "governor-adjective": ("predicate-actor", "predicate-patient",
                               "predicate-passivesubject",
                               "predicate-recipient", "word-ofword",
                               "predicate-toughmovedargument",
                               "noun-noun"),
        "noun-noun": ("governor-adjective",),
        # DE: nk reverse-implies the verbal/genitive/compound deps
        # (de rules :1640-1652) and intcompound reverse-implies nk
        # (:1680-1693) — 'Wohnungsverkauf' ↔ 'eine verkaufte Wohnung'
        "noun-dependent": ("intcompound", "verb-nom", "verb-acc"),
        "intcompound": ("noun-dependent",),
    }
    # FORWARD cross-template implications (same polarity): a phraselet
    # dep also matches document deps carried by OTHER templates —
    # dobj matches nsubjpass/pobjo/compound ("A cat was chased",
    # "the chasing OF a cat"), arg matches every argument dep, etc.
    # (reference MatchImplication document_dependencies,
    # en language_specific_rules.py:880-1080)
    _FORWARD_TEMPLATES = {
        "predicate-actor": ("word-ofword",
                            "predicate-toughmovedargument"),
        "predicate-patient": ("word-ofword", "predicate-passivesubject",
                              "noun-noun",
                              "predicate-toughmovedargument"),
        "predicate-passivesubject": ("predicate-patient", "word-ofword",
                                     "noun-noun",
                                     "predicate-toughmovedargument",
                                     "predicate-recipient"),
        "predicate-toughmovedargument": (
            "predicate-actor", "predicate-patient", "word-ofword",
            "predicate-passivesubject", "noun-noun",
            "predicate-recipient", "prepgovernor-noun"),
        "word-ofword": ("predicate-actor", "predicate-patient",
                        "predicate-passivesubject",
                        "predicate-toughmovedargument"),
        "predicate-recipient": ("predicate-patient",
                                "predicate-passivesubject"),
        # DE intcompound ↔ the verbal/nominal templates (reference
        # match_implication_dict, de rules :1612-1693): 'Katzenjagen'
        # matches 'jagt eine Katze' and verbal relations match inside
        # compounds
        "intcompound": ("verb-nom", "verb-acc", "noun-dependent",
                        "verb-adverb", "prepgovernor-noun"),
        "verb-nom": ("intcompound",),
        "verb-acc": ("intcompound",),
        "noun-dependent": ("intcompound",),
        "prepgovernor-noun": ("intcompound",),
    }
    rel_rows += [
        (fwd_t, p["label"], p["pred"],
         p["obj"] if p["template"] not in ACTOR_TEMPLATES else p["subj"],
         bool(p.get("reverse_only"))
         or p["template"] in REVERSE_ONLY_TEMPLATES,
         float(p.get("freq_factor", 1.0)), False,
         p.get("pred_disp") or p["pred"],
         p.get("child_disp") or (
             p["obj"] if p["template"] not in ACTOR_TEMPLATES
             else p["subj"]))
        for p in rel_ph_plain
        for fwd_t in _FORWARD_TEMPLATES.get(p["template"], ())]
    rel_rows += [
        (inv_t, p["label"],
         # corpus parent must carry the phraselet CHILD word and
         # corpus child the phraselet PARENT word
         p["obj"] if p["template"] not in ACTOR_TEMPLATES else p["subj"],
         p["pred"],
         bool(p.get("reverse_only"))
         or p["template"] in REVERSE_ONLY_TEMPLATES,
         float(p.get("freq_factor", 1.0)), True,
         p.get("child_disp") or (
             p["obj"] if p["template"] not in ACTOR_TEMPLATES
             else p["subj"]),
         p.get("pred_disp") or p["pred"])
        for p in rel_ph_plain
        for inv_t in _INVERSE_TEMPLATES.get(p["template"], ())]
    # literal WH-pole probes: a question phraselet's interrogative
    # child also matches a document's own question word directly,
    # scored as a plain relation (reference topic_matching.py:965-975;
    # the corpus-side rows are the mention=True q-word edges)
    rel_rows += [
        (p["template"], p["label"], p["pred"], p["obj"], False,
         float(p.get("freq_factor", 1.0)), False,
         p.get("pred_disp") or p["pred"],
         p.get("child_disp") or p["obj"])
        for p in rel_ph if p["template"].startswith("head")]
    emb_retry_ok = {p["label"]: bool(p.get("emb_retry", True))
                    for p in rel_ph}
    parent_emb_retry_ok = {p["label"]: bool(p.get("parent_emb_retry", True))
                           for p in rel_ph}
    q_rows = [(p["template"], p["label"], p["pred"], p["obj"],
               float(p.get("freq_factor", 1.0)), p.get("prep"),
               p.get("pred_disp") or p["pred"])
              for p in rel_ph if p["template"].startswith("head")]
    # relation-ish branches accumulate in `out` (they need the
    # duplicate-removal agg); word branches in `wout` (already unique
    # per position after their own agg — no second shuffle needed)
    out = None
    wout = None
    # the closure is driver-sized by contract (reference eager closure,
    # ontology.py:91-125): expand the (driver-sized) phraselet rows in
    # Python instead of broadcast joins + a groupBy shuffle (guide §2.4)
    closure_rows = _as_closure_rows(closure)
    cl_map: dict[str, list[tuple[str, int]]] = {}
    if closure_rows:
        for (cq, cw, cd) in closure_rows:
            cl_map.setdefault(cq, []).append((cw, cd))
    _Q_SCHEMA = ("template string, phraselet_label string, "
                 "q_pred string, q_child string, "
                 "q_reverse_only boolean, freq_factor double, "
                 "inverse boolean, p_disp string, c_disp string, "
                 "penalty double, expl_pred string, expl_child string")

    def _expand_pole(word, disp):
        # LEFT-join semantics: ontology expansion carries the closure
        # depth so the activation penalty ontology_penalty^(depth+1)
        # applies per pole (reference manager.py:683-701); identity
        # matches carry no penalty, plus the reference word-match
        # explanation string per pole (ontology.py:23-46)
        opts = cl_map.get(word) or [(word, 0)]
        return [(m, 1.0, _direct_expl_py(disp)) if m == word
                else (m, ontology_penalty ** (abs(d) + 1),
                      _onto_expl_py(disp, d))
                for (m, d) in opts]

    def _dedup_q(rows):
        # mirror of the former groupBy + max_by(penalty, expl_pred,
        # expl_child) dedup — string comparison in Python (code points)
        # matches Spark's UTF8 byte order
        best: dict = {}
        for r in rows:
            (t, lbl, qp, qc, rev, ff, inv, pd_, cd_, pen, ep, ec) = r
            key = (t, lbl, rev, ff, qp, qc, inv)
            cur = best.get(key)
            if cur is None or (pen, ep, ec) > (cur[9], cur[10], cur[11]):
                best[key] = r
        return list(best.values())

    if rel_rows:
        q_local = [
            (t, lbl, mp, mc, rev, ff, inv, pd_, cd_, pp * pc, ep, ec)
            for (t, lbl, qp, qc, rev, ff, inv, pd_, cd_) in rel_rows
            for (mp, pp, ep) in _expand_pole(qp, pd_)
            for (mc, pc, ec) in _expand_pole(qc, cd_)
        ]
        if closure_rows:
            q_local = _dedup_q(q_local)
        q = None
        if vectors is not None and embedding_threshold < 1.0:
            # pass-4 child-embedding retry (reference topic_matching.py:
            # 301-319 + embedding_penalty, manager.py:683-701): expand
            # the CHILD pole by vector similarity, penalty =
            # embedding_penalty × cosine. When ``vectors`` is a
            # DataFrame (the scale path) the vocabulary side runs as a
            # DISTRIBUTED scored scan (broadcast query-child probes ⋈
            # vector table, JVM zip_with dot products) — mirroring the
            # structural root-embedding plan (structural.py) — so a
            # realistic 100k–1M-word vocabulary never loops on the
            # driver. A dict (tests/fixtures) is driver-sized already:
            # the same scan runs locally, skipping two shuffle stages
            # and a collect round-trip (guide §2.4).
            emb_pen = DEFAULTS["embedding_penalty"]
            # per-phraselet single-token gate: overall ** n where
            # overall = sqrt(word_threshold) (reference manager.py:
            # 776-779) and n counts non-ENTITY poles (reference
            # word_matching/embedding.py:105-108 via the phraselet's
            # matchable_non_entity_tokens_to_vectors). For a standard
            # two-pole relation phraselet this is exactly the word
            # threshold; ENTITY-parent phraselets gate looser (n=1).
            overall = embedding_threshold ** 0.5
            probes = []
            for (t, lbl, qp, qc, rev, ff, inv, pd_, cd_) in rel_rows:
                if inv:
                    # the embedding retry expands forward-polarity
                    # phraselets only (reference pass 4 operates on the
                    # phraselet's own child pole)
                    continue
                if not emb_retry_ok.get(lbl, True):
                    # selective retry planning: the parent pole's
                    # frequency factor is below the embedding threshold
                    # (reference topic_matching.py:429-434)
                    continue
                n_emb = ((0 if _ENT_CHILD_RE.match(qp or "") else 1)
                         + (0 if _ENT_CHILD_RE.match(qc or "") else 1))
                probes.append((t, lbl, qp, qc, rev, ff,
                               overall ** n_emb, n_emb, pd_, cd_))
            # parent (root) embedding retry probes — the reference's
            # reverse-matching pass with compare_embeddings_on_root_
            # words=True (topic_matching.py:283-299): the phraselet's
            # PARENT pole expands by vector similarity at positions
            # where the child word matched; planned off the child
            # pole's frequency factor. ENTITY-placeholder parents have
            # no vector and never root-embedding-match.
            probes_p = []
            for (t, lbl, qp, qc, rev, ff, inv, pd_, cd_) in rel_rows:
                if inv or t.startswith("head"):
                    continue
                if not parent_emb_retry_ok.get(lbl, True):
                    continue
                if _ENT_CHILD_RE.match(qp or ""):
                    continue
                n_emb = 1 + (0 if _ENT_CHILD_RE.match(qc or "") else 1)
                probes_p.append((t, lbl, qp, qc, rev, ff,
                                 overall ** n_emb, n_emb, pd_, cd_))
            if (probes or probes_p) and isinstance(vectors, dict):
                # driver-sized vector fixture: same scan, locally.
                # Arithmetic mirrors the JVM column expressions exactly
                # (same fold order; _round_half_up ≡ Catalyst Round).
                import math

                def _dot(a, b):
                    acc = 0.0
                    for x, y in zip(a, b):
                        acc = acc + x * y
                    return acc

                def _norm(a):
                    acc = 0.0
                    for x in a:
                        acc = acc + x * x
                    return math.sqrt(acc)

                vec_items = [(w, [float(x) for x in v])
                             for w, v in vectors.items()]
                extra_local = []
                for (t, lbl, qp, qc, rev, ff, stt, n_emb, pd_, cd_) in probes:
                    if qc not in vectors:
                        continue
                    qvec = [float(x) for x in vectors[qc]]
                    for (w, vec) in vec_items:
                        if w == qc:
                            continue
                        cos = _dot(qvec, vec) / (_norm(qvec) * _norm(vec))
                        if cos > stt:
                            # reference structural_matching.py:458-462 +
                            # topic_matching.py:1004: penalty =
                            # embedding_penalty × overall similarity,
                            # overall = round(cos^(1/n_vectored), 8)
                            pen = emb_pen * _round_half_up(
                                math.pow(cos, 1.0 / n_emb), 8)
                            extra_local.append(
                                (t, lbl, qp, w, rev, ff, False, pd_, cd_,
                                 pen, _direct_expl_py(pd_),
                                 # reference embedding.py:12-22 (display
                                 # word = the search phrase child lemma)
                                 f"Has a word embedding that is "
                                 f"{int(math.floor(cos * 100))}% similar "
                                 f"to {cd_.upper()}."))
                for (t, lbl, qp, qc, rev, ff, stt, n_emb, pd_, cd_) in probes_p:
                    if qp not in vectors:
                        continue
                    qvec = [float(x) for x in vectors[qp]]
                    for (w, vec) in vec_items:
                        if w == qp:
                            continue
                        cos = _dot(qvec, vec) / (_norm(qvec) * _norm(vec))
                        if cos > stt:
                            pen = emb_pen * _round_half_up(
                                math.pow(cos, 1.0 / n_emb), 8)
                            extra_local.append(
                                (t, lbl, w, qc, rev, ff, False, pd_, cd_,
                                 pen,
                                 f"Has a word embedding that is "
                                 f"{int(math.floor(cos * 100))}% similar "
                                 f"to {pd_.upper()}.",
                                 _direct_expl_py(cd_)))
                if extra_local:
                    q_local = _dedup_q(q_local + extra_local)
                probes, probes_p = [], []
            if probes or probes_p:
                vec_df = vectors.toDF("w", "vec")
                # only the (few) query poles' vectors come to the
                # driver — O(|query|), not O(vocabulary)
                qcs = sorted({p[3] for p in probes}
                             | {p[2] for p in probes_p})
                qvecs = {r["w"]: list(r["vec"]) for r in
                         vec_df.filter(F.col("w").isin(qcs)).collect()}
                probes = [p + (qvecs[p[3]],) for p in probes
                          if p[3] in qvecs]
                probes_p = [p + (qvecs[p[2]],) for p in probes_p
                            if p[2] in qvecs]
            _PROBE_SCHEMA = ("template string, phraselet_label string, "
                             "q_pred string, q_child string, "
                             "q_reverse_only boolean, freq_factor double, "
                             "stt double, n_emb int, "
                             "p_disp string, c_disp string, "
                             "qvec array<double>")
            extras = []
            dot = F.aggregate(
                F.zip_with("qvec", "vec", lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x)
            norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
                F.transform(c, lambda x: x * x),
                F.lit(0.0), lambda a, x: a + x))
            if probes:
                pr = spark.createDataFrame(probes, _PROBE_SCHEMA)
                qe = (vec_df.join(F.broadcast(pr),
                                  F.col("w") != F.col("q_child"))
                      .withColumn("cos", dot / (norm(F.col("qvec"))
                                                * norm(F.col("vec"))))
                      .filter(F.col("cos") > F.col("stt"))
                      .select("template", "phraselet_label", "q_pred",
                              "q_reverse_only", "freq_factor",
                              # reference structural_matching.py:458-462
                              # + topic_matching.py:1004: penalty =
                              # embedding_penalty × overall similarity,
                              # overall = round(cos^(1/n_vectored), 8)
                              # (geometric mean across the phraselet's
                              # non-ENTITY vectored poles)
                              (F.lit(emb_pen)
                               * F.round(F.pow(F.col("cos"),
                                               1.0 / F.col("n_emb")), 8))
                              .alias("penalty"),
                              F.lit(False).alias("inverse"),
                              "p_disp", "c_disp",
                              _direct_expl(F.col("p_disp"))
                              .alias("expl_pred"),
                              # reference embedding.py:12-22 (display
                              # word = the search phrase child's lemma)
                              F.concat(
                                  F.lit("Has a word embedding that is "),
                                  F.floor(F.col("cos") * 100).cast("int"),
                                  F.lit("% similar to "),
                                  F.upper("c_disp"), F.lit("."))
                              .alias("expl_child"),
                              F.col("w").alias("q_child")))
                extras.append(qe)
            if probes_p:
                prp = spark.createDataFrame(probes_p, _PROBE_SCHEMA)
                qpe = (vec_df.join(F.broadcast(prp),
                                   F.col("w") != F.col("q_pred"))
                       .withColumn("cos", dot / (norm(F.col("qvec"))
                                                 * norm(F.col("vec"))))
                       .filter(F.col("cos") > F.col("stt"))
                       .select("template", "phraselet_label",
                               F.col("w").alias("q_pred"),
                               "q_reverse_only", "freq_factor",
                               (F.lit(emb_pen)
                                * F.round(F.pow(F.col("cos"),
                                                1.0 / F.col("n_emb")), 8))
                               .alias("penalty"),
                               F.lit(False).alias("inverse"),
                               "p_disp", "c_disp",
                               F.concat(
                                   F.lit("Has a word embedding that is "),
                                   F.floor(F.col("cos") * 100).cast("int"),
                                   F.lit("% similar to "),
                                   F.upper("p_disp"), F.lit("."))
                               .alias("expl_pred"),
                               _direct_expl(F.col("c_disp"))
                               .alias("expl_child"),
                               "q_child"))
                extras.append(qpe)
            if extras:
                q = spark.createDataFrame(q_local, _Q_SCHEMA)
                for e in extras:
                    q = q.unionByName(e)
                q = (q.groupBy(
                    "template", "phraselet_label", "q_reverse_only",
                    "freq_factor", "q_pred", "q_child", "inverse")
                    .agg(F.max_by(
                        F.struct("penalty", "expl_pred", "expl_child",
                                 "p_disp", "c_disp"),
                        F.struct("penalty", "expl_pred", "expl_child"))
                        .alias("_x"))
                    .select("template", "phraselet_label",
                            "q_reverse_only", "freq_factor", "q_pred",
                            "q_child", "inverse", "_x.penalty",
                            "_x.expl_pred", "_x.expl_child",
                            "_x.p_disp", "_x.c_disp"))
        if q is None:
            q = spark.createDataFrame(q_local, _Q_SCHEMA)
        child_col = F.when(F.col("template").isin(*ACTOR_TEMPLATES),
                           F.col("subj")).otherwise(F.col("obj"))
        rel_m = (
            edges.withColumn("q_child", child_col)
            .withColumnRenamed("pred", "q_pred")
            .join(F.broadcast(q), ["template", "q_pred", "q_child"])
            .select("url", "phraselet_label",
                    F.when(F.col("q_reverse_only"), F.lit("relation_reverse_only"))
                     .otherwise(F.lit("relation")).alias("kind"),
                    # output poles are PHRASELET-oriented: for an
                    # inverse-polarity match the phraselet root sits at
                    # the corpus CHILD token, so the poles swap — then
                    # position==parent_idx uniformly equals the
                    # reference's index_within_document, and governed-
                    # question extras pick the right pole
                    F.when(F.col("inverse"), F.col("child_idx"))
                     .otherwise(F.col("parent_idx")).alias("position"),
                    F.when(F.col("inverse"), F.col("child_idx"))
                     .otherwise(F.col("parent_idx")).alias("parent_idx"),
                    F.when(F.col("inverse"), F.col("parent_idx"))
                     .otherwise(F.col("child_idx")).alias("child_idx"),
                    "penalty", "freq_factor",
                    F.col("q_child").alias("matched"),
                    # position-oriented explanations + DOCUMENT words
                    # (q_pred/q_child hold the corpus words after
                    # ontology/embedding expansion — the words the
                    # document actually contains, which resolve
                    # multiword char spans in with_passage_text like
                    # the reference's first..last_document_token,
                    # topic_matching.py:1301-1309): for an
                    # inverse-polarity match the phraselet root sits
                    # at the corpus CHILD token, so the poles swap here
                    # exactly as the indexes do above
                    F.when(F.col("inverse"), F.col("expl_child"))
                     .otherwise(F.col("expl_pred")).alias("p_expl"),
                    F.when(F.col("inverse"), F.col("expl_pred"))
                     .otherwise(F.col("expl_child")).alias("c_expl"),
                    F.when(F.col("inverse"), F.col("q_child"))
                     .otherwise(F.col("q_pred")).alias("p_word"),
                    F.when(F.col("inverse"), F.col("q_pred"))
                     .otherwise(F.col("q_child")).alias("c_word"),
                    F.when(F.col("inverse"), F.col("child_sub"))
                     .otherwise(F.col("parent_sub")).alias("parent_sub"),
                    F.when(F.col("inverse"), F.col("parent_sub"))
                     .otherwise(F.col("child_sub")).alias("child_sub"),
                    # a match against an intcompound corpus edge is
                    # anchored on SUBWORDS — the whole-word-beats-
                    # subword rejection and the same-word single
                    # scoring key off this (reference
                    # topic_matching.py:815-829, 886-893)
                    (F.col("template") == "intcompound").alias("intc"))
        )
        out = rel_m
        # entity-label prototype matching for the 'person' lexeme: a
        # query child pole 'person' matches any person-entity child —
        # the reference's entity-embedding word match with the PERSON
        # label prototype, which IS the 'person' lexeme
        # (cosine = 1.0; ENTITY_LABEL_LEXEMES, en rules :100-121)
        person_rows = [(r[0], r[1], r[2], r[4], r[5], r[7])
                       for r in rel_rows
                       if r[3] == "person" and not r[6]]
        if person_rows:
            qp = spark.createDataFrame(
                person_rows,
                "template string, phraselet_label string, q_pred string, "
                "q_reverse_only boolean, freq_factor double, "
                "p_disp string")
            per_m = (
                edges.filter(F.col("child_is_person"))
                .withColumn("c_word", child_col)
                .withColumnRenamed("pred", "q_pred")
                .join(F.broadcast(qp), ["template", "q_pred"])
                .select("url", "phraselet_label",
                        F.when(F.col("q_reverse_only"),
                               F.lit("relation_reverse_only"))
                         .otherwise(F.lit("relation")).alias("kind"),
                        F.col("parent_idx").alias("position"),
                        "parent_idx", "child_idx",
                        F.lit(1.0).alias("penalty"), "freq_factor",
                        F.lit(None).cast("string").alias("matched"),
                        _direct_expl(F.col("p_disp")).alias("p_expl"),
                        # reference entity_embedding.py:13-23 (the
                        # PERSON label prototype IS the 'person'
                        # lexeme, cosine 1.0)
                        F.lit("Has an entity label that is 100% similar "
                              "to the word embedding corresponding to "
                              "PERSON.").alias("c_expl"),
                        F.col("q_pred").alias("p_word"), "c_word")
            )
            out = out.unionByName(per_m, allowMissingColumns=True)
    if ent_rel and ents is not None:
        er = [(p["template"], p["label"], p["pred"],
               _ENT_CHILD_RE.match(
                   p["obj"] if p["template"] not in ACTOR_TEMPLATES
                   else p["subj"]).group(1).upper(),
               float(p.get("freq_factor", 1.0)),
               bool(p.get("reverse_only"))
               or p["template"] in REVERSE_ONLY_TEMPLATES,
               p.get("pred_disp") or p["pred"]) for p in ent_rel]
        # a reverse-only phraselet initiates matching from its CHILD's
        # reverse-dict entry; ENTITYNOUN has none (the noun scan serves
        # forward structural matching only, structural_matching.py:
        # 209-230), so reverse-only × ENTITYNOUN never matches
        er = [r for r in er if not (r[5] and r[3] == "NOUN")]
        qe = spark.createDataFrame(
            er, "template string, phraselet_label string, q_pred string, "
                "ent_spec string, freq_factor double, "
                "q_reverse_only boolean, p_disp string")
        e2 = ents.select(F.col("url"), F.col("idx").alias("child_idx"),
                         "ent_type", "is_noun")
        ent_m = (
            edges.withColumnRenamed("pred", "q_pred")
            .join(F.broadcast(qe), ["template", "q_pred"])
            .join(e2, ["url", "child_idx"])
            .filter(((F.col("ent_spec") == "NOUN") & F.col("is_noun"))
                    | (F.col("ent_spec") == F.col("ent_type")))
            .select("url", "phraselet_label",
                    F.when(F.col("q_reverse_only"),
                           F.lit("relation_reverse_only"))
                     .otherwise(F.lit("relation")).alias("kind"),
                    F.col("parent_idx").alias("position"),
                    "parent_idx", "child_idx",
                    F.lit(1.0).alias("penalty"), "freq_factor",
                    F.lit(None).cast("string").alias("matched"),
                    _direct_expl(F.col("p_disp")).alias("p_expl"),
                    # reference entity.py:12-15
                    F.concat(F.lit("Has an entity label matching ENTITY"),
                             F.col("ent_spec"), F.lit("."))
                    .alias("c_expl"),
                    F.col("q_pred").alias("p_word"),
                    # entity pole: no matched word — the char span is
                    # resolved from the entity token's multiword
                    F.lit(None).cast("string").alias("c_word"))
        )
        out = ent_m if out is None else out.unionByName(ent_m, allowMissingColumns=True)
    if ent_par and ents is not None:
        ep = [(p["template"], p["label"],
               p["obj"] if p["template"] not in ACTOR_TEMPLATES
               else p["subj"],
               _ENT_CHILD_RE.match(p["pred"]).group(1).upper(),
               float(p.get("freq_factor", 1.0)),
               bool(p.get("reverse_only"))
               or p["template"] in REVERSE_ONLY_TEMPLATES,
               p.get("child_disp") or (
                   p["obj"] if p["template"] not in ACTOR_TEMPLATES
                   else p["subj"])) for p in ent_par]
        qep = spark.createDataFrame(
            ep, "template string, phraselet_label string, q_child string, "
                "ent_spec string, freq_factor double, "
                "q_reverse_only boolean, c_disp string")
        p2 = ents.select(F.col("url"), F.col("idx").alias("parent_idx"),
                         F.col("ent_type").alias("p_ent"),
                         F.col("is_noun").alias("p_is_noun"))
        child_col2 = F.when(F.col("template").isin(*ACTOR_TEMPLATES),
                            F.col("subj")).otherwise(F.col("obj"))
        ent_pm = (
            edges.withColumn("q_child", child_col2)
            .join(F.broadcast(qep), ["template", "q_child"])
            .join(p2, ["url", "parent_idx"])
            .filter(((F.col("ent_spec") == "NOUN") & F.col("p_is_noun"))
                    | ((F.col("ent_spec") == F.col("p_ent"))
                       & F.col("p_is_noun")))
            .select("url", "phraselet_label",
                    F.when(F.col("q_reverse_only"),
                           F.lit("relation_reverse_only"))
                     .otherwise(F.lit("relation")).alias("kind"),
                    F.col("parent_idx").alias("position"),
                    "parent_idx", "child_idx",
                    F.lit(1.0).alias("penalty"), "freq_factor",
                    F.lit(None).cast("string").alias("matched"),
                    F.concat(F.lit("Has an entity label matching ENTITY"),
                             F.col("ent_spec"), F.lit("."))
                    .alias("p_expl"),
                    _direct_expl(F.col("c_disp")).alias("c_expl"),
                    F.lit(None).cast("string").alias("p_word"),
                    F.col("q_child").alias("c_word"))
        )
        out = ent_pm if out is None else out.unionByName(ent_pm, allowMissingColumns=True)
    if q_rows:
        # question phraselets: the WH pole matches any answering word,
        # scored initial_question_word_answer_score (reference
        # manager.py:683-701 score 600)
        # the WH word gates the ANSWER's person-ness: who/wer requires a
        # person, what/was a non-person (reference question word
        # matching, en language_specific_rules.py:1327-1365)
        # 'what' matches ANY answer in the reference
        # (en language_specific_rules.py:1364-1365 returns True
        # unconditionally); only who/whom/wer gate on person-ness
        _GATE = {"who": "person", "whom": "person", "wer": "person",
                 "wen": "person", "wem": "person"}
        expand = [(t, lbl, pred, wh, _GATE.get(wh, "any"), ff, m, qprep,
                   pdisp)
                  for (t, lbl, pred, wh, ff, qprep, pdisp) in q_rows
                  for m in QUESTION_ANSWER_TEMPLATES.get(t, ())]
        # temporal adverbs answer 'when' through the adverbial template
        # ("the meeting took place YESTERDAY" — reference temporal
        # answer matching, en rules :1414-1424)
        expand += [(t, lbl, pred, wh, _GATE.get(wh, "any"), ff, extra_t,
                    qprep, pdisp)
                   for (t, lbl, pred, wh, ff, qprep, pdisp) in q_rows
                   if t == "head-WHadv"
                   for extra_t in (("governor-adjective",)
                                   if wh == "when" else
                                   ("predicate-actor",
                                    "prepgovernor-verb")
                                   if wh == "how" else
                                   ("prepgovernor-verb",)
                                   if wh == "why" else
                                   # DE: adverb/adjective answers ride
                                   # the verb-adverb template ("Ich
                                   # fahre LANGSAM/MORGEN"), clause
                                   # answers the prepgovernor-verb one
                                   # ("…, weil es stimmt"); bare
                                   # temporal NPs ("nächste Woche")
                                   # arrive as verb-acc
                                   ("verb-adverb", "prepgovernor-verb",
                                    "verb-acc")
                                   if wh == "wann" else
                                   ("verb-adverb", "prepgovernor-verb")
                                   if wh in ("wie", "woher", "warum",
                                             "wieso", "weshalb")
                                   else ())]
        if expand:
            from ..nlp.lexicon import (TEMPORAL_ADVERBS_EN,
                                       TEMPORAL_NOUNS_EN)
            from .structural import _WHEN_PREPS, _WHERE_PREPS
            qq = spark.createDataFrame(
                expand, "wh string, phraselet_label string, q_pred string, "
                        "wh_word string, gate string, freq_factor double, "
                        "template string, q_prep string, p_disp string")
            g_prep = F.col("prep")
            child_w = F.when(F.col("template").isin(*ACTOR_TEMPLATES),
                             F.col("subj")).otherwise(F.col("obj"))
            temporal_n = child_w.isin(*TEMPORAL_NOUNS_EN)
            temporal_adv = child_w.isin(*TEMPORAL_ADVERBS_EN)
            from ..nlp.lexicon import (TEMPORAL_ADVERBS_DE,
                                       TEMPORAL_NOUNS_DE, WANN_PREPS_DE,
                                       WO_PREPS_DE, WOHIN_PREPS_DE)
            temporal_n_de = child_w.isin(*TEMPORAL_NOUNS_DE)
            temporal_adv_de = child_w.isin(*TEMPORAL_ADVERBS_DE)
            wh = F.col("wh_word")
            # WH-class gates (reference question word matching,
            # en language_specific_rules.py:1327-1469): a fronted or
            # stranded question prep must equal the document prep; the
            # WH adverbs gate on the document prep class and the
            # answering word's temporality
            adv_ok = (
                ((wh == "where") & g_prep.isin(*_WHERE_PREPS)
                 & ~temporal_n)
                | ((wh == "when")
                   & ((g_prep.isin(*_WHEN_PREPS)
                       # time phrase: in/within + temporal noun
                       # ("in three weeks"); other preps with temporal
                       # nouns do NOT answer 'when' ("under dawn",
                       # reference :313-320)
                       | (temporal_n & g_prep.isin("in", "within")))
                      | ((F.col("template") == "governor-adjective")
                         & temporal_adv)))
                | ((wh == "how") & g_prep.isin("by", "with") & ~temporal_n)
                | ((wh == "why") & g_prep.isin(
                    "because", "because of", "owing to", "thanks to"))
                # --- German WH adverbs (reference de rules :2005-2125):
                # wo/wohin gate on the two-way preposition's CASE,
                # wann on temporal preps/nouns/adverbs + wenn-clauses,
                # wie on mit/mittels + plain adverbs + indem-clauses,
                # woher on aus/von/wegen + weil, warum/wieso on wegen +
                # weil/damit, and wo+POSTposition compounds (womit,
                # wodurch) match their embedded preposition
                | ((wh == "wo") & g_prep.isin(*WO_PREPS_DE)
                   & (F.col("prep_case") == "dat"))
                | ((wh == "wohin") & g_prep.isin(*WOHIN_PREPS_DE)
                   & (F.col("prep_case") == "acc"))
                | ((wh == "wann")
                   & ((g_prep.isin(*WANN_PREPS_DE)
                       & (F.col("template") != "prepgovernor-verb"))
                      | ((F.col("template") == "verb-adverb")
                         & temporal_adv_de)
                      | ((F.col("template") == "verb-acc")
                         & temporal_n_de)
                      | ((F.col("template") == "prepgovernor-verb")
                         & (g_prep == "wenn"))))
                | ((wh == "wie")
                   & (g_prep.isin("mit", "mittels")
                      | ((F.col("template") == "verb-adverb")
                         & ~temporal_adv_de)
                      | ((F.col("template") == "prepgovernor-verb")
                         & (g_prep == "indem"))))
                | ((wh == "woher")
                   & (((F.col("template") != "prepgovernor-verb")
                       & g_prep.isin("aus", "von", "wegen"))
                      | ((F.col("template") == "prepgovernor-verb")
                         & (g_prep == "weil"))))
                | (wh.isin("warum", "wieso", "weshalb")
                   & (((F.col("template") != "prepgovernor-verb")
                       & (g_prep == "wegen"))
                      | ((F.col("template") == "prepgovernor-verb")
                         & g_prep.isin("weil", "damit"))))
                | (wh.startswith("wo")
                   & ~wh.isin("wo", "wohin", "woher")
                   & (wh == F.concat(F.lit("wo"), g_prep)))
            )
            person_ok = ((F.col("gate") == "any")
                         | ((F.col("gate") == "person")
                            & F.col("child_is_gendered"))
                         | ((F.col("gate") == "thing")
                            & ~F.col("child_is_person")))
            prep_ok = (F.col("q_prep").isNull()
                       | (g_prep == F.col("q_prep")))
            q_m = (
                edges.withColumnRenamed("pred", "q_pred")
                .join(F.broadcast(qq), ["template", "q_pred"])
                .filter(F.when(wh.isin("where", "when", "how", "why",
                                       "wo", "wohin", "womit", "woher", "wodurch", "wann", "warum", "wieso", "weshalb", "wie"),
                               adv_ok)
                        .otherwise(person_ok & prep_ok))
                .select("url", "phraselet_label",
                        F.lit("question_answer").alias("kind"),
                        F.col("parent_idx").alias("position"),
                        "parent_idx", "child_idx",
                        F.lit(1.0).alias("penalty"), "freq_factor",
                        F.lit(None).cast("string").alias("matched"),
                        _direct_expl(F.col("p_disp")).alias("p_expl"),
                        # reference question.py:13-16
                        F.concat(F.lit("Matches the question word "),
                                 F.upper("wh_word"), F.lit("."))
                        .alias("c_expl"),
                        F.col("q_pred").alias("p_word"),
                        child_w.alias("c_word"),
                        # subword poles ride through so subword answers
                        # resolve to compound-part char spans
                        "parent_sub", "child_sub")
            )
            out = q_m if out is None else out.unionByName(q_m, allowMissingColumns=True)
    if word_ph:
        # word phraselets × closure are both driver-sized — expand and
        # dedup locally (mirror of the former broadcast join + groupBy
        # max_by(penalty, w_expl) shuffle; guide §2.4)
        qw_local = []
        for p in word_ph:
            disp = p.get("disp") or p["word"]
            for (m, pen, expl) in _expand_pole(p["word"], disp):
                qw_local.append((m, p["label"],
                                 float(p.get("freq_factor", 1.0)),
                                 bool(p.get("any_tag", False)),
                                 int(p.get("idx", 0)), pen, expl))
        if closure_rows:
            bestw: dict = {}
            for r in qw_local:
                key = r[:5]
                cur = bestw.get(key)
                if cur is None or (r[5], r[6]) > (cur[5], cur[6]):
                    bestw[key] = r
            qw_local = list(bestw.values())
        qw = spark.createDataFrame(
            qw_local,
            "word string, phraselet_label string, freq_factor double, "
            "q_any_tag boolean, ph_ord int, penalty double, w_expl string")
        word_m = (
            words.join(F.broadcast(qw), "word")
            .select("url", "phraselet_label",
                    F.when(F.col("q_any_tag"),
                           F.lit("single_word_any_tag"))
                     .otherwise(F.lit("single_word")).alias("kind"),
                    F.col("idx").alias("position"),
                    F.col("idx").alias("parent_idx"),
                    F.col("idx").alias("child_idx"),
                    "penalty", "freq_factor",
                    F.col("word").alias("matched"),
                    F.col("w_expl").alias("p_expl"),
                    F.lit(None).cast("string").alias("c_expl"),
                    F.col("word").alias("p_word"),
                    F.lit(None).cast("string").alias("c_word"),
                    "span_start", "span_end", "ph_ord", "subword_idx")
        )
        # first-match-wins per document token (reference strategy
        # chain: a direct repr match pre-empts the ontology
        # alternative at the same position, manager.py:163-214 +
        # remove_duplicates) — without this, 'word: horse' would match
        # doc 'wastage horse' BOTH directly (member repr) and through
        # the ontology (multiword row), and the ontology variant
        # would escape the multiword-span suppression below.
        # arg-max by (penalty, matched) as a map-side-combining hash
        # agg: duplicates collapse BEFORE the shuffle, unlike a
        # row_number window which shuffles + sorts every match row
        gcols = ["url", "phraselet_label", "kind", "position"]
        rest = F.struct("parent_idx", "child_idx", "penalty",
                        "freq_factor", "matched", "p_expl", "c_expl",
                        "p_word", "c_word", "span_start", "span_end",
                        "ph_ord", "subword_idx")
        # one url-keyed exchange serves the whole word branch: hash
        # partitioning on url satisfies the clustering required by the
        # position-dedup agg (url ⊆ its keys), the multiword-suppression
        # window (url) and the cross-phraselet dedup agg below, so none
        # of them re-shuffles (guide §2.4: two operations keyed the same
        # way share one exchange)
        word_m = (word_m.repartition("url")
                  .groupBy(*gcols)
                  # a WHOLE-WORD row wins over a subword row of the
                  # same label+token regardless of penalty (reference
                  # whole-word-beats-subword rejection,
                  # topic_matching.py:815-829: the ontology whole-word
                  # match at 0.9 beats the direct subword match); a
                  # DIRECT match (penalty 1.0) pre-empts any ontology
                  # alternative (the direct strategy precedes ontology
                  # in the chain, manager.py:163-214); among ontology
                  # matches the MULTIWORD beats the member token even
                  # when deeper (each strategy probes document
                  # multiwords before single tokens,
                  # word_matching/ontology.py:61-96 match_multiwords
                  # runs before match_token: query 'gymnastics
                  # equipment' matches doc 'waste horse' at depth 2,
                  # not member 'horse' at depth 1); then penalty, then
                  # the LONGER matched word (parsing.py:2630 sorts
                  # words_matching_root_token longest-first)
                  .agg(F.max_by(rest, F.struct(
                      (F.coalesce(F.col("subword_idx"), F.lit(-1)) < 0)
                      .cast("int"),
                      (F.col("penalty") >= 1.0).cast("int"),
                      F.coalesce(F.col("matched"), F.lit(""))
                      .contains(" ").cast("int"),
                      F.col("penalty"),
                      F.length("matched"),
                      F.col("matched")))
                       .alias("_r"))
                  .select(*gcols, "_r.parent_idx", "_r.child_idx",
                          "_r.penalty", "_r.freq_factor", "_r.matched",
                          "_r.p_expl", "_r.c_expl", "_r.p_word",
                          "_r.c_word", "_r.span_start", "_r.span_end",
                          "_r.ph_ord", "_r.subword_idx"))
        # single-word matches contained inside a MATCHED multiword
        # single-word match are superfluous (reference
        # remove_single_word_matches_made_superfluous_by_multiword_
        # matches, topic_matching.py:760-795): 'Richard Paul Hudson'
        # matching suppresses the member matches richard/paul/hudson,
        # but when only the members match they all score. One analytic
        # pass per url over the ALREADY position-deduped rows: the
        # (few) matched multiword spans are gathered with a window
        # collect_set, then each single-token row checks containment
        # with a codegen `exists` — no join, no second computation of
        # the word branch
        wu = Window.partitionBy("url")
        word_m = (
            word_m
            .withColumn("_mws", F.collect_set(
                F.when(F.col("span_end") > F.col("span_start"),
                       F.struct(F.col("span_start").alias("s"),
                                F.col("span_end").alias("e")))).over(wu))
            .filter((F.col("span_end") > F.col("span_start"))
                    | ~F.exists("_mws",
                                lambda x: (F.col("position") >= x["s"])
                                & (F.col("position") <= x["e"])))
            .drop("_mws", "span_start", "span_end"))
        wout = word_m if wout is None else wout.unionByName(word_m, allowMissingColumns=True)
    ent_word_ph = [w for w in ent_word_ph
                   if _ENT_CHILD_RE.match(w["word"]).group(1) != "noun"]
    if ent_word_ph and ents is not None:
        # ENTITY-placeholder single-word phraselets ("word: entitygpe")
        # match every corpus token with the label (ENTITYNOUN → any
        # non-compound noun) — the reference's entity word matching
        # applies to single-word topic phraselets too
        # (tests/en/test_topic_matching_EN.py:93-116 score the entity
        # word alongside the relation)
        # ENTITYNOUN has no reverse-dict key in the reference (the
        # noun scan only serves structural relation poles,
        # structural_matching.py:209-230), so a single-word ENTITYNOUN
        # phraselet never matches (tests/en/test_topic_matching_EN.py
        # :109-116 score only the relation for ENTITYNOUN but relation
        # + word for ENTITYGPE)
        ew = [(w["label"],
               _ENT_CHILD_RE.match(w["word"]).group(1).upper(),
               float(w.get("freq_factor", 1.0)), int(w.get("idx", 0)))
              for w in ent_word_ph
              if _ENT_CHILD_RE.match(w["word"]).group(1) != "noun"]
        qew = spark.createDataFrame(
            ew, "phraselet_label string, ent_spec string, "
                "freq_factor double, ph_ord int")
        ent_word_m = (
            ents.crossJoin(F.broadcast(qew))
            .filter(((F.col("ent_spec") == "NOUN") & F.col("is_noun"))
                    | ((F.col("ent_spec") == F.col("ent_type"))
                       & F.col("is_noun")))
            .select("url", "phraselet_label",
                    F.lit("single_word").alias("kind"),
                    F.col("idx").alias("position"),
                    F.col("idx").alias("parent_idx"),
                    F.col("idx").alias("child_idx"),
                    F.lit(1.0).alias("penalty"), "freq_factor",
                    F.concat(F.lit("ENTITY"), F.col("ent_spec"),
                             F.lit("@"), F.col("idx")).alias("matched"),
                    # reference entity.py:12-15
                    F.concat(F.lit("Has an entity label matching ENTITY"),
                             F.col("ent_spec"), F.lit("."))
                    .alias("p_expl"),
                    F.lit(None).cast("string").alias("c_expl"),
                    F.lit(None).cast("string").alias("p_word"),
                    F.lit(None).cast("string").alias("c_word"),
                    "ph_ord",
                    F.lit(None).cast("int").alias("subword_idx"))
        )
        wout = ent_word_m if wout is None else wout.unionByName(ent_word_m, allowMissingColumns=True)
    if wout is not None:
        # cross-phraselet duplicate removal (reference remove_duplicates,
        # topic_matching.py:797-847): all single-word matches at one
        # document token sort adjacently in the reference's
        # position-sorted match list and carry the identical token-index
        # set, so only the FIRST survives — and the original match order
        # follows phraselet creation order, i.e. query token order.
        # 'A dog chases an animal' → at a corpus 'dog' token, 'word: dog'
        # (query idx 1) beats the ontology match of 'word: animal'
        # (query idx 4). Map-side-combining arg-min agg on the query
        # token ordinal. Tag-checked phraselets (production pass 1)
        # precede every any-tag pass-2 phraselet in the reference's
        # dict insertion order, so they win position ties regardless
        # of query token order: 'word: wastage horse' (pass 1) beats
        # 'word: horse' (pass 2) at the same corpus token (reference
        # parsing.py:2418-2458 two-pass production + remove_duplicates
        # first-survives).
        wcols = [c for c in wout.columns
                 if c not in ("url", "position", "ph_ord")]
        # subwords are DISTINCT word positions in the reference's
        # duplicate rule (CorpusWordPosition = token + subword index,
        # topic_matching.py:832-846): word: mozart at (0,0) and
        # word: symphonie at (0,1) both survive
        wout = (wout.groupBy("url", "position",
                             F.coalesce("subword_idx", F.lit(-1))
                             .alias("_swg"))
                .agg(F.min_by(F.struct(*wcols, "ph_ord"),
                              F.struct((F.col("kind")
                                        == "single_word_any_tag")
                                       .cast("int"),
                                       F.col("ph_ord"),
                                       F.col("phraselet_label")))
                     .alias("_r"))
                .select("url", "position", *[F.col(f"_r.{c}").alias(c)
                                             for c in wcols]))
    if out is None and wout is None:
        # no phraselets (e.g. only stop lemmas) → no matches, like the
        # reference's early return (manager.py:844-845)
        return spark.createDataFrame(
            [], "url string, phraselet_label string, kind string, "
                "position int, parent_idx int, child_idx int, "
                "penalty double, freq_factor double, matched string, "
                "p_expl string, c_expl string, p_word string, "
                "c_word string")
    # duplicate removal over the RELATION-ish branches (reference
    # remove_duplicates, topic_matching.py:797-847: same phraselet +
    # same matched document tokens): one surviving match per
    # (document, phraselet, parent, child), keeping the
    # least-penalized alternative — exact-join duplicates arise from
    # ontology expansion mapping several query words onto the same
    # corpus word, and from the person-entity branch overlapping the
    # plain branch. Relation `position` is the PARENT (root) pole
    # index, the reference's index_within_document (set from the root
    # word match, structural_matching.py:446-447), which anchors
    # activation tracking and passage ordering.
    # Map-side-combining arg-max agg instead of a row_number window:
    # duplicate alternatives collapse before the shuffle. Word rows
    # are already unique per (url, label, kind, position) from their
    # own agg and skip this shuffle entirely.
    if out is not None:
        for c, t in (("intc", "boolean"), ("parent_sub", "int"),
                     ("child_sub", "int")):
            if c not in out.columns:
                out = out.withColumn(c, F.lit(None).cast(t))
        dcols = ["url", "phraselet_label", "parent_idx", "child_idx",
                 "kind"]
        drest = F.struct("position", "penalty", "freq_factor", "matched",
                         "p_expl", "c_expl", "p_word", "c_word", "intc",
                         "parent_sub", "child_sub")
        out = (out.groupBy(*dcols)
               # direct (penalty 1.0) beats ontology; among ontology
               # alternatives the multiword beats the member token even
               # when deeper (strategy chain order + match_multiwords
               # before match_token, word_matching/ontology.py:61-96);
               # then penalty; ties prefer the LONGER matched word
               # (multiword before member part, reference
               # parsing.py:2630)
               .agg(F.max_by(drest, F.struct(
                   (F.col("penalty") >= 1.0).cast("int"),
                   # the ontology-matched pole may be either parent or
                   # child — a multiword match on EITHER pole marks the
                   # multiword alternative
                   F.greatest(
                       F.coalesce(F.col("p_word"), F.lit(""))
                       .contains(" ").cast("int"),
                       F.coalesce(F.col("c_word"), F.lit(""))
                       .contains(" ").cast("int"),
                       F.coalesce(F.col("matched"), F.lit(""))
                       .contains(" ").cast("int")),
                   F.col("penalty"),
                   F.length("matched"),
                   F.col("matched")))
                    .alias("_r"))
               .select("url", "phraselet_label", "kind", "_r.position",
                       "parent_idx", "child_idx", "_r.penalty",
                       "_r.freq_factor", "_r.matched", "_r.p_expl",
                       "_r.c_expl", "_r.p_word", "_r.c_word", "_r.intc",
                       "_r.parent_sub", "_r.child_sub"))
    if wout is not None:
        out = wout if out is None else out.unionByName(wout, allowMissingColumns=True)
    # governed interrogatives: matches of a which/what-governed
    # phraselet ALSO emit an answer row at the governed pole — scored
    # initial_question_word_answer_score for relations, answer-only for
    # single words (reference tests/en/test_questions_EN.py:60-170:
    # 'Which politician lied?' scores above its non-question control,
    # 'Which man?' equals it but carries the answer span). Derived
    # from the already-deduped rows, so the extras are unique too.
    gov_rel = {p["label"]: p["wh_governed"] for p in rel_ph
               if p.get("wh_governed")}
    gov_word = [w["label"] for w in word_ph if w.get("wh_governed")]
    extras = []
    if gov_rel:
        parent_labels = [lbl for (lbl, pole) in gov_rel.items()
                         if pole == "parent"]
        child_labels = [lbl for (lbl, pole) in gov_rel.items()
                        if pole == "child"]
        g = out.filter(F.col("phraselet_label").isin(
            parent_labels + child_labels))
        is_par = F.col("phraselet_label").isin(parent_labels)
        extras.append(g.select(
            "url", "phraselet_label", F.lit("question_answer").alias("kind"),
            "position", "parent_idx",
            F.when(is_par, F.col("parent_idx")).otherwise(F.col("child_idx"))
            .alias("child_idx"),
            "penalty", "freq_factor", "matched", "p_expl",
            F.when(is_par, F.col("p_expl")).otherwise(F.col("c_expl"))
            .alias("c_expl"),
            "p_word",
            F.when(is_par, F.col("p_word")).otherwise(F.col("c_word"))
            .alias("c_word"),
            "parent_sub",
            # the governed pole's subword index rides along so subword
            # answers ('Welche Information' ↔ InformationsBETRACHTUNG)
            # resolve to compound-part char spans
            F.when(is_par, F.col("parent_sub"))
            .otherwise(F.col("child_sub")).alias("child_sub")))
    if gov_word:
        g = out.filter(F.col("phraselet_label").isin(gov_word))
        extras.append(g.select(
            "url", "phraselet_label",
            F.lit("question_answer_word").alias("kind"),
            "position", "parent_idx", "child_idx", "penalty",
            "freq_factor", "matched", "p_expl", "c_expl", "p_word",
            "c_word",
            # subword single-word answers keep their compound-part
            # index so the span narrows to the part
            *(["subword_idx"] if "subword_idx" in g.columns else [])))
    for e in extras:
        out = out.unionByName(e, allowMissingColumns=True)
    if chains is not None:
        # coref-proximity dominance (reference: the structural matcher
        # tries coreferents closest-first, structural_matching.py:
        # 573-581; the topic filter mirrors it at both poles,
        # topic_matching.py:702-738): when the same phraselet matches
        # the same anchor token with several COREFERRING tokens at the
        # other pole, only the mention closest to the anchor survives
        # (ties prefer the preceding mention). `chains` is a PAIR table
        # (url, a, b): token a's coreference chain indexes include b —
        # coordinated conjunct siblings are NOT linked (reference
        # Mention construction keeps only the token's own index inside
        # a coordinated mention, parsing.py:1119-1126), so "Richard and
        # Peter ... They came" keeps BOTH conjunct answers.
        # Single-word matches are exempt (reference
        # filter_superfluous_matches returns early for them).
        rel_kinds = ~F.col("kind").isin("single_word", "single_word_any_tag")
        cand = out.filter(rel_kinds)

        def dominated(anchor: str, other: str) -> DataFrame:
            x, y = cand.alias("x"), cand.alias("y")
            dx = F.abs(F.col(f"x.{other}") - F.col(f"x.{anchor}"))
            dy = F.abs(F.col(f"y.{other}") - F.col(f"y.{anchor}"))
            return (
                x.join(y, (F.col("x.url") == F.col("y.url"))
                       & (F.col("x.phraselet_label") == F.col("y.phraselet_label"))
                       & (F.col("x.kind") == F.col("y.kind"))
                       & (F.col(f"x.{anchor}") == F.col(f"y.{anchor}"))
                       & (F.col(f"x.{other}") != F.col(f"y.{other}")))
                .join(chains, (F.col("x.url") == F.col("chains.url"))
                      & (F.col(f"x.{other}") == F.col("chains.a"))
                      & (F.col(f"y.{other}") == F.col("chains.b")))
                .filter((dy < dx) | ((dy == dx)
                                     & (F.col(f"y.{other}") < F.col(f"x.{other}"))))
                .select(F.col("x.url").alias("url"),
                        F.col("x.phraselet_label").alias("phraselet_label"),
                        F.col("x.kind").alias("kind"),
                        F.col(f"x.parent_idx").alias("parent_idx"),
                        F.col(f"x.child_idx").alias("child_idx"))
                .distinct())

        chains = chains.alias("chains")
        bad = dominated("parent_idx", "child_idx").unionByName(
            dominated("child_idx", "parent_idx"))
        out = out.join(F.broadcast(bad),
                       ["url", "phraselet_label", "kind",
                        "parent_idx", "child_idx"], "left_anti")
    return out


def _score_docs(params: dict):
    def score_one(url: str, rows: list[dict]) -> list[dict]:
        ms = rows  # caller sorts (position, relation-before-single,
        #            label) — the reference's position_sorted order
        #            (topic_matching.py:556-560 sort key ends with
        #            from_single_word_phraselet)
        max_d = params["maximum_activation_distance"]
        # per-phraselet activation with linear decay (reference
        # topic_matching.py:867-1054): match score = Σ live activations
        last_pos: dict[str, float] = {}
        last_act: dict[str, float] = {}
        base_scores = {
            "relation": params["relation_score"],
            "relation_reverse_only": params["reverse_only_relation_score"],
            "single_word": params["single_word_score"],
            "single_word_any_tag": params["single_word_any_tag_score"],
            "question_answer": params["initial_question_word_answer_score"],
            # governed single-word answers carry the span, not a score
            "question_answer_word": 0.0,
        }
        entries: list[dict] = []
        # governed single-word answers are zero-score SPAN CARRIERS
        # riding on their base word match (reference folds them into
        # the match's word infos) — they join the passage of whatever
        # cluster covers their position instead of walking as matches
        qaw_by_pos: dict[int, list[int]] = {}
        for r in ms:
            if r["kind"] == "question_answer_word":
                ci = int(r.get("child_idx", r["position"]))
                sw0 = r.get("subword_idx")
                qaw_by_pos.setdefault(int(r["position"]), []).append(
                    SUB_ANSWER_BASE + ci * 1000 + int(sw0)
                    if sw0 is not None and int(sw0) >= 0 else ci)
        ms = [r for r in ms if r["kind"] != "question_answer_word"]

        # --- German subword rules (reference topic_matching.py:
        # 800-846 remove_duplicates + :886-893):
        def _sw(r):
            v = r.get("subword_idx")
            return -1 if v is None else int(v)

        def _subword_anchored(r):
            # single-word match against a compound part, or any match
            # against an intcompound corpus edge (its word matches ARE
            # subwords)
            return (_sw(r) >= 0) or bool(r.get("intc"))

        if any(_subword_anchored(r) for r in ms):
            # 1. a whole-word SINGLE-word match at a token rejects
            #    every subword-anchored match at that token ("the
            #    whole word has also been matched")
            whole = {int(r["position"]) for r in ms
                     if r["kind"].startswith("single_word")
                     and _sw(r) < 0}
            ms = [r for r in ms
                  if not (_subword_anchored(r)
                          and int(r["position"]) in whole)]

        def _intc_same_word(r):
            # intcompound relation whose poles sit in ONE document
            # word scores like a single-word match and joins neither
            # the overlap map nor the multiplier (reference
            # topic_matching.py:886-893, 907-913, 950-953)
            return (r["phraselet_label"].startswith("intcompound")
                    and int(r.get("parent_idx", r["position"]))
                    == int(r.get("child_idx", r["position"])))

        # overlap map built from every surviving relation-kind match's
        # BOTH poles (reference builds
        # document_labels_to_indexes_to_phraselet_labels over parent
        # and child word matches AFTER duplicate removal and EXCLUDING
        # same-word intcompound matches, topic_matching.py:904-913) —
        # so the first relation processed at a shared anchor is
        # already ×1.5, and child-side sharing counts too
        def _pole_keys(r):
            # overlap map keys are (token, subword) positions — the
            # reference's CorpusWordPosition granularity: relations
            # anchored on DIFFERENT parts of one compound do not
            # overlap (topic_matching.py:904-933)
            pos = int(r["position"])
            ps = r.get("parent_sub")
            cs = r.get("child_sub")
            return ((int(r.get("parent_idx", pos)),
                     -1 if ps is None else int(ps)),
                    (int(r.get("child_idx", pos)),
                     -1 if cs is None else int(cs)))

        idx_labels: dict[tuple[int, int], set[str]] = {}
        for r in ms:
            if (r["kind"].startswith("relation")
                    or r["kind"] == "question_answer") \
                    and not _intc_same_word(r):
                for k in _pole_keys(r):
                    idx_labels.setdefault(k, set()).add(r["phraselet_label"])

        for r in ms:
            lbl, pos, kind = r["phraselet_label"], int(r["position"]), r["kind"]
            if kind.startswith("relation") and _intc_same_word(r):
                kind = "single_word"
            base = (base_scores[kind] * float(r.get("freq_factor", 1.0))
                    * float(r.get("penalty", 1.0)))
            overlap = False
            if kind.startswith("relation") or kind == "question_answer":
                k1, k2 = _pole_keys(r)
                others = (idx_labels.get(k1, set())
                          | idx_labels.get(k2, set()))
                if any(o != lbl for o in others):
                    base *= params["overlapping_relation_multiplier"]
                    overlap = True
            # decay previous activation of this phraselet; a repeat
            # match RESETS to its own score if higher, else keeps the
            # decayed activation (reference topic_matching.py:1021-1028
            # — NOT additive)
            act = base
            if lbl in last_pos:
                dist = pos - last_pos[lbl]
                decayed = last_act[lbl] * max(0.0, 1.0 - dist / max_d)
                act = max(base, decayed)
            last_pos[lbl], last_act[lbl] = pos, act
            total = act
            for other, opos in last_pos.items():
                if other == lbl:
                    continue
                d = pos - opos
                dec = last_act[other] * max(0.0, 1.0 - d / max_d)
                total += dec
            entries.append({
                "lbl": lbl, "pos": pos, "kind": kind, "overlap": overlap,
                "p_idx": int(r.get("parent_idx", pos)),
                "c_idx": int(r.get("child_idx", pos)),
                "c_sub": (int(r["child_sub"])
                          if r.get("child_sub") is not None else -1),
                "p_sub": (int(r["parent_sub"])
                          if r.get("parent_sub") is not None
                          else int(r["subword_idx"])
                          if r.get("subword_idx") is not None else -1),
                "p_expl": r.get("p_expl"), "c_expl": r.get("c_expl"),
                "p_word": r.get("p_word"), "c_word": r.get("c_word"),
                "total": total,
            })
        if not entries:
            return []
        # ---- topic match generation: the reference's walk verbatim
        # (generate_topic_matches, topic_matching.py:1056-1224): every
        # match is a peak candidate in topic-score order (stable for
        # ties); a candidate whose anchor falls inside an existing
        # passage is skipped; the passage is the CONTIGUOUS run of
        # position-sorted matches around the peak, extended left while
        # the match nearer the peak scores ABOVE the cutoff (strict >)
        # and right while the candidate itself scores >= the cutoff,
        # both capped at sideways_match_extent from the peak and
        # stopped at matches already inside other passages. There is
        # NO cutoff on the peaks themselves — only containment and
        # number_of_results bound the result count.
        n = len(entries)
        order = sorted(range(n), key=lambda i: -entries[i]["total"])
        cutoff = params["different_match_cutoff_score"]
        extent = params["sideways_match_extent"]
        k_cap = params["number_of_results"]
        spans: list[tuple[int, int]] = []
        type_rank = {"single": 0, "relation": 1, "overlapping_relation": 2}
        out = []

        def contained(j):
            pj = entries[j]["pos"]
            return any(s <= pj <= e for (s, e) in spans)

        def widen(j, start, end):
            # the reference widens by each word match's first..last
            # document token (alter_start_and_end_indexes_for_match,
            # topic_matching.py:1079-1096) — a matched MULTIWORD spans
            # its member tokens, which sit left of the anchor (both
            # PROPN-run and ontology multiwords anchor on their last
            # token), so the span start backs up by the member count
            e = entries[j]
            p_first = e["p_idx"] - (e["p_word"] or "").count(" ")
            c_first = e["c_idx"] - (e["c_word"] or "").count(" ")
            return (min(start, p_first, c_first),
                    max(end, e["p_idx"], e["c_idx"]))

        for i in order:
            if len(out) >= k_cap:
                break
            if contained(i):
                continue
            peak = entries[i]
            start, end = widen(i, peak["pos"], peak["pos"])
            lo = hi = i
            while (lo > 0 and entries[lo]["total"] > cutoff
                   and not contained(lo - 1)
                   and peak["pos"] - entries[lo - 1]["pos"] <= extent):
                lo -= 1
                start, end = widen(lo, start, end)
            while (hi + 1 < n and entries[hi + 1]["total"] >= cutoff
                   and not contained(hi + 1)
                   and entries[hi + 1]["pos"] - peak["pos"] <= extent):
                hi += 1
                start, end = widen(hi, start, end)
            spans.append((start, end))
            cluster = entries[lo:hi + 1]
            # word infos + question answers (reference
            # topic_matching.py:1288-1483): one entry per (document
            # token, matched document word) — distinct matched words at
            # one token resolve to DIFFERENT char spans downstream
            # (single 'hudson' vs multiword 'richard paul hudson'), so
            # they stay separate here and the char-span containment
            # filter in with_passage_text reconciles them like the
            # reference's WordInfo span dict. Exact-duplicate entries
            # upgrade their type only (overlapping_relation > relation
            # > single), keeping the first explanation, mirroring the
            # reference's word_infos_to_word_infos merge
            # (topic_matching.py:1370-1377).
            infos: dict[tuple, list] = {}
            answers: set[int] = set()
            for e in cluster:
                lbl, kind, overlap = e["lbl"], e["kind"], e["overlap"]
                p_idx, c_idx = e["p_idx"], e["c_idx"]
                # WH-adverb answers span the whole prepositional
                # phrase ("in the office"); who/what answers span
                # only the nominal ("its man") — encoded for the
                # char-span stage as -(idx+1) (reference answer
                # spans, en rules :1367-1429)
                wh_adv = lbl.split(": ", 1)[0].endswith("WHadv")
                # each token's explanation is its word match's
                # strategy explanation (reference passes
                # word_match.explanation into WordInfo,
                # topic_matching.py:1311-1330)
                if kind.startswith("single_word"):
                    word = lbl.split(": ", 1)[-1]
                    ents = [(p_idx, "single", e["p_expl"]
                             or f"Matches {word.upper()} directly.",
                             e["p_word"], e.get("p_sub", -1))]
                else:
                    typ = "overlapping_relation" if overlap else "relation"
                    ents = [(p_idx, typ, e["p_expl"], e["p_word"],
                             e.get("p_sub", -1)),
                            (c_idx, typ, e["c_expl"], e["c_word"],
                             e.get("c_sub", -1))]
                    if kind == "question_answer":
                        if e.get("c_sub", -1) >= 0:
                            # subword answer ('Was betrachtet man?' →
                            # the INFORMATION part of
                            # Informationsbetrachtung): encoded as
                            # SUB_ANSWER_BASE + token*1000 + subword;
                            # resolved to the compound-prefix char
                            # span downstream (reference de subword
                            # answers, tests/de/test_questions_DE.py
                            # :35-57)
                            answers.add(SUB_ANSWER_BASE
                                        + c_idx * 1000 + e["c_sub"])
                        else:
                            answers.add(-(c_idx + 1) if wh_adv
                                        else c_idx)
                for (ti, typ, expl, word, sub) in ents:
                    cur = infos.get((ti, word, sub))
                    if cur is None:
                        infos[(ti, word, sub)] = [ti, typ, expl, word,
                                                  sub]
                    elif type_rank[typ] > type_rank[cur[1]]:
                        cur[1] = typ  # keep first explanation
            for p2 in {e2["pos"] for e2 in cluster}:
                for a_idx in qaw_by_pos.get(p2, ()):
                    answers.add(a_idx)
            out.append({"url": url, "start_idx": start, "end_idx": end,
                        # the reference's index_within_document: the
                        # anchor token of the peak structural match
                        "index_within_document": peak["pos"],
                        "score": peak["total"],
                        "n_matches": hi - lo + 1,
                        "word_infos": [
                            {"token_idx": v[0], "type": v[1],
                             "explanation": v[2], "word": v[3],
                             "subword_idx": (v[4] if v[4] >= 0
                                             else None)}
                            for k, v in sorted(infos.items(),
                                               key=lambda kv: (kv[0][0],
                                                               kv[0][1] or ""))],
                        "subword_index": (peak.get("p_sub", -1)
                                          if peak.get("p_sub", -1) >= 0
                                          else None),
                        "answer_idxs": sorted(answers)})
        return out
    return score_one


def _wi_type_rank(t):
    return (F.when(t == "overlapping_relation", 3)
            .when(t == "relation", 2).otherwise(1))


def with_passage_text(topic_df: DataFrame, docs: DataFrame,
                      tied_result_quotient: float = 0.9) -> DataFrame:
    """Attach the passage's surface text and convert the token-indexed
    word_infos/answer_idxs to passage-relative CHARACTER spans — the
    reference reports the sentence-expanded passage text, char-span
    word_infos, and char-span answers in its topic match dicts
    (topic_matching.py:1190-1197 sentence expansion, 1226-1485 char
    spans via spaCy ``token.idx``). Char-exact: the parser keeps each
    token's offset in the original text (``char_start``) and the docs
    table retains ``text``, so every span is a substring of the real
    document — hyphens, original spacing and all.

    Reference-faithful word_infos pipeline, all as column exprs:
    multiword spans resolve through the token's multiword table (the
    reference's first..last_document_token, :1301-1309), word infos
    strictly contained in another are dropped and same-span duplicates
    keep the dominant type (:1260-1277, 1370-1385), the peak token's
    info — or its container — is flagged is_highest_activation
    (:1379-1421), answers contained in longer answers are dropped
    (:1429-1453), and results are ordered (score desc, passage word
    count desc, label, first info) with chained tie groups rendered as
    reference rank strings '1=' (TopicMatchDictionaryOrderer,
    :1488-1524)."""
    toks = docs.select("url", "tokens", F.col("text").alias("_doc_text"))
    joined = topic_df.join(toks, "url", "left")

    def _wi_token_idxs(w):
        # the matched document word decides the token extent: a
        # multiword ('richard paul hudson') spans its token range; an
        # entity match (word NULL) spans the token's entity multiword;
        # plain words span the token (reference first..last_document_
        # token, topic_matching.py:1301-1309)
        cand = F.element_at(F.col("tokens"), w["token_idx"] + 1)["multiwords"]
        mw = F.filter(cand, lambda m: (m["lemma"] == w["word"])
                      | (m["derived_lemma"] == w["word"])
                      | (F.lower(m["text"]) == w["word"]))
        is_ent = (w["word"].isNull()
                  & w["explanation"].startswith("Has an entity label"))
        # an entity-label match spans the token's WIDEST multiword
        # (the full entity run — an ontology multiword over a subset of
        # the name must not shrink an ENTITYPERSON span)
        widest = F.aggregate(
            cand, F.element_at(cand, 1),
            lambda acc, m: F.when(
                F.size(m["token_indexes"]) > F.size(acc["token_indexes"]),
                m).otherwise(acc))
        return (F.when(F.size(mw) > 0,
                       F.element_at(mw, 1)["token_indexes"])
                .when(is_ent & (F.size(cand) > 0),
                      widest["token_indexes"])
                .otherwise(F.array(w["token_idx"])))

    # multiword-aware start/end token indexes (reference
    # alter_start_and_end_indexes_for_match widens the passage to each
    # word match's first..last document token, :1135-1151 — our scoring
    # stage only knows anchor tokens, so the widening happens here
    # where the multiword table is available)
    wi_lo = F.array_min(F.transform(
        "word_infos", lambda w: F.array_min(_wi_token_idxs(w))))
    wi_hi = F.array_max(F.transform(
        "word_infos", lambda w: F.array_max(_wi_token_idxs(w))))
    joined = (joined
              .withColumn("start_idx", F.least("start_idx",
                                               F.coalesce(wi_lo, F.col("start_idx"))))
              .withColumn("end_idx", F.greatest("end_idx",
                                                F.coalesce(wi_hi, F.col("end_idx")))))

    # sentence expansion (reference topic_matching.py:1190-1197): the
    # passage runs from the first token of start_idx's sentence to the
    # last token of end_idx's sentence
    s_sent = _t_at(F.col("start_idx"))["sent_idx"]
    e_sent = _t_at(F.col("end_idx"))["sent_idx"]
    sent_cs = F.array_min(F.transform(
        F.filter(F.col("tokens"), lambda t: t["sent_idx"] == s_sent),
        lambda t: t["char_start"]))
    sent_ce = F.array_max(F.transform(
        F.filter(F.col("tokens"), lambda t: t["sent_idx"] == e_sent),
        lambda t: t["char_start"] + F.length(t["text"])))
    sent_si = F.array_min(F.transform(
        F.filter(F.col("tokens"), lambda t: t["sent_idx"] == s_sent),
        lambda t: t["i"]))
    sent_ei = F.array_max(F.transform(
        F.filter(F.col("tokens"), lambda t: t["sent_idx"] == e_sent),
        lambda t: t["i"]))

    def tok(idx):
        return F.element_at(F.col("tokens"), idx + 1)

    def rel_start(idx):
        return tok(idx)["char_start"] - F.col("_sent_cs")

    def wi_resolved(w, i):
        idxs = _wi_token_idxs(w)
        lo, hi = F.array_min(idxs), F.array_max(idxs)
        # subword match: span only the compound part, against the
        # token that physically CONTAINS it (borrowed subwords of
        # hyphenated conjuncts live in their neighbour's surface —
        # reference WordInfo subword spans, de topic dict tests
        # :380-456)
        sub = F.element_at(tok(w["token_idx"])["subwords"],
                           w["subword_idx"] + 1)
        host = F.coalesce(sub["containing_i"], w["token_idx"])
        sub_s = rel_start(host) + sub["char_start"]
        is_sub = w["subword_idx"].isNotNull() & sub.isNotNull()
        return F.struct(
            F.when(is_sub, sub_s).otherwise(rel_start(lo)).alias("s"),
            F.when(is_sub, sub_s + F.length(sub["text"]))
            .otherwise(rel_start(hi) + F.length(tok(hi)["text"]))
            .alias("e"),
            w["type"].alias("type"),
            w["explanation"].alias("explanation"),
            i.alias("i"))

    def contained_or_dominated(w):
        # strict span containment (reference get_containing_word_info_
        # key) or an exact-span duplicate with a dominant type /
        # earlier insertion
        return lambda o: (
            ((w["s"] > o["s"]) & (w["e"] <= o["e"]))
            | ((w["s"] >= o["s"]) & (w["e"] < o["e"]))
            | ((o["s"] == w["s"]) & (o["e"] == w["e"])
               & ((_wi_type_rank(o["type"]) > _wi_type_rank(w["type"]))
                  | ((_wi_type_rank(o["type"]) == _wi_type_rank(w["type"]))
                     & (o["i"] < w["i"])))))

    _pk_sub = F.element_at(tok(F.col("index_within_document"))["subwords"],
                           F.col("subword_index") + 1)
    _pk_on_sub = F.col("subword_index").isNotNull() & _pk_sub.isNotNull()
    pk_s = F.when(
        _pk_on_sub,
        rel_start(F.coalesce(_pk_sub["containing_i"],
                             F.col("index_within_document")))
        + _pk_sub["char_start"]
    ).otherwise(rel_start(F.col("index_within_document")))
    pk_e = F.when(
        _pk_on_sub, pk_s + F.length(_pk_sub["text"])
    ).otherwise(pk_s
                + F.length(tok(F.col("index_within_document"))["text"]))

    def pk_contains(w):
        return (w["s"] <= pk_s) & (w["e"] >= pk_e)

    out = (
        joined.withColumn("_sent_cs", sent_cs)
        .withColumn("sentences_start_index", sent_si)
        .withColumn("sentences_end_index", sent_ei)
        .withColumn("sentences_character_start_index", F.col("_sent_cs"))
        .withColumn("sentences_character_end_index", sent_ce)
        .withColumn(
            "passage_text",
            F.substring(F.col("_doc_text"), F.col("_sent_cs") + 1,
                        sent_ce - F.col("_sent_cs")))
        .withColumn("_wi", F.transform("word_infos", wi_resolved))
        .withColumn("_wi", F.filter(
            "_wi", lambda w: ~F.exists("_wi", contained_or_dominated(w))))
        .withColumn("_minlen", F.array_min(F.transform(
            F.filter("_wi", pk_contains), lambda w: w["e"] - w["s"])))
        .withColumn("word_infos", F.array_sort(F.transform(
            "_wi", lambda w: F.struct(
                w["s"].alias("relative_start_index"),
                w["e"].alias("relative_end_index"),
                w["type"].alias("type"),
                F.coalesce(pk_contains(w)
                           & ((w["e"] - w["s"]) == F.col("_minlen")),
                           F.lit(False)).alias("is_highest_activation"),
                w["explanation"].alias("explanation")))))
        # answers over a coordination split into one answer per
        # conjunct (reference splits coordinated answer spans,
        # tests/en/test_questions_EN.py:365-382: 'in a house and a
        # flat' answers 'a house' AND 'a flat'): each encoded answer
        # expands with its root's righthand siblings, preserving the
        # WH-adverb promotion encoding
        .withColumn("answer_idxs", F.array_distinct(F.flatten(F.transform(
            "answer_idxs", lambda enc: F.when(
                enc >= SUB_ANSWER_BASE, F.array(enc)).otherwise(F.concat(
                    F.array(enc),
                    F.transform(
                        tok(F.when(enc < 0, -enc - 1).otherwise(enc))
                        ["righthand_siblings"],
                        lambda s: F.when(enc < 0, -(s + 1)).otherwise(s))))))))
        .withColumn("_answers", F.transform(
            "answer_idxs", lambda enc: F.when(
                enc >= SUB_ANSWER_BASE,
                # subword answer: span from the compound's first
                # subword through the MATCHED subword's end
                # ('Extraktionsinformationsbetrachtung' answering
                # 'Welche Information' spans 'Extraktionsinformation',
                # reference tests/de/test_questions_DE.py:44-47)
                _sub_answer(tok, rel_start, enc)).otherwise(F.struct(
                    rel_start(_ans_lo(enc)).alias("relative_start_index"),
                    (rel_start(_ans_hi(enc))
                     + F.length(tok(_ans_hi(enc))["text"])
                     ).alias("relative_end_index"),
                    F.substring(
                        F.col("_doc_text"),
                        tok(_ans_lo(enc))["char_start"] + 1,
                        tok(_ans_hi(enc))["char_start"]
                        + F.length(tok(_ans_hi(enc))["text"])
                        - tok(_ans_lo(enc))["char_start"]).alias("text")))))
        # drop answers contained within longer answers (reference
        # topic_matching.py:1429-1453)
        .withColumn("answers", F.array_sort(F.filter(
            "_answers", lambda a: ~F.exists(
                "_answers", lambda o:
                ((o["relative_start_index"] < a["relative_start_index"])
                 & (o["relative_end_index"] >= a["relative_end_index"]))
                | ((o["relative_start_index"] == a["relative_start_index"])
                   & (o["relative_end_index"] > a["relative_end_index"]))))))
        .drop("tokens", "answer_idxs", "_answers", "_doc_text",
              "_sent_cs", "_wi", "_minlen", "rank", "tied"))
    # reference result ordering + rank strings
    # (TopicMatchDictionaryOrderer, topic_matching.py:1495-1524): score
    # desc, passage word count desc, label, first word info. Tie groups
    # are LEADER-based, not pairwise: a following result joins the
    # current group iff its score / the GROUP LEADER's score exceeds
    # tied_result_quotient; every member of a >1 group renders as 'N='.
    # That recursion isn't a closed-form window expr, but this frame is
    # the already-top-k result (≤ number_of_results rows), so the
    # (_rn, score) pairs — and only those — come to the driver and the
    # rank strings broadcast-join back.
    wc = F.size(F.split(F.trim("passage_text"), r"\s+"))
    # constant-but-NON-FOLDABLE partition key (length(url)*0 == 0 for
    # every row, but Catalyst cannot fold it away like a bare lit):
    # this frame is the already-top-k result (≤ number_of_results
    # rows), and the real partition key keeps WindowExec from logging
    # single-partition warnings that would mask real ones
    worder = (Window.partitionBy(F.length("url") * 0)
              .orderBy(F.desc("score"), F.desc(wc), "url",
                       F.col("word_infos")[0]["relative_start_index"]))
    out = (out.withColumn("_rn", F.row_number().over(worder))
           .withColumn("rank", F.lit(None).cast("string")))
    sch = out.drop("_rn").schema
    names = [f.name for f in sch.fields]
    q = float(tied_result_quotient)

    def _rank_batches(batches):
        dfs = [b for b in batches if len(b)]
        if not dfs:
            return
        df = pd.concat(dfs).sort_values("_rn")
        scores = df["score"].tolist()
        labels: list[str] = []
        i = 0
        while i < len(scores):
            j = i + 1
            # a zero-score leader can never tie (the reference shares
            # the same quotient; guarding keeps a degenerate all-zero
            # frame from crashing the whole job instead of one call)
            while (j < len(scores) and scores[i] > 0
                   and scores[j] / scores[i] > q):
                j += 1
            labels += [f"{i + 1}=" if j - i > 1 else str(i + 1)] * (j - i)
            i = j
        df["rank"] = labels
        yield df[names]

    return out.coalesce(1).mapInPandas(_rank_batches, schema=sch)


def _t_at(j):
    return F.element_at(F.col("tokens"), j + 1)


def _ans_members(enc):
    """Tokens of the answer's dependency SUBTREE — the reference
    reports the matched token's whole span as the answer ("The adopted
    child", "in the office"; topic_matching.py:1336-1360). WH-adverb
    answers arrive encoded as -(idx+1): their pobj/pcomp token is
    promoted to the governing preposition so locative/temporal answers
    carry the prep ("in the office"); who/what answers keep the
    nominal only ("its man"). Membership = head chain (≤4 hops)
    reaches the answer root, same sentence, punctuation excluded."""
    idx = F.when(enc < 0, -enc - 1).otherwise(enc)
    root = F.when((enc < 0) & _t_at(idx)["dep"].isin("pobj", "pcomp"),
                  _t_at(idx)["head"]).otherwise(idx)

    def hits(t):
        # each hop is blocked at conjuncts: the span of 'Richard
        # Hudson' must not swallow 'and Peter Hudson' (the reference
        # spans one conjunct, topic_matching.py:1336-1360)
        nc = lambda j: _t_at(j)["dep"] != "conj"  # noqa: E731
        h1 = t["head"]
        h2 = _t_at(h1)["head"]
        h3 = _t_at(h2)["head"]
        h4 = _t_at(h3)["head"]
        reach = ((t["i"] == root)
                 | ((h1 == root) & (t["dep"] != "conj"))
                 | ((h2 == root) & (t["dep"] != "conj") & nc(h1))
                 | ((h3 == root) & (t["dep"] != "conj") & nc(h1) & nc(h2))
                 | ((h4 == root) & (t["dep"] != "conj") & nc(h1) & nc(h2)
                    & nc(h3)))
        return (reach & (t["sent_idx"] == _t_at(root)["sent_idx"])
                & (t["pos"] != "PUNCT") & (t["dep"] != "cc")
                # a non-promoted answer never swallows a preposition
                # ("What did you live in?" answers 'a house', not 'in
                # a house'; promoted WH-adverb answers carry the prep)
                & ~((enc >= 0) & (t["pos"] == "ADP")))

    return F.filter(F.col("tokens"), hits)


def _sub_answer(tok, rel_start, enc):
    """Char span of a subword answer: from the owning token's first
    subword to the matched subword's end (both offsets are relative to
    the token surface)."""
    ti = F.floor((enc - SUB_ANSWER_BASE) / 1000).cast("int")
    si = (enc - SUB_ANSWER_BASE) % 1000
    t = tok(ti)
    first = F.element_at(t["subwords"], 1)
    hit = F.element_at(t["subwords"], (si + 1).cast("int"))
    s = rel_start(ti) + first["char_start"]
    e = (rel_start(ti) + hit["char_start"] + F.length(hit["text"]))
    return F.struct(
        s.alias("relative_start_index"),
        e.alias("relative_end_index"),
        F.substring(F.col("_doc_text"),
                    t["char_start"] + first["char_start"] + 1,
                    hit["char_start"] + F.length(hit["text"])
                    - first["char_start"]).alias("text"))


def _ans_lo(idx):
    return F.array_min(F.transform(_ans_members(idx), lambda t: t["i"]))


def _ans_hi(idx):
    return F.array_max(F.transform(_ans_members(idx), lambda t: t["i"]))


def plan_selective_retries(rel_ph: list[dict], word_ph: list[dict],
                           freq_factors: DataFrame,
                           closure: DataFrame | list | None,
                           params: dict) -> tuple[list[dict], list[dict]]:
    """The reference's selective retry planning (topic_matching.py:
    379-549 + parsing.py:1852-1885): per-pole frequency factors decide
    how far each relation phraselet is pursued.

    - pole ff = min ff over the word and its ontology reprs (the
      reference takes the max corpus frequency over the expanded word
      set, parsing.py:1852-1877 — ff is monotone-decreasing in
      frequency, so min-ff ≡ max-frequency);
    - parent ff < relation_matching_frequency_threshold → the phraselet
      is treated reverse-only during initial relation matching
      (parsing.py:2308-2320); combined with a frequent child
      (child ff < threshold) it is never relation-matched at all
      (topic_matching.py:463-470 falls through to ``return``);
    - child-embedding retries require parent ff ≥
      embedding_matching_frequency_threshold (topic_matching.py:429);
    - phraselet score deflation ff = parent ff × child ff
      (parsing.py:1879-1885).

    The lookups are a filtered collect on the freq_factors table —
    a handful of query words pushed down as an IN-filter, so the
    driver pulls O(|query| × closure fanout) rows regardless of
    vocabulary size."""
    rel_th = params["relation_matching_frequency_threshold"]
    emb_th = params["embedding_matching_frequency_threshold"]
    poles: set[str] = set()
    for p in rel_ph:
        poles.add(p["pred"])
        if not p["template"].startswith("head-"):
            poles.add(p["obj"] if p["template"] not in ACTOR_TEMPLATES
                      else p["subj"])
    poles |= {p["word"] for p in word_ph}
    # ENTITY placeholder poles probe the entity postings under their
    # uppercase repr (reference reverse_dict keys 'ENTITYGPE' etc., so
    # get_frequency_factor_for_pole sees the real corpus frequency of
    # the label — word_matching/entity.py:80-114, parsing.py:1852-1877)
    # ENTITYNOUN has no reverse-dict key in the reference → its pole
    # frequency factor stays 1.0 (parsing.py:1865-1870: empty
    # frequency list returns 1.0)
    expanded: dict[str, set[str]] = {
        w: (set() if m.group(1) == "noun"
            else {f"ENTITY{m.group(1).upper()}"})
        if (m := _ENT_CHILD_RE.match(w)) else {w}
        for w in poles}
    if closure is not None:
        for (cq, cw, _d) in (_as_closure_rows(closure) or []):
            if cq in expanded:
                expanded[cq].add(cw)
    all_words = set().union(*expanded.values()) if expanded else set()
    ff_map = {}
    if all_words:
        ff_map = {r["repr"]: r["frequency_factor"]
                  for r in freq_factors
                  .filter(F.col("repr").isin(*all_words))
                  .select("repr", "frequency_factor").collect()}

    def pole_ff(w: str) -> float:
        vals = [ff_map[x] for x in expanded.get(w, {w}) if x in ff_map]
        return min(vals) if vals else 1.0

    out_rel = []
    for p in rel_ph:
        p = dict(p)
        parent_ff = pole_ff(p["pred"])
        if p["template"].startswith("head"):
            p["freq_factor"] = parent_ff
            out_rel.append(p)
            continue
        if p.get("wh_governed"):
            # a pole governed by an initial question word bypasses every
            # frequency gate (reference add_indexes_for_reverse_matching
            # checks has_initial_question_word_in_phrase at each
            # threshold decision, topic_matching.py:406-470)
            child = (p["obj"] if p["template"] not in ACTOR_TEMPLATES
                     else p["subj"])
            p["freq_factor"] = parent_ff * pole_ff(child)
            p["emb_retry"] = True
            p["parent_emb_retry"] = True
            out_rel.append(p)
            continue
        child = (p["obj"] if p["template"] not in ACTOR_TEMPLATES
                 else p["subj"])
        child_ff = pole_ff(child)
        static_rev = (bool(p.get("reverse_only"))
                      or p["template"] in REVERSE_ONLY_TEMPLATES)
        treat_rev = parent_ff < rel_th
        if (static_rev or treat_rev) and child_ff < rel_th:
            continue  # never relation-matched
        p["freq_factor"] = parent_ff * child_ff
        p["emb_retry"] = parent_ff >= emb_th
        # parent (root) embedding retry is planned off the CHILD
        # pole's frequency factor (reference topic_matching.py:456-461:
        # child_frequency_factor >= embedding_matching_frequency_
        # threshold -> parent_embedding_retry_corpus_word_positions)
        p["parent_emb_retry"] = child_ff >= emb_th
        out_rel.append(p)
    out_word = []
    for p in word_ph:
        p = dict(p)
        p["freq_factor"] = pole_ff(p["word"])
        out_word.append(p)
    return out_rel, out_word


def topic_match(spark: SparkSession, edges: DataFrame, words: DataFrame,
                query_text: str, lang: str = "en",
                closure: DataFrame | list | None = None,
                freq_factors: DataFrame | None = None,
                vectors: dict[str, list[float]] | None = None,
                embedding_threshold: float = 1.0,
                initial_question_word_behaviour: str = "process",
                ents: DataFrame | None = None,
                chains: DataFrame | None = None,
                use_frequency_factor: bool = True,
                ontology_multiwords: set[str] | None = None,
                **overrides) -> DataFrame:
    """Ranked passages for a query document. Returns
    (rank, url, start_idx, end_idx, score, n_matches, tied, word_infos,
    answer_idxs). ``initial_question_word_behaviour`` mirrors the
    reference (manager.py:727 default 'process'): 'process' compiles
    initial interrogatives into question phraselets whose answers score
    600; 'ignore' treats them as plain words."""
    params = {**DEFAULTS, **overrides}
    rel_ph, word_ph = query_phraselets(
        query_text, lang,
        include_questions=initial_question_word_behaviour in ("process",
                                                              "exclusive"),
        ontology_multiwords=ontology_multiwords)
    if freq_factors is not None:
        rel_ph, word_ph = plan_selective_retries(
            rel_ph, word_ph, freq_factors, closure, params)
        if not use_frequency_factor:
            # the frequency GATES above always run; the flag only
            # disables score deflation (reference topic_matching.py:
            # 998-1000 gates the multiplier, not the planning)
            for p in rel_ph:
                p["freq_factor"] = 1.0
            for p in word_ph:
                p["freq_factor"] = 1.0
    matches = match_phraselets(spark, edges, words, rel_ph, word_ph, closure,
                               vectors=vectors,
                               embedding_threshold=embedding_threshold,
                               ents=ents, chains=chains)
    # one collect_list per url, then mapInPandas (one python call per
    # Arrow batch of MANY urls) — applyInPandas would pay per-group
    # invocation overhead across millions of documents
    for c, t in (("subword_idx", "int"), ("intc", "boolean"),
                 ("parent_sub", "int"), ("child_sub", "int")):
        if c not in matches.columns:
            matches = matches.withColumn(c, F.lit(None).cast(t))
    grouped = matches.groupBy("url").agg(
        F.collect_list(F.struct("phraselet_label", "kind", "position",
                                "parent_idx", "child_idx",
                                "freq_factor", "penalty",
                                "p_expl", "c_expl",
                                "p_word", "c_word",
                                "subword_idx", "intc",
                                "parent_sub", "child_sub")).alias("ms"))
    score_one = _score_docs(params)

    cols = [f.name for f in TOPIC_MATCH.fields]

    def score_batches(batches):
        for pdf in batches:
            rows: list[dict] = []
            for url, ms in zip(pdf["url"], pdf["ms"]):
                srt = sorted(
                    (dict(r) for r in ms),
                    key=lambda r: (r["position"],
                                   r["kind"].startswith("single_word"),
                                   r["phraselet_label"]))
                rows.extend(score_one(url, srt))
            yield pd.DataFrame(rows, columns=cols)

    scored = grouped.mapInPandas(score_batches, schema=TOPIC_MATCH)
    if params["only_one_result_per_document"]:
        du = Window.partitionBy("url").orderBy(F.desc("score"), "start_idx")
        scored = (scored.withColumn("_dr", F.row_number().over(du))
                  .filter(F.col("_dr") == 1).drop("_dr"))
    k = params["number_of_results"]
    # bounded top-k frame (≤ k rows after the limit); the constant-but-
    # non-foldable partition key (length(url)*0) actually reaches
    # WindowExec — a bare lit(0) is constant-folded away and the
    # single-partition warning still fires
    w = (Window.partitionBy(F.length("url") * 0)
         .orderBy(F.desc("score"), "url", "start_idx"))
    top = (scored.orderBy(F.desc("score"), "url", "start_idx").limit(k)
           .withColumn("rank", F.row_number().over(w)))
    # tie ranking (reference topic_matching.py:1488-1524)
    top = top.withColumn(
        "tied", (F.lag("score").over(w).isNotNull()
                 & (F.col("score") / F.lag("score").over(w) > params["tied_result_quotient"])))
    return top.select("rank", "url", "start_idx", "end_idx",
                      "index_within_document", "subword_index", "score",
                      "n_matches", "tied", "word_infos", "answer_idxs")
