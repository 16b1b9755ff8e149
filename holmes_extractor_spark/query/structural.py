"""Structural matching — the reference's ``Manager.match()`` lifecycle
(reference: manager.py:562-613) re-expressed Spark-first:

1. compile search phrases on the driver with the same parse layer
   (reference: parsing.py:2460-2632 compile; pack/scatter at
   manager.py:509-519);
2. probe the postings inverted index for root-word candidates — a
   broadcast hash join, the pipeline's workhorse (reference probes its
   reverse_dict instead of scanning, structural_matching.py:249-259);
3. gather candidate docs and run the recursive subgraph verification
   *doc-locally* inside an Arrow-batched UDF (reference:
   structural_matching.py:486-819) — patterns are 1-2 edges deep, so
   doc-local recursion after the index join is the idiomatic plan, not
   a distributed join;
4. global sort of match rows (reference: manager.py:604-613).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..nlp.parser import parse_document

# search-phrase dep label → doc dep labels it matches — full port of
# the asymmetric label-implication table (reference parsing.py:
# 2823-2853 consuming the per-language MatchImplication tables at
# en language_specific_rules.py:878-1111). Every label implies itself.
LABEL_IMPLICATIONS: dict[str, set[str]] = {
    # intcompound in subj/obj/arg rows: the reference DE table lets
    # sb/oa/arg match a compound's internal subword link (de
    # language_specific_rules.py:1612-1636 — 'Knochenmark wird
    # extrahiert' ↔ Knochenmarkextraktion)
    "nsubj": {"nsubj", "csubj", "poss", "pobjb", "pobjo", "advmodsubj",
              "arg", "intcompound"},
    "acomp": {"acomp", "amod", "advmod", "npmod", "advcl"},
    "advcl": {"advcl", "pobjo", "poss", "relant", "nsubjpass", "csubjpass",
              "compound", "advmodobj", "arg", "dobj", "xcomp"},
    # amod carries the reference's DE nk implications: an attributive
    # adjective matches a compound's internal subword link ('Das große
    # Interesse' ↔ Großinteresse; de language_specific_rules.py:1641)
    "amod": {"amod", "acomp", "advmod", "npmod", "advcl", "compound",
             "intcompound"},
    "advmod": {"advmod", "acomp", "amod", "npmod", "advcl"},
    "arg": {"arg", "nsubj", "csubj", "poss", "pobjb", "advmodsubj", "dobj",
            "pobjo", "relant", "nsubjpass", "csubjpass", "compound",
            "advmodobj", "dative", "pobjp", "intcompound"},
    "compound": {"compound", "nmod", "appos", "nounmod", "nsubj", "csubj",
                 "poss", "pobjb", "advmodsubj", "dobj", "pobjo", "relant",
                 "pobjp", "nsubjpass", "csubjpass", "arg", "advmodobj",
                 "dative", "amod", "intcompound"},
    "dative": {"dative", "pobjt", "relant", "nsubjpass"},
    "pobjt": {"pobjt", "dative", "relant"},
    "nsubjpass": {"nsubjpass", "dobj", "pobjo", "poss", "relant",
                  "csubjpass", "compound", "advmodobj", "arg", "dative",
                  "intcompound"},
    "dobj": {"dobj", "pobjo", "poss", "relant", "nsubjpass", "csubjpass",
             "compound", "advmodobj", "arg", "xcomp", "advcl",
             "intcompound"},
    "nmod": {"nmod", "appos", "compound", "nummod"},
    "poss": {"poss", "pobjo", "nsubj", "csubj", "pobjb", "advmodsubj",
             "arg", "relant", "nsubjpass", "csubjpass", "compound",
             "advmodobj", "det", "intcompound"},
    # intcompound: a German genitive/possessive search relation matches
    # a compound's internal subword link ("Elefant der Vergangenheit" ↔
    # Vergangenheitselefant; reference de/language_specific_rules.py
    # intcompound match implications)
    "pobjo": {"pobjo", "poss", "dobj", "relant", "nsubjpass", "csubjpass",
              "compound", "advmodobj", "arg", "xcomp", "nsubj", "csubj",
              "advmodsubj", "intcompound"},
    "pobjb": {"pobjb", "nsubj", "csubj", "poss", "advmodsubj", "arg"},
    "pobjp": {"pobjp", "compound", "intcompound"},
    "pobj": {"pobj", "pcomp"},
    "pcomp": {"pcomp", "pobj"},
    "xcomp": {"xcomp", "pobjo", "poss", "relant", "nsubjpass", "csubjpass",
              "compound", "advmodobj", "arg", "dobj", "advcl",
              "intcompound"},
    # intcompound as a SEARCH-side label appears only in topic-match
    # phraselets compiled from German compounds (reference de
    # language_specific_rules.py:1680-1694: 'intcompound is only used
    # within extensive matching')
    "intcompound": {"intcompound", "nsubj", "dobj", "poss", "amod",
                    "advmod", "pobjo", "pobjp"},
    "wh_wildcard": {"wh_wildcard", "advmod", "advcl", "npadvmod", "prep",
                    "pobjp"},
    "nummod": {"nummod"},
    "relant": {"relant"},
    "attr": {"attr", "amod"},
    "neg": {"neg"},
}

# reverse-polarity implications: a search-phrase dep parent→child may
# match a DOCUMENT dep child→parent carrying one of these labels
# (reference MatchImplication.reverse_document_dependencies,
# en language_specific_rules.py:878-1111)
_REV_STD = {"acomp", "amod"}
REVERSE_IMPLICATIONS: dict[str, set[str]] = {
    "nsubj": _REV_STD,
    "acomp": {"nsubj", "csubj", "poss", "pobjb", "advmodsubj", "dobj",
              "pobjo", "relant", "nsubjpass", "csubjpass", "compound",
              "advmodobj", "dative", "arg"},
    "amod": {"nsubj", "csubj", "poss", "pobjb", "advmodsubj", "dobj",
             "pobjo", "relant", "nsubjpass", "csubjpass", "compound",
             "advmodobj", "dative", "arg"},
    "arg": _REV_STD, "compound": _REV_STD, "dative": _REV_STD,
    "pobjt": _REV_STD, "nsubjpass": _REV_STD, "dobj": _REV_STD,
    "poss": _REV_STD, "pobjo": _REV_STD, "pobjb": _REV_STD,
    # reference de nk/intcompound reverse rows (de language_specific_
    # rules.py:1643-1652, 1680-1694)
    "intcompound": {"amod"},
}

_ENTITY_RE = re.compile(r"^ENTITY([A-Z]+)$")

# 'where' place prepositions (reference en language_specific_rules.py:
# 1378-1413) and 'when' temporal prepositions (:1415-1423)
_WHERE_PREPS = {
    "above", "across", "against", "along", "among", "amongst", "around",
    "at", "behind", "below", "beneath", "beside", "between", "beyond",
    "by", "close", "down", "in", "into", "near", "next", "off", "on",
    "onto", "opposite", "out", "outside", "round", "through", "under",
    "underneath", "up",
}
_WHEN_PREPS = {"after", "before", "by", "for", "since", "till", "until"}

# entity label → lexeme whose vector is the label's prototype
# (transcribed from reference en language_specific_rules.py:100-121,
# entity_labels_to_corresponding_lexemes)
ENTITY_LABEL_LEXEMES = {
    "PERSON": "person", "NORP": "group", "FAC": "building",
    "ORG": "organization", "GPE": "place", "LOC": "place",
    "PRODUCT": "product", "EVENT": "event", "WORK_OF_ART": "artwork",
    "LAW": "law", "LANGUAGE": "language", "DATE": "date", "TIME": "time",
    "PERCENT": "percent", "MONEY": "money", "QUANTITY": "quantity",
    "ORDINAL": "number", "CARDINAL": "number",
}


def entity_label_vectors(vectors: dict[str, list[float]]) -> dict[str, list[float]]:
    """Label → prototype vector map (reference
    entity_label_to_vector_dict, parsing.py:1590-1596)."""
    return {label: vectors[lex]
            for label, lex in ENTITY_LABEL_LEXEMES.items() if lex in vectors}

MATCH_ROW = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("phrase_label", T.StringType()),
    T.StructField("index_within_document", T.IntegerType()),
    T.StructField("negated", T.BooleanType()),
    T.StructField("uncertain", T.BooleanType()),
    T.StructField("involves_coreference", T.BooleanType()),
    T.StructField("overall_similarity", T.DoubleType()),
    T.StructField("word_matches", T.ArrayType(T.StructType([
        T.StructField("sp_index", T.IntegerType()),
        T.StructField("sp_word", T.StringType()),
        T.StructField("doc_index", T.IntegerType()),
        T.StructField("doc_word", T.StringType()),
        T.StructField("match_type", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("extracted_word", T.StringType()),
        T.StructField("similarity", T.DoubleType()),
        # subword-granular match position, null for whole-token
        # matches (reference match dict document_subword_index /
        # document_subword_containing_token_index,
        # structural_matching.py:858-863)
        T.StructField("document_subword_index", T.IntegerType()),
        T.StructField("document_subword_containing_token_index",
                      T.IntegerType()),
        # multiword span extents (reference WordMatch.first_document_
        # token / last_document_token — for entity- and
        # ontology-defined multiwords the span covers the member
        # tokens, structural_matching.py:849-877)
        T.StructField("first_document_token_index", T.IntegerType()),
        T.StructField("last_document_token_index", T.IntegerType()),
        # True when THIS word match traversed a coreference dep
        # (reference WordMatch.involves_coreference)
        T.StructField("involves_coreference", T.BooleanType()),
    ]))),
])


def compile_search_phrase(text: str, label: str | None = None,
                          lang: str = "en",
                          process_initial_question_words: bool = False,
                          ontology_multiwords: set[str] | None = None,
                          perform_coreference_resolution: bool = True) -> dict:
    """Driver-side compile: parse the phrase with the shared parse
    layer, keep matchable tokens + the semantic dep pattern rooted at
    the ROOT token. Validation raises the reference's typed errors
    (errors.py:9-26, raised from search-phrase compilation,
    reference parsing.py:2460-2632)."""
    from .. import errors
    from ..nlp.lexicon import (FEM_PRONOUNS_EN, MASC_PRONOUNS_EN,
                               NEGATION_WORDS_DE, NEGATION_WORDS_EN,
                               NEUTER_PRONOUNS_EN)
    parsed = parse_document(text, lang)
    toks = parsed["tokens"]
    # German hyphen-joined compounds ("Wort-Mit-Bindestrich"): the
    # parser split them into tokens but recorded the hyphen-normalized
    # concatenation as a no-space multiword on the head token
    # (reference keeps ONE token and deletes hyphens, de
    # normalize_hyphens :1558-1567). The non-head members are word
    # PARTS: excluded from phrase validation and collapsed below.
    hyph_members: set[int] = set()
    if lang == "de":
        for t in toks:
            for mw in t["multiwords"]:
                if " " not in mw["lemma"] and len(mw["token_indexes"]) > 1:
                    hyph_members.update(mw["token_indexes"][:-1])
    words = [t["text"].lower() for t in toks
             if t["i"] not in hyph_members]
    if any(w in ("and", "or", "und", "oder") for w in words):
        raise errors.SearchPhraseContainsConjunctionError(text)
    neg = NEGATION_WORDS_DE if lang == "de" else NEGATION_WORDS_EN
    if any(w in neg for w in words):
        raise errors.SearchPhraseContainsNegationError(text)
    coref_prons = (MASC_PRONOUNS_EN | FEM_PRONOUNS_EN | NEUTER_PRONOUNS_EN
                   | {"er", "sie", "es"})
    if perform_coreference_resolution and any(
            t["pos"] == "PRON" and t["text"].lower() in coref_prons
            for t in toks):
        # only raised when the manager resolves coreference (reference
        # tests/common/test_errors.py:49-58: the nocoref manager
        # accepts 'A dog has a cat chasing it')
        raise errors.SearchPhraseContainsCoreferringPronounError(text)
    if max((t["sent_idx"] for t in toks), default=0) > 0:
        raise errors.SearchPhraseContainsMultipleClausesError(text)
    if not any(t["is_matchable"] and t["pos"] in
               ("NOUN", "PROPN", "VERB", "ADJ", "ADV", "NUM")
               for t in toks) \
            and not any(_ENTITY_RE.match(t["text"]) for t in toks):
        raise errors.SearchPhraseWithoutMatchableWordsError(text)
    deps = [dict(d) for d in parsed["deps"]]
    ignored: set[int] = set()

    # --- hyphen-compound collapse (DE): the head token matches via the
    # hyphen-normalized concatenation; the members are unmatchable
    if hyph_members:
        for t in toks:
            for mw in t["multiwords"]:
                if " " not in mw["lemma"] and len(mw["token_indexes"]) > 1:
                    t["lemma"] = mw["lemma"]
                    t["derived_lemma"] = mw["derived_lemma"]
                    t["direct_reprs"] = [mw["lemma"]]
                    t["derivation_reprs"] = (
                        [mw["derived_lemma"]]
                        if mw["derived_lemma"] != mw["lemma"] else [])
        ignored |= hyph_members
        deps = [d for d in deps if d["parent"] not in hyph_members
                and d["child"] not in hyph_members]

    # --- ontology-defined multiword collapse (reference
    # create_search_phrase, parsing.py:2520-2542: the head token takes
    # the multiword's reprs, the other members are unmatchable)
    if ontology_multiwords:
        nlen = len(toks)
        i = 0
        while i < nlen:
            for span in (3, 2):
                if i + span > nlen:
                    continue
                run = toks[i:i + span]
                if not all(t["pos"] in ("NOUN", "PROPN", "ADJ")
                           for t in run):
                    continue
                mw_lemma = " ".join(t["lemma"] for t in run)
                mw_derived = " ".join(t["derived_lemma"] for t in run)
                if mw_lemma in ontology_multiwords \
                        or mw_derived in ontology_multiwords:
                    head = toks[i + span - 1]
                    head["direct_reprs"] = [mw_lemma]
                    head["derivation_reprs"] = (
                        [mw_derived] if mw_derived != mw_lemma else [])
                    head["derived_lemma"] = mw_derived
                    for t in run[:-1]:
                        ignored.add(t["i"])
                    i += span - 1
                    break
            i += 1
        if ignored:
            deps = [d for d in deps if d["parent"] not in ignored
                    and d["child"] not in ignored]

    # --- copula children replacement (reference predicative-adjective
    # normalization, parsing.py:1318-1357: after the amod rewire the
    # copula's children are replaced by a pointer to the subject)
    cop_ptr: dict[int, int] = {}
    for t in toks:
        if t["pos"] != "AUX" or t["lemma"] not in ("be", "sein"):
            continue
        i = t["i"]
        acomps = [d["child"] for d in deps
                  if d["parent"] == i and d["label"] == "acomp"]
        nsubjs = [d["child"] for d in deps
                  if d["parent"] == i and d["label"] == "nsubj"]
        if acomps and nsubjs and any(
                d["label"] == "amod" and d["parent"] in nsubjs
                and d["child"] in acomps for d in deps):
            cop_ptr[i] = nsubjs[0]
    if cop_ptr:
        deps = [d for d in deps if d["parent"] not in cop_ptr]

    def _is_q(t: dict) -> bool:
        # initial interrogatives become question placeholders
        # (reference word_matching/question.py:8-146); ignored unless
        # process_initial_question_words (reference manager.py:1182
        # passes False for structural match())
        return process_initial_question_words \
            and t["is_initial_question_word"]

    def _is_node(t: dict) -> bool:
        return (t["i"] not in ignored
                and (t["is_matchable"] or _is_q(t)
                     or _ENTITY_RE.match(t["text"]) is not None))

    # --- root: syntactic root → predicative pointer → first matchable
    # descendant (reference replace_grammatical_root_token_recursively,
    # parsing.py:2475-2494)
    root = next((t for t in toks if t["dep"] == "ROOT"), toks[0])
    root_i = cop_ptr.get(root["i"], root["i"])
    seen_roots = set()
    while not toks[root_i]["is_matchable"] and root_i not in seen_roots:
        seen_roots.add(root_i)
        for d in sorted((d for d in deps if d["parent"] == root_i),
                        key=lambda d: d["child"]):
            if toks[d["child"]]["is_matchable"]:
                root_i = d["child"]
                break

    # --- spanning tree over the UNDIRECTED semantic dep graph from the
    # (possibly re-rooted) root; each traversed edge records its
    # original orientation so verification can walk doc deps in either
    # polarity (reference match_recursively explores the search-phrase
    # tree from root_token, structural_matching.py:486-819)
    pattern_deps: list[tuple] = []   # (anchor, other, label, fwd, sp_unc)
    matchable = {root_i}
    frontier = [root_i]
    while frontier:
        nxt: list[int] = []
        for i in frontier:
            for d in deps:
                if d["label"] not in LABEL_IMPLICATIONS:
                    continue
                if d["parent"] == i and d["child"] not in matchable \
                        and _is_node(toks[d["child"]]):
                    pattern_deps.append(
                        (i, d["child"], d["label"], True,
                         bool(d["uncertain"])))
                    matchable.add(d["child"])
                    nxt.append(d["child"])
                elif d["child"] == i and d["parent"] not in matchable \
                        and _is_node(toks[d["parent"]]):
                    pattern_deps.append(
                        (i, d["parent"], d["label"], False,
                         bool(d["uncertain"])))
                    matchable.add(d["parent"])
                    nxt.append(d["parent"])
        frontier = nxt

    sp_tokens = {}
    for i in matchable:
        t = toks[i]
        m = _ENTITY_RE.match(t["text"])
        sp_tokens[i] = {
            "i": i,
            "text": t["text"],
            "direct_reprs": [] if m else t["direct_reprs"],
            "derivation_reprs": [] if m else (
                t["derivation_reprs"] or [t["derived_lemma"]]),
            "ent_spec": m.group(1) if m else None,
            "q_spec": t["text"].lower() if _is_q(t) else None,
            "derived_lemma": t["derived_lemma"],
            # pos/lemma/lang feed the embedding-permitted gate
            # (reference parsing.py:2868-2883)
            "pos": t["pos"],
            "lemma": t["lemma"],
            "lang": lang,
        }
    return {
        "label": label or text,
        "lang": lang,
        "root": root_i,
        "tokens": sp_tokens,
        "pattern_deps": pattern_deps,
        # count of matchable non-entity tokens — the exponent for the
        # per-token embedding gate (reference parsing.py:2562-2594
        # builds matchable_non_entity_tokens_to_vectors over matchable
        # tokens without an entity placeholder, question placeholders
        # included with a None vector; word_matching/embedding.py:105-108
        # raises overall_similarity_threshold to this count)
        "n_emb": sum(1 for t in sp_tokens.values() if not t["ent_spec"]),
    }


def root_reprs(sp: dict) -> list[tuple[str, str]]:
    """(repr, kind) probes for the root token — what the reference
    calls words_matching_root_token (parsing.py:731-810)."""
    rt = sp["tokens"][sp["root"]]
    if rt["ent_spec"]:
        return [(f"ENTITY{rt['ent_spec']}", "entity")]
    probes = [(r, "direct") for r in rt["direct_reprs"]]
    probes += [(r, "derivation") for r in rt["derivation_reprs"]]
    return probes


def _cosine_py(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    da = sum(x * x for x in a) ** 0.5
    db = sum(y * y for y in b) ** 0.5
    return num / (da * db) if da and db else 0.0


STOP = object()  # sentinel: strategy claims the token, chain ends


def _question_strategy(sp_tok: dict, dt: dict, ctx: dict):
    """Question-word ↔ answering-token rules transcribed from the
    reference (en language_specific_rules.py:1327-1469,
    question_word_matches). DATE/TIME entity gates are vacuous under
    the gazetteer NER stand-in (no temporal entities) and are noted
    where skipped. CLAIMS question-placeholder tokens: no later
    strategy runs for them (reference word_matching/question.py is the
    only strategy consulted for interrogative poles)."""
    if not sp_tok.get("q_spec"):
        return None
    q = sp_tok["q_spec"]
    if q in ("who", "whom", "whose"):
        if dt["ent_type"] in ("PERSON", "NORP", "ORG", "GPE") \
                and dt["dep"] != "compound":
            return ("question", 0, dt["text"].lower(), 1.0)
    elif q == "what":
        if dt["pos"] in ("NOUN",) and dt["ent_type"] == "":
            return ("question", 0, dt["text"].lower(), 1.0)
    elif q == "where":
        # place prepositions (ref :1367-1413; DATE/TIME-child gate
        # skipped — no temporal NER in the stand-in)
        if dt["pos"] == "ADP" and dt["lemma"] in _WHERE_PREPS:
            return ("question", 0, dt["lemma"], 1.0)
    elif q == "when":
        # temporal prepositions or DATE/TIME entities (ref :1414-1424)
        if dt["pos"] == "ADP" and dt["lemma"] in _WHEN_PREPS:
            return ("question", 0, dt["lemma"], 1.0)
        if dt["ent_type"] in ("DATE", "TIME"):
            return ("question", 0, dt["text"].lower(), 1.0)
    elif q == "how":
        # instrumental by/with (ref :1425-1429)
        if dt["pos"] == "ADP" and dt["lemma"] in ("by", "with"):
            return ("question", 0, dt["lemma"], 1.0)
    elif q == "why":
        # because / in-order / owing-to / thanks-to (ref :1430-1469)
        if dt["pos"] == "ADP" and dt["lemma"] == "because":
            return ("question", 0, dt["lemma"], 1.0)
        if dt["text"].lower() in ("owing", "thanks", "because"):
            return ("question", 0, dt["text"].lower(), 1.0)
    return STOP


def _entity_strategy(sp_tok: dict, dt: dict, ctx: dict):
    """ENTITY placeholder matching (reference word_matching/
    entity.py); CLAIMS entity-placeholder tokens."""
    if not sp_tok["ent_spec"]:
        return None
    ent_word = (dt["multiwords"][0]["text"] if dt["multiwords"]
                else dt["text"].lower())
    if sp_tok["ent_spec"] == "NOUN":
        # ENTITYNOUN matches any non-compound noun (reference
        # structural_matching.py:209-230)
        if dt["pos"] in ("NOUN", "PROPN") and dt["dep"] != "compound":
            return ("entity", 0, ent_word, 1.0)
        return STOP
    if dt["ent_type"] == sp_tok["ent_spec"] and dt["dep"] != "compound":
        return ("entity", 0, ent_word, 1.0)
    return STOP


def _doc_reprs(dt: dict) -> tuple[set, set]:
    doc_direct = set(dt["direct_reprs"])
    doc_deriv = set(dt["derivation_reprs"])
    for mw in dt["multiwords"]:
        doc_direct |= {mw["text"], mw["lemma"]}
        doc_deriv |= {mw["derived_lemma"]}
    return doc_direct, doc_deriv


def _subword_view(dt: dict, sw: dict) -> dict:
    """A token-shaped view of one German compound subword, so the
    word-matching strategy chain runs unchanged against it (reference
    WordMatch.document_subword, word_matching/general.py — a search
    word can match a compound part; the part's lemma is the matched
    representation)."""
    v = dict(dt)
    v["text"] = sw["text"]
    v["lemma"] = sw["lemma"]
    v["derived_lemma"] = sw["derived_lemma"]
    v["direct_reprs"] = [sw["lemma"]]
    v["derivation_reprs"] = [sw["derived_lemma"]]
    v["multiwords"] = []
    v["subwords"] = []
    v["ent_type"] = ""
    # subword embedding permission gates ONLY on lemma length
    # (reference parsing.py:2880-2881)
    v["is_subword"] = True
    return v


def _direct_strategy(sp_tok: dict, dt: dict, ctx: dict):
    """Reference word_matching/direct.py."""
    doc_direct, _ = _doc_reprs(dt)
    inter = set(sp_tok["direct_reprs"]) & doc_direct
    if inter:
        # report the matched representation, text-form preferred — the
        # reference's document_word is the matched repr and its reprs
        # lead with token.text (parsing.py:338-347), so "A tired dog"
        # matching document 'tired' extracts 'tired', not 'tire'
        text_l = dt["text"].lower()
        matched = (text_l if text_l in inter
                   else dt["lemma"] if dt["lemma"] in inter
                   else min(inter))
        return ("direct", 0, matched, 1.0)
    return None


def _derivation_strategy(sp_tok: dict, dt: dict, ctx: dict):
    """Reference word_matching/derivation.py."""
    doc_direct, doc_deriv = _doc_reprs(dt)
    sp_direct = set(sp_tok["direct_reprs"])
    sp_deriv = set(sp_tok["derivation_reprs"])
    if (sp_deriv & (doc_direct | doc_deriv)) or (sp_direct & doc_deriv):
        return ("derivation", 0, dt["derived_lemma"], 1.0)
    return None


def _ontology_strategy(sp_tok: dict, dt: dict, ctx: dict):
    """Reference word_matching/ontology.py over the broadcast closure."""
    closure_map = ctx["closure_map"]
    doc_direct, doc_deriv = _doc_reprs(dt)
    for q in set(sp_tok["direct_reprs"]) | set(sp_tok["derivation_reprs"]):
        for w in doc_direct | doc_deriv:
            d = closure_map.get((q, w))
            if d is not None:
                return ("ontology", d, w, 1.0)
    return None


# embedding matching is suppressed for some parts of speech and for
# very short words (reference parsing.py:2868-2883; the pos list and
# minimum lengths are the language constants at
# en language_specific_rules.py:819-826 / de :1575-1579)
_PERMISSIBLE_EMBEDDING_POS = ("NOUN", "PROPN", "ADJ", "ADV")
_MIN_EMBEDDING_LEN = {"en": 3, "de": 4}


def _embedding_permitted(tok: dict, min_len: int) -> bool:
    lemma = tok.get("lemma") or tok.get("derived_lemma") or ""
    # multiword holmes lemmas fall back to the token lemma in the
    # reference (parsing.py:2872-2875); our lemma field is per-token
    if tok.get("is_subword"):
        return len(lemma) >= min_len
    return (tok.get("pos") in _PERMISSIBLE_EMBEDDING_POS
            and len(lemma) >= min_len)


def _embedding_strategy(sp_tok: dict, dt: dict, ctx: dict):
    """Reference word_matching/embedding.py + entity_embedding.py:
    cosine(sp vector, doc vector) > ctx['single_token_threshold'] =
    overall_similarity_threshold ** n_emb (embedding.py:105-108).
    Both sides must pass embedding_matching_permitted (embedding.py:
    70-91): pos in NOUN/PROPN/ADJ/ADV and lemma length >= 3 (EN) /
    4 (DE); document subwords gate on length alone."""
    vectors = ctx.get("vectors")
    stt = ctx.get("single_token_threshold", 1.0)
    if vectors is None or stt >= 1.0:
        return None
    min_len = _MIN_EMBEDDING_LEN.get(sp_tok.get("lang", "en"), 3)
    if not _embedding_permitted(sp_tok, min_len) \
            or not _embedding_permitted(dt, min_len):
        return None
    # the reference compares spaCy token vectors, which are keyed by
    # the word/lemma itself, NOT the derived lemma (embedding.py:105 —
    # search_phrase_token.vector); "Katze" must look up 'katze', not
    # its derivation 'katz'
    sp_vec = vectors.get(sp_tok.get("lemma") or "",
                         vectors.get(sp_tok["derived_lemma"]))
    doc_vec = vectors.get(dt.get("lemma") or "",
                          vectors.get(dt["derived_lemma"]))
    if sp_vec is not None and doc_vec is not None:
        sim = _cosine_py(sp_vec, doc_vec)
        if sim > stt:
            return ("embedding", 0, dt["derived_lemma"], round(sim, 8))
    # entity-embedding: the doc token's entity label's prototype
    # vector vs the search word vector (reference
    # word_matching/entity_embedding.py:8-174, same single-token
    # threshold :141-143; prototypes from the label→lexeme map,
    # en language_specific_rules.py:100-121)
    if sp_vec is not None and dt["ent_type"] and dt["dep"] != "compound":
        proto = vectors.get(ENTITY_LABEL_LEXEMES.get(dt["ent_type"], ""))
        if proto is not None:
            sim = _cosine_py(sp_vec, proto)
            if sim > stt:
                return ("entity_embedding", 0, dt["text"].lower(),
                        round(sim, 8))
    return None


# ordered first-match-wins strategy chain (the reference's pluggable
# WordMatchingStrategy list, word_matching/general.py:13-100 +
# manager.py:163-214 order: question/entity claims, then direct →
# derivation → ontology → embedding). Third-party strategies register
# with `register_word_matching_strategy`; the list is pickled into the
# verify closure, so registration is driver-side before match().
WORD_MATCHING_STRATEGIES: list[tuple[str, object]] = [
    ("question", _question_strategy),
    ("entity", _entity_strategy),
    ("direct", _direct_strategy),
    ("derivation", _derivation_strategy),
    ("ontology", _ontology_strategy),
    ("embedding", _embedding_strategy),
]


def register_word_matching_strategy(name: str, fn, before: str | None = None,
                                    replace: bool = False) -> None:
    """Register a custom word-matching strategy.

    ``fn(sp_tok, dt, ctx) -> tuple | None | STOP`` returns
    (match_type, depth, matched_doc_word, similarity), None to fall
    through, or STOP to end the chain unmatched. ``before`` inserts
    ahead of an existing strategy (default: append); ``replace`` swaps
    an existing strategy of the same name. Mirrors the reference's
    pluggable WordMatchingStrategy surface
    (word_matching/general.py:13-100)."""
    global WORD_MATCHING_STRATEGIES
    if replace:
        WORD_MATCHING_STRATEGIES = [
            (n, fn if n == name else f) for (n, f) in
            WORD_MATCHING_STRATEGIES]
        return
    entry = (name, fn)
    if before is not None:
        idx = next(i for i, (n, _f) in
                   enumerate(WORD_MATCHING_STRATEGIES) if n == before)
        WORD_MATCHING_STRATEGIES.insert(idx, entry)
    else:
        WORD_MATCHING_STRATEGIES.append(entry)


def unregister_word_matching_strategy(name: str) -> None:
    global WORD_MATCHING_STRATEGIES
    WORD_MATCHING_STRATEGIES = [
        (n, f) for (n, f) in WORD_MATCHING_STRATEGIES if n != name]


def _token_matches(sp_tok: dict, dt: dict, closure_map: dict,
                   vectors: dict | None = None,
                   single_token_threshold: float = 1.0,
                   strategies: list | None = None,
                   subword_index: int | None = None) -> tuple | None:
    """First-match-wins over the strategy chain (reference
    manager.py:163-214). Returns (match_type, depth, matched_doc_word,
    similarity, subword_index|None, subword_containing_i|None) or
    None. ``strategies`` is the driver-side snapshot of
    WORD_MATCHING_STRATEGIES pickled into the verify closure — worker
    processes import the shipped module and would not see driver-side
    registrations otherwise. ``subword_index`` restricts matching to
    ONE compound subword (reference match_recursively's subword-
    granular word matching, structural_matching.py:503-533)."""
    ctx = {"closure_map": closure_map, "vectors": vectors,
           "single_token_threshold": single_token_threshold}
    chain = (strategies if strategies is not None
             else WORD_MATCHING_STRATEGIES)
    sws = dt.get("subwords")
    if subword_index is not None:
        sw = sws[subword_index]
        view = _subword_view(dt, sw)
        for (_name, fn) in chain:
            res = fn(sp_tok, view, ctx)
            if res is STOP:
                return None
            if res is not None:
                return (*res, subword_index,
                        sw["containing_i"] if sw.get("containing_i")
                        is not None else dt["i"])
        return None
    for (_name, fn) in chain:
        res = fn(sp_tok, dt, ctx)
        if res is STOP:
            return None
        if res is not None:
            return (*res, None, None)
    return None


def _verify_doc(sp: dict, tokens: list[dict], deps: list[dict],
                root_candidates: list[int], closure_map: dict,
                vectors: dict | None = None,
                overall_similarity_threshold: float = 1.0,
                strategies: list | None = None) -> list[dict]:
    """Recursive subgraph verification for one document (reference:
    structural_matching.py:486-819 — depth-first expansion with
    visited-table loop guard; coref chains are already materialized as
    coref-linked deps by the parse stage).

    The per-token embedding gate is
    overall_similarity_threshold ** n_emb (reference
    word_matching/embedding.py:105-108): a 3-content-word phrase at
    overall 0.82 admits per-token cosines down to 0.55, so long as the
    geometric mean across the phrase stays at 0.82."""
    single_token_threshold = (
        overall_similarity_threshold ** sp.get("n_emb", 1))
    by_parent: dict[int, list[dict]] = {}
    by_child: dict[int, list[dict]] = {}
    for d in deps:
        by_parent.setdefault(d["parent"], []).append(d)
        by_child.setdefault(d["child"], []).append(d)
    toks = {t["i"]: t for t in tokens}
    out = []

    def rec(sp_i: int, d_i: int,
            sw_i: int | None = None) -> list[list[dict]] | None:
        wm_type = _token_matches(sp["tokens"][sp_i], toks[d_i], closure_map,
                                 vectors, single_token_threshold,
                                 strategies, subword_index=sw_i)
        if wm_type is None:
            return None
        dt = toks[d_i]
        matched_sw = wm_type[4]
        extracted = wm_type[2]
        if matched_sw is not None:
            # subword match: the part itself is the extracted unit
            # (reference WordMatch.document_subword semantics)
            pass
        elif wm_type[0] == "question" and dt["pos"] == "ADP":
            # the answer to a WH-adverb question matched at a
            # preposition is its object's content word (the reference
            # reports the prep's filtered subtree as the answer span,
            # parsing.py:2736-2757)
            for dd in by_parent.get(d_i, []):
                if dd["label"] == "pobj":
                    extracted = toks[dd["child"]]["derived_lemma"]
                    break
        elif dt["most_specific_coref"] >= 0:
            # most specific term in the coreference chain, multiword
            # text preferred (reference get_extracted_word_for_token,
            # word_matching/general.py:82-100)
            mst = toks[dt["most_specific_coref"]]
            # multiword text preferred; otherwise the derived LEMMA —
            # the reference reports 'horse' for a plural mention
            # 'horses' (word_matching/general.py:82-100)
            extracted = (mst["multiwords"][0]["text"]
                         if len(mst["multiwords"]) > 0
                         else mst["derived_lemma"])
        elif len(dt["multiwords"]) > 0:
            extracted = dt["multiwords"][0]["text"]
        # multiword span extents (reference first/last_document_token):
        # a match via an entity- or ontology-defined multiword covers
        # the member tokens; plain matches span the token itself
        fdt = ldt = d_i
        mws = dt.get("multiwords")
        if matched_sw is None and mws is not None and len(mws) > 0:
            ew = (wm_type[2] or "").lower()
            for mw in mws:
                tis = mw["token_indexes"]
                if tis is not None and len(tis) > 0 and (
                        wm_type[0] == "entity"
                        or mw["text"].lower() == ew
                        or mw["lemma"] == ew
                        or mw["derived_lemma"] == ew):
                    fdt, ldt = min(tis), max(tis)
                    break
        base_wm = {
            "sp_index": sp_i, "sp_word": sp["tokens"][sp_i]["derived_lemma"],
            # the matched representation, not the head lemma — an
            # ontology match against doc multiword 'Mimi Momo' reports
            # 'mimi momo' (reference WordMatch.document_word is the
            # matched repr, word_matching/direct.py:76-79,
            # ontology.py match_multiwords)
            "doc_index": d_i, "doc_word": wm_type[2],
            "match_type": wm_type[0], "depth": wm_type[1],
            "extracted_word": extracted,
            "similarity": wm_type[3],
            # subword-granular match position (reference match dict
            # keys, structural_matching.py:858-863)
            "document_subword_index": matched_sw,
            "document_subword_containing_token_index": wm_type[5],
            "first_document_token_index": fdt,
            "last_document_token_index": ldt,
            "_negated": bool(dt["is_negated"]),
            # set when the match TRAVERSES a coreference dep (reference:
            # involves_coreference ⇔ matched token differs from the
            # structurally matched token) — chain membership alone does
            # not make a match coreferential
            "_coref": False,
            # a match on an or-conjunction member is itself uncertain
            # (reference parsing.py:409-412, WordMatch creation at
            # structural_matching.py:409)
            "_uncertain": bool(dt.get("involved_in_or") or False),
        }
        solutions: list[list[dict]] = [[base_wm]]
        # cross-token deps expand only from token-level or HEAD-subword
        # matches (reference structural_matching.py:589-596: the parent
        # index must not be a subword, or its subword must be is_head)
        sws_here = dt.get("subwords")
        head_pos = (len(sws_here) - 1
                    if sws_here is not None and len(sws_here) else None)
        cross_ok = matched_sw is None or matched_sw == head_pos
        for (anchor, other, lbl, fwd, sp_unc) in sp["pattern_deps"]:
            if anchor != sp_i:
                continue
            allowed = LABEL_IMPLICATIONS[lbl]
            rev_allowed = REVERSE_IMPLICATIONS.get(lbl, set())
            # candidate (doc_token, doc_dep, inverse_polarity) triples.
            # A forward pattern edge (sp parent→child) matches doc
            # children in normal polarity or doc parents in inverse
            # polarity; an edge traversed child→parent (re-rooted
            # pattern) mirrors that (reference match_recursively,
            # structural_matching.py:595-731 — inverse polarity per the
            # implication table's reverse_document_dependencies)
            if not cross_ok:
                cand_pairs = []
            elif fwd:
                cand_pairs = [(dd["child"], dd, False)
                              for dd in by_parent.get(d_i, [])
                              if dd["label"] in allowed]
                cand_pairs += [(dd["parent"], dd, True)
                               for dd in by_child.get(d_i, [])
                               if dd["label"] in rev_allowed]
            else:
                cand_pairs = [(dd["parent"], dd, False)
                              for dd in by_child.get(d_i, [])
                              if dd["label"] in allowed]
                cand_pairs += [(dd["child"], dd, True)
                               for dd in by_parent.get(d_i, [])
                               if dd["label"] in rev_allowed]
            new_solutions: list[list[dict]] = []
            # coreference-chain variants collapse to the first matching
            # mention (reference mention loop breaks after the first
            # match within a mention cluster, structural_matching.py:
            # 719-720) — conjunct variants stay separate matches
            cand_pairs.sort(key=lambda p: bool(p[1]["coref"]))
            matched_cands: list[int] = []
            for (cand_i, dd, inv) in cand_pairs:
                if cand_i == d_i:
                    continue
                if dd["coref"] and any(
                        cand_i in toks[mc]["coref_chain"]
                        # conjunct mates form ONE mention — both match
                        # ("them" → a cat AND a cat, ref :208-218)
                        and cand_i not in toks[mc].get(
                            "righthand_siblings", []) and mc not in
                        toks[cand_i].get("righthand_siblings", [])
                        for mc in matched_cands):
                    continue
                # a document child is tried at whole-token level AND at
                # its head subword — non-head subwords are reachable
                # only through intcompound recursion or the root probe
                # (reference match_recursively child expansion,
                # structural_matching.py:655-671: Index(child, None)
                # plus Index(child, subword.index) for is_head
                # subwords)
                sub = rec(other, cand_i) or []
                cand_sws = toks[cand_i].get("subwords")
                if cand_sws is not None and len(cand_sws) >= 2:
                    sub = sub + (rec(other, cand_i,
                                     len(cand_sws) - 1) or [])
                if sub:
                    matched_cands.append(cand_i)
                if sub:
                    # uncertainty per the reference (structural_
                    # matching.py:700-706): doc-dep uncertainty counts
                    # only when the sp dep itself is certain; inverse
                    # polarity is always uncertain
                    unc = (dd["uncertain"] and not sp_unc) or inv
                    for s in sub:
                        for sol in solutions:
                            # the same document token may serve several
                            # search-phrase tokens (reflexives: 'The
                            # panther chased itself' matches 'A panther
                            # chases a panther' with one doc panther,
                            # reference coref tests :656-662)
                            new_solutions.append(sol + [
                                {**w, "_uncertain": w["_uncertain"] or unc,
                                 "_coref": w["_coref"] or dd["coref"]}
                                for w in s
                            ])
            # intra-token subword relation: the sp child matches the
            # DEPENDENT subword of the matched part within THIS
            # compound token ("Elefant der Vergangenheit" ↔
            # Vergangenheitselefant — the reference recurses into
            # document_parent_subword.dependent_index,
            # structural_matching.py:722-750); recursive, so 3-part
            # chains ('Maßnahmen der Beschaffung der Information' ↔
            # Informationsbeschaffungsmaßnahmen) walk part by part
            if fwd and "intcompound" in allowed \
                    and sws_here is not None and len(sws_here) >= 2:
                # only a match anchored ON a subword recurses into the
                # compound (reference structural_matching.py:722-728:
                # working_document_parent_index.is_subword())
                if matched_sw is not None and matched_sw >= 1:
                    sub = rec(other, d_i, matched_sw - 1)
                    if sub:
                        for s in sub:
                            for sol in solutions:
                                new_solutions.append(sol + list(s))
            if not new_solutions:
                return None
            solutions = new_solutions
        return solutions

    seen_assignments: set[frozenset] = set()
    # root candidates are (token_index, subword_index|-1) pairs — the
    # posting probe returns the exact Index the reference's reverse
    # dict stores (word_matching/direct.py:120-143: one entry per
    # token AND one per subword, borrowed subwords included)
    # bare ints (whole-token candidates from older callers) normalize
    # to (token, no-subword) pairs
    _cands = {(c, -1) if isinstance(c, int) else tuple(c)
              for c in root_candidates}
    for (rp, rsw) in sorted(_cands):
        sols = rec(sp["root"], rp, rsw if rsw is not None and rsw >= 0
                   else None)
        if not sols:
            continue
        # every distinct doc-token assignment is its own match
        # (reference: conjunction expansion produces one match per
        # combination, tests/en/test_structural_matching_EN.py:142-168)
        for wm in sols:
            # conjunction-borrowed subword validity (reference
            # structural_matching.py:433-440 + 467-485): a word match
            # on a subword physically expressed on ANOTHER token
            # survives only if the match also holds a subword match
            # physically expressed on the anchoring token
            ok = True
            for w in wm:
                ci = w.get("document_subword_containing_token_index")
                if ci is not None and ci != w["doc_index"]:
                    if not any(
                            w2.get(
                                "document_subword_containing_token_index")
                            == w["doc_index"] for w2 in wm):
                        ok = False
                        break
            if not ok:
                continue
            key = frozenset(
                (w["sp_index"], w["doc_index"],
                 w.get("document_subword_index")) for w in wm)
            if key in seen_assignments:
                continue
            seen_assignments.add(key)
            # geometric-mean overall similarity, 8 dp (reference
            # structural_matching.py:458-463)
            prod = 1.0
            for w in wm:
                prod *= w["similarity"]
            out.append({
                "phrase_label": sp["label"],
                "index_within_document": rp,
                "negated": any(w["_negated"] for w in wm),
                "uncertain": any(w["_uncertain"] for w in wm),
                "involves_coreference": any(w["_coref"] for w in wm),
                "overall_similarity": round(prod ** (1.0 / len(wm)), 8),
                "word_matches": [
                    {**{k: v for k, v in w.items()
                        if not k.startswith("_")},
                     "involves_coreference": w["_coref"]}
                    for w in sorted(wm, key=lambda w: w["sp_index"])
                ],
            })
    return out


def match(spark: SparkSession, docs: DataFrame, postings: DataFrame,
          search_phrases: list[dict], closure_rows: list[tuple] | None = None,
          vectors: dict[str, list[float]] | None = None,
          overall_similarity_threshold: float = 1.0,
          embedding_based_matching_on_root_words: bool = False,
          document_label_filter: str | None = None,
          ordered: bool = True) -> DataFrame:
    """Distributed structural match.

    - `closure_rows`: collected ontology closure [(query_word,
      matched_word, depth)], broadcast into the verify UDF (reference
      precomputes the closure eagerly, ontology.py:91-125).
    - `vectors` + `overall_similarity_threshold`: word-embedding
      matching (reference word_matching/embedding.py; root-word
      candidates come from a distributed scan of the vector
      vocabulary, mirroring the reference's embedding root scan,
      structural_matching.py:260-349). The per-token gate is
      overall_similarity_threshold ** n_emb for each phrase (reference
      word_matching/embedding.py:105-108, root scan >= at
      structural_matching.py:336-345). Threshold 1.0 = disabled (the
      reference's default).
    - `document_label_filter`: url prefix filter, pushed down to the
      postings/docs scans (reference structural_matching.py:350-358).
    """
    closure_map = {(q, w): d for (q, w, d) in (closure_rows or [])}
    probe_rows = []
    emb_probe_rows: list[tuple[int, str]] = []
    for pi, sp in enumerate(search_phrases):
        for (r, kind) in root_reprs(sp):
            probe_rows.append((pi, r, kind))
        # ontology expansion of root probes (hyponyms depth>0 AND
        # synonyms depth 0 — both match, reference ontology.py:224-353)
        rt = sp["tokens"][sp["root"]]
        root_words = set(rt["direct_reprs"]) | set(rt["derivation_reprs"])
        for q in root_words:
            for (qw, mw), d in closure_map.items():
                if qw == q and mw != q:
                    probe_rows.append((pi, mw, "direct"))
        # embedding expansion: every vocabulary word similar enough to
        # the root becomes a probe. The reference scans its model
        # vocabulary per root lemma (structural_matching.py:260-349);
        # here the vocabulary side runs as a DISTRIBUTED scored scan
        # (broadcast root vectors ⋈ vector table, JVM zip_with dot
        # products) so a realistic embedding vocabulary never loops on
        # the driver — only the (tiny) surviving probe set is collected.
        # root-pole embedding probes only when explicitly enabled
        # (reference Manager(embedding_based_matching_on_root_words),
        # default False — manager.py:116; non-root embedding matching
        # stays active inside _verify_doc regardless)
        if vectors is not None and overall_similarity_threshold < 1.0 \
                and embedding_based_matching_on_root_words \
                and _embedding_permitted(
                    rt, _MIN_EMBEDDING_LEN.get(sp.get("lang", "en"), 3)):
            # the reference's root scan only runs when the root token
            # itself passes embedding_matching_permitted
            # (structural_matching.py:261-270)
            stt = overall_similarity_threshold ** sp.get("n_emb", 1)
            emb_probe_rows.extend(
                (pi, q) for q in root_words if q in vectors)
            # entity-embedding root candidates: entity labels whose
            # prototype vector is close to the root word probe the
            # entity postings (reference word_matching/
            # entity_embedding.py root handling); the label-prototype
            # map is constant-sized → driver-side
            protos = entity_label_vectors(vectors)
            for q in root_words:
                qv = vectors.get(q)
                if qv is None:
                    continue
                for label, pv in protos.items():
                    if _cosine_py(qv, pv) > stt:
                        probe_rows.append((pi, f"ENTITY{label}", "entity"))
    if emb_probe_rows:
        vec_df = spark.createDataFrame(
            [(w, v) for w, v in vectors.items()],
            "w string, vec array<double>")
        # each phrase carries its own single-token threshold column
        # (overall ** n_emb) so one distributed scan serves phrases of
        # different lengths
        roots_df = spark.createDataFrame(
            [(pi, q, vectors[q],
              overall_similarity_threshold
              ** search_phrases[pi].get("n_emb", 1))
             for (pi, q) in emb_probe_rows],
            "phrase_idx int, q string, qvec array<double>, stt double")
        dot = F.aggregate(F.zip_with("vec", "qvec", lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
        scored = (vec_df.join(F.broadcast(roots_df), F.col("w") != F.col("q"))
                  .withColumn("cos", dot / (norm(F.col("vec")) * norm(F.col("qvec"))))
                  .filter(F.col("cos") >= F.col("stt"))
                  .select("phrase_idx", "w"))
        probe_rows.extend((int(r["phrase_idx"]), r["w"], "direct")
                          for r in scored.collect())
    # the probe joins on repr ALONE: a derivation-side probe must hit a
    # direct posting entry and vice versa (reference: search "neatness"
    # matches document "neat" as a derivation match — the reverse dict
    # holds every matching repr under one key space); the entry kind
    # only informs match typing, which _token_matches re-derives
    # probe rows are driver-sized (per search phrase) — dedup here
    # instead of a .distinct() shuffle stage on a ~10-row frame
    probes = spark.createDataFrame(
        sorted({(pi, r) for (pi, r, _k) in probe_rows}),
        "phrase_idx int, repr string")

    if document_label_filter:
        postings = postings.filter(F.col("url").startswith(document_label_filter))
        docs = docs.filter(F.col("url").startswith(document_label_filter))

    cands = (
        postings.join(F.broadcast(probes), ["repr"])
        .select("url", "phrase_idx", "token_index", "subword_index")
        .groupBy("url")
        .agg(F.collect_set(F.struct("phrase_idx", "token_index",
                                    "subword_index")).alias("cands"))
    )
    # prune the token struct to the fields the verifier reads — cuts
    # the Arrow transfer into the python verify stage substantially
    verify_fields = ("i", "text", "lemma", "derived_lemma", "pos", "dep",
                     "ent_type", "direct_reprs", "derivation_reprs",
                     "is_negated", "involved_in_or", "coref_chain",
                     "most_specific_coref", "multiwords",
                     "righthand_siblings", "subwords")
    # prune AFTER the candidate join so the struct rewrite runs only on
    # docs that actually host candidates, not the whole corpus
    cand_docs = docs.join(cands, "url").withColumn(
        "tokens",
        F.transform("tokens", lambda t: F.struct(*[t[f].alias(f) for f in verify_fields])))

    sp_list = search_phrases  # captured in closure (broadcast via pickle)
    # driver-side snapshot: custom strategies registered on the driver
    # travel inside the verify closure
    strategies = list(WORD_MATCHING_STRATEGIES)

    def verify_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MATCH_ROW.fields]
        for pdf in batches:
            rows = []
            for url, tokens, dep_list, cnds in zip(pdf["url"], pdf["tokens"],
                                                   pdf["deps"], pdf["cands"]):
                by_phrase: dict[int, list[tuple]] = {}
                for c in cnds:
                    by_phrase.setdefault(c["phrase_idx"], []).append(
                        (c["token_index"], c["subword_index"]))
                for pi, positions in by_phrase.items():
                    for m in _verify_doc(sp_list[pi], tokens, dep_list,
                                         positions, closure_map,
                                         vectors,
                                         overall_similarity_threshold,
                                         strategies):
                        m["url"] = url
                        rows.append(m)
            yield pd.DataFrame(rows, columns=cols)

    res = (
        cand_docs.select("url", "tokens", "deps", "cands")
        .mapInPandas(verify_batches, schema=MATCH_ROW)
    )
    if ordered:
        # result sort contract (reference result sort/merge); callers
        # that immediately re-aggregate (the distinct entry queries)
        # skip the global range-partitioned sort
        res = res.orderBy(F.desc("overall_similarity"), "url",
                          "index_within_document")
    return res
