"""Transcribed reference test matrices.

Each case is hand-transcribed from the reference's own test suites
(msg-systems/holmes-extractor, MIT) with file:line provenance, so the
engine is checked against the REFERENCE's documented behavior rather
than its own frozen output. Cases needing capabilities we stub (real
spaCy models, WordNet ontologies) are adapted minimally and the
adaptation is noted.
"""

import pytest

from holmes_extractor_spark.nlp.parser import parse_document
from holmes_extractor_spark.pipeline.phraselets import (
    REVERSE_ONLY_PARENT_LEMMAS, extract_candidate_edges,
    extract_word_phraselets)


def labels(text, lang="en", include_questions=False, include_reverse_only=True,
           include_reverse_only_parents=False):
    """Phraselet label set for one text — the equivalent of the
    reference's add_phraselets_to_dict keys (parsing.py:1703-2306)."""
    parsed = parse_document(text, lang)
    out = set()
    for e in extract_candidate_edges(parsed, lang,
                                     include_questions=include_questions):
        if e["reverse_only"] and not include_reverse_only:
            continue
        out.add(e["label"])
    for w in extract_word_phraselets(parsed, lang):
        out.add(w["label"])
    return out


# (text, expected labels, reference provenance) — transcribed from
# tests/en/test_phraselet_production_EN.py. include_reverse_only=False
# mirrors the reference test default.
PHRASELET_CASES = [
    ("A plant grows.", {"predicate-actor: grow-plant", "word: plant"},
     "test_phraselet_production_EN.py:76-78 test_verb_subject_no_entry_in_ontology"),
    ("A plant grows up quickly.",
     {"governor-adjective: grow up-quick", "predicate-actor: grow up-plant",
      "word: plant"},
     "test_phraselet_production_EN.py:81-84 test_phrasal_verb_subject"),
    ("A plant is grown.",
     {"predicate-passivesubject: grow-plant", "word: plant"},
     "test_phraselet_production_EN.py:96-99 test_verb_direct_object"),
    ("Somebody gives something to a plant.",
     {"predicate-recipient: gift-plant", "word: plant"},
     "test_phraselet_production_EN.py:101-103 test_verb_indirect_object"),
    ("A healthy plant grows.",
     {"governor-adjective: plant-healthy", "predicate-actor: grow-plant",
      "word: plant"},
     "test_phraselet_production_EN.py:105-108 test_noun_adjective (verb added "
     "so the fragment parses; the reference uses the bare NP)"),
    ("The sailors sailed rapidly.",
     {"governor-adjective: sail-rapid", "predicate-actor: sail-sailor",
      "word: sailor"},
     "test_phraselet_production_EN.py:115-118 test_verb_adverb (subject NP "
     "substituted for the pronoun 'They')"),
    ("A hobby plant grows.",
     {"noun-noun: plant-hobby", "predicate-actor: grow-plant",
      "word: plant", "word: hobby"},
     "test_phraselet_production_EN.py:122-125 test_noun_noun"),
    ("A gardener's plant grows.",
     {"word-ofword: plant-gardener", "predicate-actor: grow-plant",
      "word: plant", "word: gardener"},
     "test_phraselet_production_EN.py:127-130 test_possessor_possessed"),
    ("A gardener's healthy hobby plant grows in the sun.",
     {"predicate-actor: grow-plant", "governor-adjective: plant-healthy",
      "noun-noun: plant-hobby", "word-ofword: plant-gardener",
      "prepgovernor-noun: grow-sun", "word: plant", "word: hobby",
      "word: gardener", "word: sun"},
     "test_phraselet_production_EN.py:133-141 test_combined"),
    ("Information extraction progresses with information.",
     {"predicate-actor: progress-extract", "noun-noun: extract-inform",
      "prepgovernor-noun: progress-inform", "word: inform", "word: extract"},
     "test_phraselet_production_EN.py:186-190 test_multiword_not_in_ontology"),
]


@pytest.mark.parametrize("text,expected,ref",
                         PHRASELET_CASES,
                         ids=[c[2].split()[0] + ":" + c[0][:25]
                              for c in PHRASELET_CASES])
def test_phraselet_production(text, expected, ref):
    got = labels(text, include_reverse_only=False)
    assert got == expected, f"{text!r} (ref {ref}):\n got {sorted(got)}\n exp {sorted(expected)}"


def test_reverse_only_prep_noun_included_when_requested():
    # reference test_reverse_only, test_phraselet_production_EN.py:269-275
    got = labels("The man needs insurance for five years.")
    assert "prep-noun: for-year" in got
    got_no_rev = labels("The man needs insurance for five years.",
                        include_reverse_only=False)
    assert "prep-noun: for-year" not in got_no_rev


def test_question_word_phraselet():
    # reference test_question_word, test_phraselet_production_EN.py:303-307
    got = labels("Who opened the door?", include_questions=True)
    assert {"head-WHsubj: open-who", "predicate-patient: open-door",
            "word: door"} <= got
    # reference test_question_word_control :309-312
    got_ctl = labels("Who opened the door?", include_questions=False)
    assert "head-WHsubj: open-who" not in got_ctl
    assert "predicate-patient: open-door" in got_ctl


def test_reverse_only_parent_lemmas_flagged():
    # reference test_reverse_only_parent_lemma(_suppressed),
    # test_phraselet_production_EN.py:295-301: 'have' parents are
    # reverse-only
    assert ("have", "VERB") in REVERSE_ONLY_PARENT_LEMMAS
    parsed = parse_document("The man has a dog.", "en")
    es = extract_candidate_edges(parsed, "en")
    have_edges = [e for e in es if e["pred"] == "have"]
    assert have_edges and all(e["reverse_only"] for e in have_edges)


# ------------------------------------------------- semantics (negation)

def test_negator_negation_within_clause():
    # reference tests/en/test_semantics_EN.py:107-109
    p = parse_document("The dog did not chase the cat.", "en")
    chase = next(t for t in p["tokens"] if t["lemma"] == "chase")
    assert chase["is_negated"]


def test_operator_negation_within_clause():
    # reference tests/en/test_semantics_EN.py:111-115: 'No dog chased
    # any cat' — doc[1] (dog) negated, doc[2] (chased) NOT negated
    p = parse_document("No dog chased any cat.", "en")
    dog = next(t for t in p["tokens"] if t["lemma"] == "dog")
    chase = next(t for t in p["tokens"] if t["lemma"] == "chase")
    assert dog["is_negated"]
    assert not chase["is_negated"]


def test_irrelevant_negation_does_not_negate_match():
    # reference test_irrelevant_negation,
    # tests/en/test_structural_matching_EN.py:121-126: "The dog who was
    # not old chased the cat" matches NOT negated
    p = parse_document("The dog that was not old chased the cat.", "en")
    chase = next(t for t in p["tokens"]
                 if t["lemma"] == "chase" and t["pos"] == "VERB")
    cat = next(t for t in p["tokens"] if t["lemma"] == "cat")
    assert not chase["is_negated"]
    assert not cat["is_negated"]


def test_never_negates():
    # reference test_passive_search_phrase_with_negated_searched_sentence,
    # tests/en/test_structural_matching_EN.py:456-466
    p = parse_document("The dog never chased the cat.", "en")
    chase = next(t for t in p["tokens"]
                 if t["lemma"] == "chase" and t["pos"] == "VERB")
    assert chase["is_negated"]


# --------------------------------------------- semantics (conjunction)

def test_conjunction_subject_matches_certain():
    # reference tests/en/test_structural_matching_EN.py:423-445:
    # conjunct subjects/objects match without uncertainty
    p = parse_document("The dog and the dog have chased a cat and a cat.", "en")
    es = extract_candidate_edges(p, "en")
    by_label = {e["label"]: e for e in es}
    assert not by_label["predicate-actor: chase-dog"]["uncertain"]
    assert not by_label["predicate-patient: chase-cat"]["uncertain"]


# ------------------------------------------------ semantics (passives)

def test_passive_normalization():
    # reference tests/en/test_semantics_EN.py passive goldens: the
    # passive subject receives nsubjpass, the by-agent pobjb
    p = parse_document("The cat was chased by the dog.", "en")
    lbls = {(d["label"], p["tokens"][d["child"]]["lemma"]) for d in p["deps"]}
    assert ("nsubjpass", "cat") in lbls
    assert ("pobjb", "dog") in lbls


def test_xcomp_control_subject_uncertain():
    # reference auxiliary correction (en language_specific_rules.py:
    # 169-285): control verbs add an uncertain subject to the xcomp verb
    p = parse_document("The man decided to open an account.", "en")
    open_tok = next(t for t in p["tokens"] if t["lemma"] == "open")
    man = next(t for t in p["tokens"] if t["lemma"] == "man")
    d = next(d for d in p["deps"]
             if d["parent"] == open_tok["i"] and d["child"] == man["i"]
             and d["label"] == "nsubj")
    assert d["uncertain"]


def test_tough_movement():
    # reference 'arg' dependency (en language_specific_rules.py:558-797)
    p = parse_document("A holiday is hard to book.", "en")
    assert any(d["label"] == "arg" for d in p["deps"])


# --------------------------------------------------- derivation parity

DERIVATION_CASES = [
    # (lemma, pos, expected) — reference lang/en/data/derivation.csv
    ("give", "VERB", "gift"),          # derivation.csv:207 'gift,give'
    ("easy", "ADJ", "ease"),           # derivation.csv:160 'ease,easy'
    ("information", "NOUN", "inform"),
    ("extraction", "NOUN", "extract"),
    ("quickly", "ADV", "quick"),       # RB -ly rule, rules.py:536-549
    ("rapidly", "ADV", "rapid"),
    ("happily", "ADV", "happy"),
    ("domestically", "ADV", "domestic"),
    ("regrettably", "ADV", "regrettable"),
]


@pytest.mark.parametrize("lemma,pos,expected", DERIVATION_CASES)
def test_derived_lemma_en(lemma, pos, expected):
    from holmes_extractor_spark.nlp.lemmatizer import derived_lemma_en
    assert derived_lemma_en(lemma, pos) == expected


DERIVATION_CASES_DE = [
    # reference lang/de/data/derivation.csv — noun-canonical
    ("jagen", "jagd"),         # :211
    ("informieren", "information"),  # :201
    ("verkaufen", "verkauf"),  # :385
    ("geben", "gabe"),
    ("extrahieren", "extraktion"),   # :151
]


@pytest.mark.parametrize("lemma,expected", DERIVATION_CASES_DE)
def test_derived_lemma_de(lemma, expected):
    from holmes_extractor_spark.nlp.lemmatizer import derived_lemma_de
    assert derived_lemma_de(lemma) == expected


# ---------------------------------------------------- German templates

def test_de_template_names():
    # reference de language_specific_rules.py:1697-1960: German uses
    # verb-nom / verb-acc / noun-dependent, NOT the English names
    got = labels("Der Hund jagte die Katze.", lang="de")
    assert "verb-nom: jagd-hund" in got
    assert "verb-acc: jagd-katze" in got


def test_de_compound_head_subword_variant():
    # reference tests/de/test_phraselet_production_DE.py:112-135:
    # 'Landschaftsgärtner gibt' emits BOTH the whole compound and the
    # head-subword variant, and word phraselets only the whole compound
    got = labels("Die Wohnungsgesellschaft verkaufte das Haus.", lang="de")
    assert "verb-nom: verkauf-wohnungsgesellschaft" in got
    assert "verb-nom: verkauf-gesellschaft" in got
    assert "intcompound: gesellschaft-wohnung" in got
    assert "word: wohnungsgesellschaft" in got
    assert "word: gesellschaft" not in got
    assert "word: wohnung" not in got


# ------------------------------------------- entity-embedding matching

def test_entity_embedding_word_match():
    # mirrors the embedding rows of reference
    # tests/common/test_word_level_matching.py: a PERSON-labeled token
    # matches a search word whose vector is close to the label's
    # prototype lexeme ('person', en language_specific_rules.py:100-121)
    from holmes_extractor_spark.fixtures import WORD_VECTORS
    from holmes_extractor_spark.query.structural import (_verify_doc,
                                                         compile_search_phrase)
    sp = compile_search_phrase("The man comes home")
    p = parse_document("Mary came home.", "en")
    roots = [t["i"] for t in p["tokens"] if t["lemma"] == "come"]
    ms = _verify_doc(sp, p["tokens"], p["deps"], roots, {},
                     vectors=WORD_VECTORS, embedding_threshold=0.8)
    assert ms, "entity-embedding match expected"
    kinds = {w["sp_word"]: w["match_type"] for m in ms for w in m["word_matches"]}
    assert kinds["man"] == "entity_embedding"


def test_entity_embedding_disabled_by_default():
    from holmes_extractor_spark.query.structural import (_verify_doc,
                                                         compile_search_phrase)
    sp = compile_search_phrase("The man comes home")
    p = parse_document("Mary came home.", "en")
    roots = [t["i"] for t in p["tokens"] if t["lemma"] == "come"]
    assert _verify_doc(sp, p["tokens"], p["deps"], roots, {}) == []


# ------------------------------------------------- coreference chains

def test_multi_sentence_coref_chain():
    # chains relay through resolved mentions (reference consumes
    # coreferee chains, parsing.py:1096-1137, with 3-mention/300-word
    # caps, en language_specific_rules.py:92-96); coref-linked deps
    # exist for pronoun-as-child AND pronoun-as-parent (:1507-1532)
    p = parse_document("I saw a dog. It barked. It was hungry.", "en")
    es = {e["label"]: e for e in extract_candidate_edges(p, "en")}
    assert es["predicate-actor: bark-dog"]["involves_coref"]
    assert es["governor-adjective: dog-hunger"]["involves_coref"]


def test_coref_gender_compatibility():
    # gendered pronouns need person antecedents; neuter need non-person
    p = parse_document("I saw a cat. He was chased by the dog.", "en")
    es = [e["label"] for e in extract_candidate_edges(p, "en")]
    assert "predicate-passivesubject: chase-cat" not in es  # 'He' ≠ cat
    p2 = parse_document("I saw a cat. It was chased by the dog.", "en")
    es2 = [e["label"] for e in extract_candidate_edges(p2, "en")]
    assert "predicate-passivesubject: chase-cat" in es2


# ------------------------------------------------- symmetric ontology

def test_symmetric_ontology_closure():
    # reference Ontology(symmetric_matching=True): hypernyms also match
    # (negative depths), but cousins never do (tests/en/
    # test_phraselet_production_EN.py symmetric_ontology cases)
    from holmes_extractor_spark.pipeline.linking import ontology_closure_local
    asym = {(q, w): d for (q, w, d, _) in ontology_closure_local()}
    sym = {(q, w): d for (q, w, d, _) in ontology_closure_local(symmetric=True)}
    assert ("animal", "dog") in asym and asym[("animal", "dog")] == 1
    assert ("dog", "animal") not in asym
    assert sym[("dog", "animal")] == -1          # hypernym, negative depth
    assert ("dog", "cat") not in sym             # cousins do not match
    assert sym[("puppy", "animal")] == -2


def test_whose_relative_clause():
    # reference relative constructions (en language_specific_rules.py:
    # 287-476): whose-clauses produce a poss relation to the antecedent
    got = labels("The man whose dog chased the cat came home.")
    assert "word-ofword: dog-man" in got
    assert "predicate-actor: chase-dog" in got
    assert "predicate-actor: come-man" in got


def test_de_double_object_dative():
    # reference DE: 'verb-dat: gabe-frau' pattern for datives
    # (tests/de/test_phraselet_production_DE.py:85-110)
    got = labels("Die Frau gab dem Mann das Buch.", lang="de")
    assert {"verb-nom: gabe-frau", "verb-dat: gabe-mann",
            "verb-acc: gabe-buch"} <= got
