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
        if e.get("mention"):
            # matching-only rows (corpus-side literal question words
            # etc.) are not produced phraselets — same gate as
            # extract_phraselets (reference add_phraselets_to_dict
            # emits no dict entry for them)
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

# ---- transcribed EN semantic-dependency matrix -------------------------
# (text, token_idx, expected children) where expected is the reference's
# string_representation_of_children() with aux/auxpass/cc/conj/punct
# entries dropped (our dependency list is semantic-only — auxiliaries
# and conjunction scaffolding are normalized away at parse time; the
# adaptation applies uniformly to every case).

def children_repr(text, i, lang="en"):
    p = parse_document(text, lang)
    ds = sorted((d["child"], d["label"], d["uncertain"])
                for d in p["deps"] if d["parent"] == i)
    return "; ".join(f"{c}:{l}" + ("(U)" if u else "") for c, l, u in ds)


SEMANTIC_CHILDREN_CASES = [
    ("The dog chased the cat.", 2, "1:nsubj; 4:dobj",
     "test_semantics_EN.py:11-17 test_initialize_semantic_dependencies"),
    ("The dog and the hound chased the cat", 5, "1:nsubj; 4:nsubj; 7:dobj",
     "test_semantics_EN.py:20-25 test_one_righthand_sibling_with_and_conjunction"),
    ("The dog, the wolf and the hound chased the cat", 8,
     "1:nsubj; 4:nsubj; 7:nsubj; 10:dobj",
     "test_semantics_EN.py:27-34 test_many_righthand_siblings_with_and_conjunction"),
    ("The large and strong dog came home", 4, "1:amod; 3:amod",
     "test_semantics_EN.py:53-57 test_righthand_siblings_of_semantic_children_two"),
    ("The large dog and cat", 4, "1:amod(U)",
     "test_semantics_EN.py:66-72 test_semantic_children_of_righthand_siblings_two"),
    ("The dog was big", 1, "3:amod",
     "test_semantics_EN.py:82-87 test_predicative_adjective"),
    ("The dog and the cat were big and strong", 1, "6:amod; 8:amod",
     "test_semantics_EN.py:88-95 test_predicative_adjective_with_conjunction"),
    ("The dog and the cat were big and strong", 4, "6:amod; 8:amod",
     "test_semantics_EN.py:88-95 (second conjunct, certain per reference)"),
    ("The dog was chased", 3, "1:nsubjpass",
     "test_semantics_EN.py:137-140 test_passive"),
    ("The dog decided to chase the cat", 4, "1:nsubj(U); 6:dobj",
     "test_semantics_EN.py:172-175 test_complementizing_clause_active_child_clause_active"),
    ("The dog was ordered to chase the cat", 5, "1:nsubj(U); 7:dobj",
     "test_semantics_EN.py:177-180 test_complementizing_clause_passive_child_clause_active"),
    ("The mouse ordered the dog to chase the cat", 6, "4:nsubj(U); 8:dobj",
     "test_semantics_EN.py:182-185 test_complementizing_clause_object_child_clause_active"),
    ("The dog decided to be chased", 5, "1:nsubjpass(U)",
     "test_semantics_EN.py:187-190 test_complementizing_clause_active_child_clause_passive"),
    ("The dog was ordered to be chased", 6, "1:nsubjpass(U)",
     "test_semantics_EN.py:192-195 test_complementizing_clause_passive_child_clause_passive"),
    ("The mouse ordered the dog to be chased", 7, "4:nsubjpass(U)",
     "test_semantics_EN.py:197-200 test_complementizing_clause_object_child_clause_passive"),
    ("The dog who chased the cat was tired", 3, "1:nsubj; 5:dobj",
     "test_semantics_EN.py:209-214 test_who_one_antecedent"),
    ("The dog who chased and caught the cat was tired", 3, "1:nsubj",
     "test_semantics_EN.py:216-224 test_who_predicate_conjunction (chased: no dobj)"),
    ("The dog who chased and caught the cat was tired", 5, "1:nsubj; 7:dobj",
     "test_semantics_EN.py:216-224 test_who_predicate_conjunction (caught)"),
    ("The lion, the tiger and the dog who chased the cat were tired", 9,
     "1:nsubj(U); 4:nsubj(U); 7:nsubj; 11:dobj",
     "test_semantics_EN.py:226-230 test_who_many_antecedents"),
    ("The dog which chased the cat was tired", 3, "1:nsubj; 5:dobj",
     "test_semantics_EN.py:232-237 test_which_one_antecedent"),
    ("The dog chased the cat and the mouse", 2, "1:nsubj; 4:dobj; 7:dobj",
     "test_structural_matching_EN.py:423-455 conjunction object distribution"),
    ("The cat that the dog chased was tired", 5, "1:dobj; 4:nsubj",
     "test_semantics_EN.py:274-279 test_that_obj_one_antecedent (dobj, not relant)"),
    ("The cat and the mouse that the dog chased were tired", 8,
     "1:dobj; 4:dobj(U); 7:nsubj",
     "test_semantics_EN.py:281-286 test_that_obj_many_antecedents"),
    ("The cat the dog chased was tired", 4, "1:relant; 3:nsubj",
     "test_semantics_EN.py:288-291 test_relant_one_antecedent (bare relative)"),
    ("The dog and the tiger that chased the cat were tired", 6,
     "1:nsubj(U); 4:nsubj; 8:dobj",
     "test_semantics_EN.py:269-272 test_that_subj_many_antecedents"),
    ("The dog that chased and caught the cat was tired", 5, "1:nsubj; 7:dobj",
     "test_semantics_EN.py:259-267 test_that_predicate_conjunction"),
    ("The dog always used to chase the cat", 5, "1:nsubj; 7:dobj",
     "test_semantics_EN.py:303-308 test_used_to_positive (semantic aux elided)"),
    ("The dog is going to chase the cat", 5, "1:nsubj; 7:dobj",
     "test_semantics_EN.py:318-323 test_going_to"),
    ("The dog was going to chase the cat", 5, "1:nsubj(U); 7:dobj(U)",
     "test_semantics_EN.py:325-330 test_was_going_to (prospective past uncertain)"),
    ("The dog was used to chase the cat", 5, "1:nsubj(U); 7:dobj",
     "test_semantics_EN.py:310-313 test_used_to_negative_1 (ordinary control)"),
    ("The dog used the mouse to chase the cat", 6, "4:nsubj(U); 8:dobj",
     "test_semantics_EN.py:315-317 test_used_to_negative_2 (object control)"),
    ("He should do it", 2, "0:nsubj(U); 3:dobj(U)",
     "test_semantics_EN.py:438-441 test_positive_modal_verb"),
    ("He cannot do it", 2, "0:nsubj(U); 3:dobj(U)",
     "test_semantics_EN.py:443-448 test_negative_modal_verb"),
    ("He will have been doing it", 4, "0:nsubj; 5:dobj",
     "test_semantics_EN.py:455-458 test_phrasal_verb_2 ('will' futures certain)"),
    ("Eating by employees", 0, "1:prep; 2:pobjb",
     "test_semantics_EN.py:460-463 test_pobjb_1"),
    ("Eating of icecream", 0, "1:prep; 2:pobjo",
     "test_semantics_EN.py:465-468 test_pobjb_2"),
    ("Travelling to Munich", 0, "1:prep; 2:pobjt",
     "test_semantics_EN.py:470-473 test_pobjt"),
    ("He gave it to the employee and the boss", 1,
     "0:nsubj; 2:dobj; 3:prep; 5:pobjt; 8:pobjt",
     "test_semantics_EN.py:481-486 test_dative_prepositional_phrase_with_conjunction"),
    ("He talked about the cat chased by the dog", 5,
     "4:dobj; 6:prep; 8:pobjb",
     "test_semantics_EN.py:487-491 test_simple_participle_phrase (reduced relative)"),
    ("He talked about the cat and the mouse chased by the dog", 8,
     "4:dobj; 7:dobj; 9:prep; 11:pobjb",
     "test_semantics_EN.py:492-496 test_participle_phrase_with_conjunction"),
    ("The dog was thinking about chasing a cat", 5, "1:nsubj(U); 7:dobj",
     "test_semantics_EN.py:518-521 test_verb_prepositional_complement_simple_active"),
    ("The dog and the lion were thinking about chasing a cat and a mouse", 8,
     "1:nsubj(U); 4:nsubj(U); 10:dobj; 13:dobj",
     "test_semantics_EN.py:523-527 test_verb_prepositional_complement_with_conjunction_active"),
    ("The cat was thinking about being chased by a dog", 6,
     "1:nsubjpass(U); 7:prep; 9:pobjb",
     "test_semantics_EN.py:574-578 test_verb_prepositional_complement_simple_passive (agent→prep renaming)"),
    ("The dog who was thinking about chasing a cat came home", 6,
     "1:nsubj(U); 8:dobj",
     "test_semantics_EN.py:529-534 test_verb_prepositional_complement_with_relative_clause_active"),
    ("The employee needs insurance for the next five years", 3,
     "4:prepposs(U); 8:pobjp(U)",
     "test_semantics_EN.py:676-680 test_single_preposition_dependency_added_to_noun"),
    ("He took out insurance", 1, "0:nsubj; 2:prt; 3:dobj",
     "test_semantics_EN.py:428-432 test_phrasal_verb_1 (we keep the prt dep; the "
     "reference removes it after conflating the lemma)"),
    ("Richard was glad to understand.", 4, "0:arg(U)",
     "test_semantics_EN.py:802-805 test_adjective_verb_clause_subjective_simple"),
    ("Richard was hard to reach.", 4, "0:arg(U)",
     "test_semantics_EN.py:815-818 test_adjective_verb_clause_objective_simple"),
    ("Houses in the village.", 0, "1:prep; 3:pobjp",
     "test_semantics_EN.py:828-831 test_prepositional_phrase_dependent_on_noun_no_conjunction"),
    ("Houses in the village and the town.", 0, "1:prep; 3:pobjp; 6:pobjp",
     "test_semantics_EN.py:833-836 test_prepositional_phrase_dependent_on_noun_with_conjunction"),
]


INITIAL_QUESTION_WORD_CASES = [
    ("Whom did you talk to?", 0, True,
     "test_semantics_EN.py:962-964 test_question_word_initial"),
    ("To whom did you talk?", 1, True,
     "test_semantics_EN.py:966-968 test_question_word_after_preposition"),
    ("On the basis of what information did you come?", 4, True,
     "test_semantics_EN.py:974-977 test_question_word_in_complex_phrase"),
    ("You came because of whom?", 4, False,
     "test_semantics_EN.py:983-984 test_question_word_control_2"),
]


@pytest.mark.parametrize("text,i,expected,ref", INITIAL_QUESTION_WORD_CASES)
def test_initial_question_word_flag(text, i, expected, ref):
    p = parse_document(text, "en")
    assert p["tokens"][i]["is_initial_question_word"] is expected, ref


def test_phrasal_verb_lemma():
    # reference test_semantics_EN.py:428-432: took out → lemma 'take out'
    p = parse_document("He took out insurance", "en")
    assert p["tokens"][1]["lemma"] == "take out"


def test_negative_modal_negates():
    # reference test_semantics_EN.py:443-448: cannot → is_negated
    p = parse_document("He cannot do it", "en")
    assert p["tokens"][2]["is_negated"] is True


def test_by_of_to_unmatchable():
    # reference language_specific_rules.py:615-617
    p = parse_document("The cat was chased by the dog", "en")
    by = next(t for t in p["tokens"] if t["text"] == "by")
    assert by["is_matchable"] is False
    p2 = parse_document("The bird flew over the river", "en")
    over = next(t for t in p2["tokens"] if t["text"] == "over")
    assert over["is_matchable"] is True


@pytest.mark.parametrize("text,i,expected,ref", SEMANTIC_CHILDREN_CASES,
                         ids=[c[3].split()[0] + f"@{c[1]}" for c in SEMANTIC_CHILDREN_CASES])
def test_semantic_children(text, i, expected, ref):
    assert children_repr(text, i) == expected, ref


NEGATION_SCOPE_CASES = [
    # (text, token_idx, expected is_negated, provenance)
    ("It had not been claimed that the dog had chased the cat", 9, True,
     "test_semantics_EN.py:119-122 test_negator_negation_within_parent_clause"),
    ("Nobody said the dog had chased the cat", 5, True,
     "test_semantics_EN.py:124-126 test_operator_negation_within_parent_clause"),
    ("The dog chased the cat who was not happy", 2, False,
     "test_semantics_EN.py:128-130 test_negator_negation_within_child_clause"),
    ("The dog chased the cat who told nobody", 2, False,
     "test_semantics_EN.py:132-134 test_operator_negation_within_child_clause"),
]


@pytest.mark.parametrize("text,i,expected,ref", NEGATION_SCOPE_CASES)
def test_negation_scope_across_clauses(text, i, expected, ref):
    p = parse_document(text, "en")
    assert p["tokens"][i]["is_negated"] is expected, ref


def test_sentence_final_relative_clause():
    # "chased the cat who told nobody": antecedent is the main object;
    # the relative verb takes it as subject (reference relative
    # constructions, en language_specific_rules.py:287-476)
    assert children_repr("The dog chased the cat who told nobody", 6) \
        == "4:nsubj; 7:dobj"


# ---- transcribed DE semantic-dependency matrix -------------------------
# The reference uses TIGER labels (sb/oa/da); our parser normalizes to
# the same label space as English (nsubj/dobj/dative), so expectations
# are transcribed with sb→nsubj, oa→dobj, da→dative — a pure renaming.

SEMANTIC_CHILDREN_CASES_DE = [
    ("Der Hund jagte die Katze.", 2, "1:nsubj; 4:dobj",
     "test_semantics_DE.py:14-22 test_initialize_semantic_dependencies (sb→nsubj, oa→dobj)"),
    ("Der Hund und der Löwe jagten die Katze", 5, "1:nsubj; 4:nsubj; 7:dobj",
     "test_semantics_DE.py:25-30 test_one_righthand_sibling_with_and_conjunction"),
    ("Der Hund, der Hund und der Löwe jagten die Katze", 8,
     "1:nsubj; 4:nsubj; 7:nsubj; 10:dobj",
     "test_semantics_DE.py:32-40 test_many_righthand_siblings_with_and_conjunction"),
    ("Der große und starke Hund kam heim", 4, "1:amod; 3:amod",
     "test_semantics_DE.py:59-64 test_righthand_siblings_of_semantic_children_two"),
    ("Die Katze wurde vom Hund gejagt.", 5, "1:nsubjpass; 3:prep; 4:pobjb",
     "test_semantics_DE.py passive + agent (vom → pobjb actor)"),
    ("Die Frau gab dem Mann das Buch.", 2, "1:nsubj; 4:dative; 6:dobj",
     "test_semantics_DE.py double object (sb/da/oa)"),
]


@pytest.mark.parametrize("text,i,expected,ref", SEMANTIC_CHILDREN_CASES_DE,
                         ids=[f"de@{c[1]}:{c[0][:24]}" for c in SEMANTIC_CHILDREN_CASES_DE])
def test_semantic_children_de(text, i, expected, ref):
    assert children_repr(text, i, lang="de") == expected, ref


COREF_CHAIN_CASES = [
    # (text, token_idx, expected chain member set, provenance)
    ("The employee got home. He was surprised", 1, {1, 5},
     "test_semantics_EN.py:709-716 test_coreference_between_sentences"),
    ("The employee got home. He was surprised", 3, set(),
     "test_semantics_EN.py:709-716 ('home' not in any chain)"),
    ("Richard was at work. He went home. He was surprised", 0, {0, 5, 9},
     "test_semantics_EN.py:718-728 test_coreference_three_items_in_chain"),
    ("The man who knows himself has an advantage", 4, {1, 4},
     "test_semantics_EN.py:742-747 test_coreference_within_relative_clause (reflexive)"),
]


@pytest.mark.parametrize("text,i,expected,ref", COREF_CHAIN_CASES)
def test_coreference_chains(text, i, expected, ref):
    p = parse_document(text, "en")
    assert set(p["tokens"][i]["coref_chain"]) == expected, ref


def test_righthand_siblings_anchoring():
    # reference test_semantics_EN.py:27-34: siblings live on the FIRST
    # conjunct; members carry empty lists
    p = parse_document("The dog, the wolf and the hound chased the cat", "en")
    toks = {t["i"]: t for t in p["tokens"]}
    assert toks[1]["righthand_siblings"] == [4, 7]
    assert toks[4]["righthand_siblings"] == []
    assert toks[7]["righthand_siblings"] == []


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
    # transcribed from tests/en/test_semantics_EN.py:872-939 (the
    # reference's derived-lemma matrix; suffix rules rules.py:494-556)
    ("imprisonment", "NOUN", "imprison"),
    ("linearization", "NOUN", "linearize"),
    ("linearisation", "NOUN", "linearise"),
    ("economically", "ADV", "economic"),
    ("horribly", "ADV", "horrible"),
    ("laxness", "NOUN", "lax"),
    ("bawdiness", "NOUN", "bawdy"),
    ("verification", "NOUN", "verify"),
    ("manipulation", "NOUN", "manipulate"),
    ("domestication", "NOUN", "domesticate"),
    ("vehicle", "NOUN", "vehicle"),
    ("happiness", "NOUN", "happy"),
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
    assert "verb-acc: jagd-katz" in got


def test_de_compound_head_subword_variant():
    # reference tests/de/test_phraselet_production_DE.py:112-135:
    # 'Landschaftsgärtner gibt' emits BOTH the whole compound and the
    # head-subword variant, and word phraselets only the whole compound
    got = labels("Die Wohnungsgesellschaft verkaufte das Haus.", lang="de")
    assert "verb-nom: verkauf-wohnungsgesellschaft" in got
    assert "verb-nom: verkauf-gesellschaft" in got
    # -ung nominalization derives to the verb (reference de rules
    # :1041-1055: wohnung → wohnen)
    assert "intcompound: gesellschaft-wohnen" in got
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
                     vectors=WORD_VECTORS, overall_similarity_threshold=0.8)
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
    # he/she PREFER person antecedents but fall back to the nearest
    # noun (coreferee links animals through gendered pronouns —
    # reference coref dict tests use 'he' for a dog)
    assert "predicate-passivesubject: chase-cat" in es
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
