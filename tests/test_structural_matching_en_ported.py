"""EN structural-matching parity suite, transcribed from the reference's
tests/en/test_structural_matching_EN.py (cited per test as ref :line).

The fixture mirrors the reference module setup: one manager with the
transcribed test ontology (symmetric matching, test_ontology.owl, ref
:6-8) and the same registered search phrases (ref :15-61). Instead of
re-registering one document per test (the reference's _get_matches,
ref :79-82), ALL test documents are registered up front and matched in
ONE distributed job; each test asserts on its document's slice of the
result — matching is per-document, so the observable behaviour is
identical, and the suite exercises the scale path (one corpus-wide
match, no per-test Spark jobs).

Matches are sorted by document position; where the reference's
assertion order depends on its internal sort, the flag *multiset* is
asserted instead (semantically identical coverage).
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

# transcribed from reference tests/en/test_ontology.owl (multiword
# entries space-separated per the EN hyphen-normalization convention)
REF_ONTOLOGY = [
    ("german shepherd dog", "subClassOf", "dog"),
    ("cat", "subClassOf", "animal"),
    ("cat", "equivalentClass", "cat creature"),
    ("cat", "equivalentClass", "pussy"),
    ("cat creature", "subClassOf", "animal"),
    ("chase", "equivalentClass", "chasing"),
    ("dog", "subClassOf", "animal"),
    ("dog", "equivalentClass", "hound"),
    ("explanation", "equivalentClass", "invite"),
    # the owl file's two IRI-distinct 'horse' classes (animals#horse vs
    # sports#horse, test_ontology.owl:125, :273) — '~sense' node-id
    # suffixes keep the senses separate while sharing the label
    ("foal", "subClassOf", "horse~animals"),
    ("horse~animals", "subClassOf", "animal"),
    ("hound", "subClassOf", "animal"),
    ("kitten", "subClassOf", "cat"),
    ("modest", "equivalentClass", "monthly"),
    ("open", "equivalentClass", "take out"),
    ("puppy", "subClassOf", "dog"),
    ("pussy", "subClassOf", "animal"),
    ("horse~sports", "subClassOf", "school gear"),
    ("horse~sports", "subClassOf", "gymnastics equipment"),
    ("wastage horse", "subClassOf", "horse~sports"),
    ("fido", "type", "dog"),
    ("mimi momo", "type", "cat"),
    ("pranaya jones", "type", "cat"),
    ("harry", "equivalentClass", "harry potter"),
    ("harry potter", "equivalentClass", "potter"),
    ("rainbows", "subClassOf", "arc"),
    # standalone OWL classes with no relations (the reference owl file
    # declares them so Holmes registers their multiword forms,
    # test_ontology.owl:139-255) — an identity synonym triple is our
    # list-of-triples encoding for a bare class entry
    ("unhyphenated multiword", "equivalentClass", "unhyphenated multiword"),
    ("unhyphenated single multiword", "equivalentClass",
     "unhyphenated single multiword"),
    ("hypenated-multiword", "equivalentClass", "hypenated-multiword"),
    ("hypenated-single-multiword", "equivalentClass",
     "hypenated-single-multiword"),
    ("moodiness", "equivalentClass", "moodiness"),
    ("offence", "equivalentClass", "offence"),
    ("offense", "equivalentClass", "offense"),
]

# reference module-level search phrases, ref :15-61
SEARCH_PHRASES = [
    "A dog chases a cat",
    "The man was poor",
    "The rich man",
    "Someone eats a sandwich",
    "The gift to a beneficiary",
    "A colleague's computer",
    "An ENTITYPERSON opens an account",
    "A dog eats a bone",
    "Who is sad?",
    "Insurance for years",
    "An employee needs insurance for the next five years",
    "Somebody gives a file to an employee",
    "Somebody gives a boss a file",
    "Serendipity",
    "Somebody eats at an office",
    "A holiday is hard to book",
    "A man sings",
    "Somebody finds insurance",
    "A salesman lives in ENTITYGPE",
    "A salesman has a house in ENTITYGPE",
    "Somebody attempts to explain",
    "Somebody demands an explanation",
    "Somebody shouts an invitation",
    "An invitation to a salesman",
    "music",
    "neatness",
    "modest",
    "monthly",
    "Somebody uses a wastage horse",
    "A big wastage horse",
    "Somebody sees a waste horse",
    "A small waste horse",
    "a wastage horse",
    "a big hyphenated multiword",
    "a small hyphenated-multiword",
    "a big unhyphenated multiword",
    "a small unhyphenated-multiword",
    "hyphenated single multiword",
    "unhyphenated single multiword",
    "An adopted boy",
    "Someone adopts a girl",
    "An running boy",
    "A girl is running",
    "A son is excited",
    "A pussy meows",
]

# every document text asserted below, label → text
DOCS = {
    "direct": "The dog chased the cat",
    "large_neg": ("We discussed various things. Although it had never been "
                  "claimed that a dog had ever chased a cat, it was "
                  "nonetheless true. This had always been a difficult topic."),
    "inverted": "The cat chased the dog",
    "diff_obj": "The dog chased the tiger",
    "onto_horse": "The dog chased the horse",
    "verb_neg": "The dog did not chase the cat",
    "np_neg": "No dog chased any cat",
    "irrelevant_neg": "The dog who was not old chased the cat",
    "poor_man": "The poor man",
    "man_rich": "The man was rich",
    "poor_poor_man": "The poor and poor man",
    "rich_rich": "The man was rich and rich",
    "conj_and": "The dog and the dog chased a cat and another cat",
    "conj_or": "The dog or the dog chased a cat and another cat",
    "conj_3way": "The dog, the dog or the dog chased a cat and another cat",
    "generic_pron": "A sandwich was eaten",
    "active_will": "The dog will chase the cat",
    "active_used_to": "The dog always used to chase the cat",
    "passive_is": "The cat is chased by the dog",
    "passive_will": "The cat will be chased by the dog",
    "passive_used_to": "The cat always used to be chased by the dog",
    "going_to": "The dog was going to chase the cat",
    "going_to_passive": "The cat was going to be chased by the dog",
    "compl_no_obj": "The dog decided to chase the cat",
    "compl_obj": "He told the dog to chase the cat",
    "passive_compl_no_obj": "The sandwich decided to be eaten",
    "passive_compl_obj": "He told the cat to be chased by the dog",
    "rel_no_pron": "The cat the dog chased was scared",
    "rel_no_pron_inv": "The dog the cat chased was scared",
    "rel_subj": "The dog who chased the cat came home",
    "rel_subj_conj": "The dog who chased the cat and cat came home",
    "rel_obj_who": "The cat who the dog chased came home",
    "rel_obj_that": "The cat that the dog chased came home",
    "whose": "The colleague whose computer I repaired last week has gone home",
    "phrasal": "Richard Hudson took out an account",
    "modal": "The dog could chase the cat",
    "active_participle": "The dog chasing the cat was a problem",
    "gerund_of": "The dog's chasing of the cat was a problem",
    "gerund_by": "The cat's being chased by the dog was a problem",
    "entity_literal": "We discussed an entity and a second ENTITY.",
    "advphr_obj": "The cat-chasing dog and dog came home",
    "advphr_obj_inv": "The dog-chasing cat and cat came home",
    "advphr_subj": "The dog-chased cat and cat came home",
    "advphr_subj_inv": "The cat-chased dog and dog came home",
    "very_sad": "The man was very sad.",
    "displaced_prep": "The office you ate your roll at was new",
    "displaced_prep_conj": ("The office and the office that you ate "
                            "your roll at were new"),
    "needs_insurance": "An employee needs insurance for the next five years",
    "dative_conj": "The file was given to the boss and the boss",
    "double_obj": "Somebody gave the employee the file",
    "serendipity": "serendipity",
    "tough_book": "The holiday was very hard to book",
    "booked": "The holiday was booked",
    "tough_find": "The insurance was very hard to find",
    "glad_sing": "The man was very glad to sing",
    "pp_verb": "The salesman lived in England, Germany and France",
    "pp_noun": "The salesman had a house in England, Germany and France",
    "deriv_root_doc": "The eating of a bone by a puppy",
    "deriv_root_sp": "Somebody gives to a beneficiary",
    "deriv_nonroot_doc": "Somebody attempts an explanation",
    "deriv_nonroot_sp": "Somebody demands to explain",
    "deriv_nonroot_conj": "Somebody attempts an explanation and an explanation",
    "neat": "neat",
    "musical": "musical",
    "month": "month",
    "modestly": "modestly",
    "deriv_onto_doc": "Somebody attempts an invitation",
    "deriv_onto_sp": "Somebody shouts to explain",
    "mw_deriv_root": "A big waste horse",
    "mw_direct": "a wastage horse",
    "mw_deriv_sp_root": "A small wastage horse",
    "hyph1": "A big hyphenated-multiword",
    "hyph2": "A big hyphenated multiword",
    "hyph3": "A small hyphenated-multiword",
    "hyph4": "A small hyphenated multiword",
    "hyph5": "A big unhyphenated-multiword",
    "hyph6": "A big unhyphenated multiword",
    "hyph7": "A small unhyphenated-multiword",
    "hyph8": "A small unhyphenated multiword",
    "hyph9": "hyphenated-single-multiword",
    "hyph10": "unhyphenated-single-multiword",
    "dobj_amod": "Someone adopts a boy",
    "amod_dobj": "An adopted girl",
    "nsubj_amod": "A boy is running",
    "amod_nsubj": "A running girl",
    "dobj_amod_conj": "Someone adopts a boy and a boy",
    "amod_dobj_conj": "An adopted girl and girl",
    "nsubj_amod_conj": "A boy and a boy are running",
    "amod_nsubj_conj": "A running girl and girl",
    "pred_adj_rel": "He saw his son, who was excited.",
    "cat_creature": "The cat creature meowed.",
    "whose_poss_conj": ("The colleague and colleague whose computer I "
                        "repaired last week have gone home"),
    "whose_possessed_conj": ("The colleague whose computer and computer "
                             "I repaired last week has gone home"),
    "passive_participle": "He talked about the cat chased by the dog",
    "adj_prep_compl_conj_act": ("The dog and the lion were worried about "
                                "chasing a cat and a mouse"),
    "adj_prep_compl_conj_pass": ("The cat and the mouse were worried about "
                                 "being chased by a dog and a lion"),
    "verb_prep_compl_conj_act": ("The dog and the lion were thinking about "
                                 "chasing a cat and a mouse"),
    "verb_prep_compl_conj_pass": ("The cat and the mouse were thinking "
                                  "about being chased by a dog and a lion"),
    "dative_conj_to_to": "The file was given to the boss and to the boss",
    "obj_adj_verb_compound": ("The insurance and the insurance were very "
                              "hard and hard to find and to find"),
    "subj_adj_verb_compound": ("The man and the man were very glad and "
                               "glad to sing and to sing"),
    "no_loop": ("The thought of having to read a boring book of 400 "
                "pages in English."),
    "deriv_nonroot_sp_conj": "Somebody demands to explain and to explain",
    "deriv_onto_root": "Somebody explains to a salesman",
    "mw_deriv_nonroot": "A waste horse was used",
    "mw_single_deriv": "a waste horse",
    "mw_deriv_sp_nonroot": "A wastage horse was seen",
}


@pytest.fixture(scope="module")
def by_doc(spark):
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                           ontology_symmetric=True)
    for sp in SEARCH_PHRASES:
        m.register_search_phrase(sp)
    for label, text in DOCS.items():
        m.parse_and_register_document(text, label)
    grouped: dict[str, list[dict]] = {k: [] for k in DOCS}
    for match in m.match():
        grouped[match["document"]].append(match)
    for v in grouped.values():
        v.sort(key=lambda mm: mm["index_within_document"])
    return grouped


def uncertains(ms):
    return sorted(m["uncertain"] for m in ms)


# --------------------------------------------------------------- basics

def test_direct_matching(by_doc):  # ref :84
    ms = by_doc["direct"]
    assert len(ms) == 1 and not ms[0]["negated"]


def test_matching_within_large_sentence_with_negation(by_doc):  # ref :89
    ms = by_doc["large_neg"]
    assert len(ms) == 1 and ms[0]["negated"]


def test_nouns_inverted(by_doc):  # ref :97
    assert by_doc["inverted"] == []


def test_different_object(by_doc):  # ref :101
    assert by_doc["diff_obj"] == []


def test_different_object_matching_ontology_within_sentence(by_doc):  # ref :105
    # symmetric ontology: search 'wastage horse' matches hypernym 'horse'
    assert len(by_doc["onto_horse"]) == 1


def test_verb_negation(by_doc):  # ref :109
    ms = by_doc["verb_neg"]
    assert len(ms) == 1 and ms[0]["negated"]


def test_noun_phrase_negation(by_doc):  # ref :116
    ms = by_doc["np_neg"]
    assert len(ms) == 1 and ms[0]["negated"]


def test_irrelevant_negation(by_doc):  # ref :121
    ms = by_doc["irrelevant_neg"]
    assert len(ms) == 1 and not ms[0]["negated"]


# --------------------------------------------- adjectives / conjunction

def test_adjective_swapping(by_doc):  # ref :128
    assert len(by_doc["poor_man"]) == 1
    assert len(by_doc["man_rich"]) == 1


def test_adjective_swapping_with_conjunction(by_doc):  # ref :134
    ms = by_doc["poor_poor_man"]
    assert len(ms) == 2 and uncertains(ms) == [False, False]
    assert len(by_doc["rich_rich"]) == 2


def test_conjunction_with_and(by_doc):  # ref :142
    ms = by_doc["conj_and"]
    assert len(ms) == 4 and uncertains(ms) == [False] * 4


def test_conjunction_with_or(by_doc):  # ref :150
    ms = by_doc["conj_or"]
    assert len(ms) == 4 and uncertains(ms) == [True] * 4


def test_threeway_conjunction_with_or(by_doc):  # ref :158
    ms = by_doc["conj_3way"]
    assert len(ms) == 6 and uncertains(ms) == [True] * 6


def test_generic_pronoun(by_doc):  # ref :170
    assert len(by_doc["generic_pron"]) == 1


# ------------------------------------------------------- verb morphology

def test_active(by_doc):  # ref :174
    for key in ("active_will", "active_used_to"):
        ms = by_doc[key]
        assert len(ms) == 1 and not ms[0]["uncertain"], key


def test_passive(by_doc):  # ref :186
    for key in ("passive_is", "passive_will", "passive_used_to"):
        ms = by_doc[key]
        assert len(ms) == 1 and not ms[0]["uncertain"], key


def test_was_going_to_active(by_doc):  # ref :207
    ms = by_doc["going_to"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_was_going_to_passive(by_doc):  # ref :214
    ms = by_doc["going_to_passive"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_active_complement_without_object(by_doc):  # ref :221
    ms = by_doc["compl_no_obj"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_active_complement_with_object(by_doc):  # ref :228
    ms = by_doc["compl_obj"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_passive_complement_without_object(by_doc):  # ref :235
    ms = by_doc["passive_compl_no_obj"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_passive_complement_with_object(by_doc):  # ref :242
    ms = by_doc["passive_compl_obj"]
    assert len(ms) == 1 and ms[0]["uncertain"]


# ------------------------------------------------------ relative clauses

def test_relative_clause_without_pronoun(by_doc):  # ref :249
    ms = by_doc["rel_no_pron"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_relative_clause_without_pronoun_inverted(by_doc):  # ref :256
    assert by_doc["rel_no_pron_inv"] == []


def test_subjective_relative_clause_with_pronoun(by_doc):  # ref :262
    ms = by_doc["rel_subj"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_subjective_relative_clause_with_pronoun_and_conjunction(by_doc):  # ref :269
    ms = by_doc["rel_subj_conj"]
    assert len(ms) == 2 and uncertains(ms) == [False, False]


def test_objective_relative_clause_with_wh_pronoun(by_doc):  # ref :277
    ms = by_doc["rel_obj_who"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_objective_relative_clause_with_that_pronoun(by_doc):  # ref :284
    ms = by_doc["rel_obj_that"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_whose_clause(by_doc):  # ref :291
    ms = by_doc["whose"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


# ------------------------------------------------- phrasal / participles

def test_phrasal_verb(by_doc):  # ref :317
    ms = by_doc["phrasal"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_modal_verb(by_doc):  # ref :324
    ms = by_doc["modal"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_active_participle(by_doc):  # ref :331
    ms = by_doc["active_participle"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_gerund_with_of(by_doc):  # ref :345
    ms = by_doc["gerund_of"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_gerund_with_by(by_doc):  # ref :352
    ms = by_doc["gerund_by"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_capital_entity_is_not_analysed_as_entity_search_phrase_token(spark):  # ref :617
    m = SparkHolmesManager(spark)
    m.register_search_phrase("ENTITY")
    m.parse_and_register_document("Richard Hudson", "d1")
    m.parse_and_register_document("We discussed an entity and a second ENTITY.", "d2")
    ms = m.match()
    assert [x["document"] for x in ms] == ["d2", "d2"]


def test_objective_modifying_adverbial_phrase(by_doc):  # ref :359
    ms = by_doc["advphr_obj"]
    assert len(ms) == 2 and uncertains(ms) == [False, True]


def test_objective_modifying_adverbial_phrase_with_inversion(by_doc):  # ref :367
    assert by_doc["advphr_obj_inv"] == []


def test_subjective_modifying_adverbial_phrase(by_doc):  # ref :373
    ms = by_doc["advphr_subj"]
    assert len(ms) == 2 and uncertains(ms) == [False, True]


def test_subjective_modifying_adverbial_phrase_with_inversion(by_doc):  # ref :381
    assert by_doc["advphr_subj_inv"] == []


# ------------------------------------- passive / question search phrases
# (separate managers — the reference uses
#  holmes_manager_with_variable_search_phrases, ref :66-68)

@pytest.fixture(scope="module")
def variable_mgr_matches(spark):
    """One manager per variable search phrase, matched over the shared
    document set in one job each."""
    out = {}
    for sp_key, sp in [("passive_sp", "A cat was chased by a dog"),
                       ("question_sp", "Why do dogs chase cats?")]:
        m = SparkHolmesManager(spark)
        m.register_search_phrase(sp)
        m.parse_and_register_document("The dog will chase the cat", "active")
        m.parse_and_register_document(
            "The dog and the dog have chased a cat and a cat", "conj_active")
        m.parse_and_register_document(
            "The cat and the cat will be chased by a dog and a dog",
            "conj_passive")
        m.parse_and_register_document("The dog never chased the cat", "negated")
        grouped = {}
        for match in m.match():
            grouped.setdefault(match["document"], []).append(match)
        out[sp_key] = grouped
    return out


def test_passive_search_phrase_with_active_searched_sentence(variable_mgr_matches):  # ref :419
    ms = variable_mgr_matches["passive_sp"]["active"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_passive_search_phrase_with_active_conjunction_searched_sentence(variable_mgr_matches):  # ref :430
    ms = variable_mgr_matches["passive_sp"]["conj_active"]
    assert len(ms) == 4 and all(not x["uncertain"] for x in ms)


def test_passive_search_phrase_with_passive_conjunction_searched_sentence(variable_mgr_matches):  # ref :443
    ms = variable_mgr_matches["passive_sp"]["conj_passive"]
    assert len(ms) == 4 and all(not x["uncertain"] for x in ms)


def test_passive_search_phrase_with_negated_searched_sentence(variable_mgr_matches):  # ref :456
    ms = variable_mgr_matches["passive_sp"]["negated"]
    assert len(ms) == 1 and not ms[0]["uncertain"] and ms[0]["negated"]


def test_question_search_phrase_with_active_searched_sentence(variable_mgr_matches):  # ref :468
    ms = variable_mgr_matches["question_sp"]["active"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_question_search_phrase_with_conjunction_searched_sentences(variable_mgr_matches):  # ref :479,:492
    ms = variable_mgr_matches["question_sp"]["conj_active"]
    assert len(ms) == 4 and all(not x["uncertain"] for x in ms)
    ms = variable_mgr_matches["question_sp"]["conj_passive"]
    assert len(ms) == 4 and all(not x["uncertain"] for x in ms)


def test_question_search_phrase_with_negated_searched_sentence(variable_mgr_matches):  # ref :505
    ms = variable_mgr_matches["question_sp"]["negated"]
    assert len(ms) == 1 and not ms[0]["uncertain"] and ms[0]["negated"]


# ----------------------------------------------------------------- misc

def test_original_search_phrase_root_not_matchable(by_doc):  # ref :538
    assert len(by_doc["very_sad"]) == 1


def test_entitynoun_as_root_node(spark):  # ref :542
    m = SparkHolmesManager(spark)
    m.register_search_phrase("An ENTITYNOUN")
    m.parse_and_register_document("Dogs, cats, lions and elephants", "d")
    assert len(m.match()) == 4


def test_entitynoun_as_non_root_node(spark):  # ref :553
    m = SparkHolmesManager(spark)
    m.register_search_phrase("I saw an ENTITYNOUN")
    m.parse_and_register_document("I saw a dog and a cat", "d")
    assert len(m.match()) == 2


def test_matching_additional_preposition_dependency_on_noun(by_doc):  # ref :563
    # matches both 'Insurance for years' and the full 5-year phrase
    assert len(by_doc["needs_insurance"]) == 2


def test_dative_prepositional_phrase_in_document_dative_noun_phrase_in_search_phrase_1(by_doc):  # ref :570
    assert len(by_doc["dative_conj"]) == 2


def test_dative_noun_phrase_in_document_dative_prepositional_phrase_in_search_phrase(by_doc):  # ref :586
    assert len(by_doc["double_obj"]) == 1


def test_matching_single_word(by_doc):  # ref :594
    assert len(by_doc["serendipity"]) == 1


def test_matching_displaced_preposition_simple(by_doc):  # ref :598
    assert len(by_doc["displaced_prep"]) == 1


def test_matching_displaced_preposition_with_conjunction(by_doc):  # ref :604
    assert len(by_doc["displaced_prep_conj"]) == 2


# -------------------------------------------------- tough-movement (arg)

def test_adjective_verb_phrase_as_search_phrase_matches_simple(by_doc):  # ref :630
    ms = by_doc["tough_book"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_adjective_verb_phrase_as_search_phrase_no_match_with_normal_phrase(by_doc):  # ref :637
    assert by_doc["booked"] == []


def test_objective_adjective_verb_phrase_matches_normal_search_phrase_simple(by_doc):  # ref :650
    ms = by_doc["tough_find"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_subjective_adjective_verb_phrase_matches_normal_search_phrase_simple(by_doc):  # ref :668
    ms = by_doc["glad_sing"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_matching_with_prepositional_phrase_dependent_on_verb(by_doc):  # ref :686
    ms = by_doc["pp_verb"]
    assert len(ms) == 3 and uncertains(ms) == [False] * 3


def test_matching_with_prepositional_phrase_dependent_on_noun(by_doc):  # ref :694
    ms = by_doc["pp_noun"]
    assert len(ms) == 3 and uncertains(ms) == [False] * 3


# ------------------------------------------------------------ derivation

def test_derivation_in_document_on_root(by_doc):  # ref :703
    ms = by_doc["deriv_root_doc"]
    assert len(ms) == 1
    assert "derivation" in [w["match_type"] for w in ms[0]["word_matches"]]


def test_derivation_in_search_phrase_on_root(by_doc):  # ref :710
    ms = by_doc["deriv_root_sp"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][0]["match_type"] == "derivation"


def test_derivation_in_document_on_non_root(by_doc):  # ref :717
    ms = by_doc["deriv_nonroot_doc"]
    assert len(ms) == 1
    assert "derivation" in [w["match_type"] for w in ms[0]["word_matches"]]


def test_derivation_in_search_phrase_on_non_root(by_doc):  # ref :724
    ms = by_doc["deriv_nonroot_sp"]
    assert len(ms) == 1
    assert "derivation" in [w["match_type"] for w in ms[0]["word_matches"]]


def test_derivation_in_document_on_non_root_with_conjunction(by_doc):  # ref :731
    ms = by_doc["deriv_nonroot_conj"]
    assert len(ms) == 2
    for m in ms:
        assert "derivation" in [w["match_type"] for w in m["word_matches"]]


def test_derivation_in_document_on_single_word(by_doc):  # ref :748
    ms = by_doc["neat"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][0]["match_type"] == "derivation"


def test_derivation_in_search_phrase_on_single_word(by_doc):  # ref :753
    ms = by_doc["musical"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][0]["match_type"] == "derivation"


def test_derivation_in_document_on_single_word_with_ontology(by_doc):  # ref :758
    ms = by_doc["month"]
    assert len(ms) == 2
    assert sorted(w["word_matches"][0]["match_type"] for w in ms) == \
        ["derivation", "ontology"]


def test_derivation_in_search_phrase_on_single_word_with_ontology(by_doc):  # ref :764
    ms = by_doc["modestly"]
    assert len(ms) == 2
    assert sorted(w["word_matches"][0]["match_type"] for w in ms) == \
        ["derivation", "ontology"]


def test_derivation_in_document_on_non_root_with_ontology(by_doc):  # ref :770
    ms = by_doc["deriv_onto_doc"]
    assert len(ms) == 1
    assert "ontology" in [w["match_type"] for w in ms[0]["word_matches"]]


def test_derivation_in_search_phrase_on_non_root_with_ontology(by_doc):  # ref :777
    ms = by_doc["deriv_onto_sp"]
    assert len(ms) == 1
    assert "ontology" in [w["match_type"] for w in ms[0]["word_matches"]]


def test_derivation_in_document_with_multiword_root_word(by_doc):  # ref :791
    assert len(by_doc["mw_deriv_root"]) == 2


def test_derivation_in_document_with_multiword_single_word_control(by_doc):  # ref :806
    ms = by_doc["mw_direct"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][0]["match_type"] == "direct"


def test_derivation_in_search_phrase_with_multiword_root_word(by_doc):  # ref :811
    assert len(by_doc["mw_deriv_sp_root"]) == 2


# ----------------------------------------------------------- hyphenation

def test_hyphenation_1(by_doc):  # ref :821
    ms = by_doc["hyph1"]
    assert len(ms) == 1
    assert all(w["match_type"] == "direct" for w in ms[0]["word_matches"])


def test_hyphenation_2(by_doc):  # ref :828
    assert len(by_doc["hyph2"]) == 1


def test_hyphenation_3(by_doc):  # ref :836
    assert len(by_doc["hyph3"]) == 1


def test_hyphenation_4(by_doc):  # ref :844
    assert len(by_doc["hyph4"]) == 1


def test_hyphenation_5(by_doc):  # ref :851
    assert len(by_doc["hyph5"]) == 1


def test_hyphenation_6(by_doc):  # ref :858
    assert len(by_doc["hyph6"]) == 1


def test_hyphenation_7(by_doc):  # ref :865
    assert len(by_doc["hyph7"]) == 1


def test_hyphenation_8(by_doc):  # ref :872
    assert len(by_doc["hyph8"]) == 1


def test_hyphenation_9(by_doc):  # ref :879
    assert len(by_doc["hyph9"]) == 1


def test_hyphenation_10(by_doc):  # ref :886
    assert len(by_doc["hyph10"]) == 1


# --------------------------------------------- participle amod crossover

def test_dobj_matches_amod(by_doc):  # ref :893
    ms = by_doc["dobj_amod"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_amod_matches_dobj(by_doc):  # ref :898
    assert len(by_doc["amod_dobj"]) == 1


def test_nsubj_matches_amod(by_doc):  # ref :902
    assert len(by_doc["nsubj_amod"]) == 1


def test_amod_matches_nsubj(by_doc):  # ref :906
    assert len(by_doc["amod_nsubj"]) == 1


def test_dobj_matches_amod_with_conjunction(by_doc):  # ref :910
    ms = by_doc["dobj_amod_conj"]
    assert len(ms) == 2 and uncertains(ms) == [True, True]


def test_amod_matches_dobj_with_conjunction(by_doc):  # ref :918
    assert len(by_doc["amod_dobj_conj"]) == 2


def test_nsubj_matches_amod_with_conjunction(by_doc):  # ref :922
    assert len(by_doc["nsubj_amod_conj"]) == 2


def test_amod_matches_nsubj_with_conjunction(by_doc):  # ref :928
    assert len(by_doc["amod_nsubj_conj"]) == 2


def test_predicative_adjective_in_relative_clause(by_doc):  # ref :1072
    assert len(by_doc["pred_adj_rel"]) == 1


def test_ontology_matching_both_entries_synonyms_of_third_entry(by_doc):  # ref :1078
    assert len(by_doc["cat_creature"]) == 1


# ------------------------------------------ round-5 ports (ref :299-:816)

def test_whose_clause_with_conjunction_of_possessor(by_doc):  # ref :299
    ms = by_doc["whose_poss_conj"]
    assert len(ms) == 2 and uncertains(ms) == [False, True]


def test_whose_clause_with_conjunction_of_possessed(by_doc):  # ref :308
    ms = by_doc["whose_possessed_conj"]
    assert len(ms) == 2 and uncertains(ms) == [False, False]


def test_passive_participle(by_doc):  # ref :338
    ms = by_doc["passive_participle"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_adjective_prepositional_complement_with_conjunction_active(
        by_doc):  # ref :387
    ms = by_doc["adj_prep_compl_conj_act"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_adjective_prepositional_complement_with_conjunction_passive(
        by_doc):  # ref :395
    ms = by_doc["adj_prep_compl_conj_pass"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_verb_prepositional_complement_with_conjunction_active(
        by_doc):  # ref :403
    ms = by_doc["verb_prep_compl_conj_act"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_verb_prepositional_complement_with_conjunction_passive(
        by_doc):  # ref :411
    ms = by_doc["verb_prep_compl_conj_pass"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_dative_prepositional_phrase_in_document_dative_np_in_sp_2(
        by_doc):  # ref :578
    assert len(by_doc["dative_conj_to_to"]) == 2


def test_objective_adjective_verb_phrase_matches_compound(by_doc):  # ref :657
    ms = by_doc["obj_adj_verb_compound"]
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_subjective_adjective_verb_phrase_matches_compound(by_doc):  # ref :675
    ms = by_doc["subj_adj_verb_compound"]
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_no_loop(by_doc):  # ref :611 (must not hang or raise)
    assert isinstance(by_doc["no_loop"], list)


def test_derivation_in_search_phrase_on_non_root_with_conjunction(
        by_doc):  # ref :740
    ms = by_doc["deriv_nonroot_sp_conj"]
    assert len(ms) == 2
    for m in ms:
        assert m["word_matches"][1]["match_type"] == "derivation"


def test_derivation_in_search_phrase_and_document_on_root_with_ontology(
        by_doc):  # ref :784
    ms = by_doc["deriv_onto_root"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][0]["match_type"] == "ontology"


def test_derivation_in_document_with_multiword_non_root_word(
        by_doc):  # ref :796
    ms = by_doc["mw_deriv_nonroot"]
    assert len(ms) == 2
    assert any(len(m["word_matches"]) > 1
               and m["word_matches"][1]["match_type"] == "derivation"
               for m in ms)


def test_derivation_in_document_with_multiword_single_word(
        by_doc):  # ref :801
    ms = by_doc["mw_single_deriv"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][0]["match_type"] == "derivation"


def test_derivation_in_search_phrase_with_multiword_non_root_word(
        by_doc):  # ref :816
    ms = by_doc["mw_deriv_sp_nonroot"]
    assert len(ms) == 2
    assert any(len(m["word_matches"]) > 1
               and m["word_matches"][1]["match_type"] == "derivation"
               for m in ms)


# ------------- multiword span info in word matches (ref :941-:1033)

@pytest.fixture(scope="module")
def mw_info_matches(spark):
    out = {}
    for key, doc, phrase in (
        ("onto_sent_start", "Fido chased Mimi Momo.", "A dog chases a cat"),
        ("onto_mid", "Yesterday Fido chased Mimi Momo.",
         "A dog chases a cat"),
        ("ent_sent_start", "Fido chased Richard Paul Hudson.",
         "A dog chases an ENTITYPERSON"),
        ("ent_mid", "Yesterday Fido chased Richard Paul Hudson in Prague.",
         "A dog chases an ENTITYPERSON"),
    ):
        m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                               ontology_symmetric=True)
        m.register_search_phrase(phrase)
        m.parse_and_register_document(doc, key)
        out[key] = m.match()
    return out


def _span(ms, j):
    w = ms[0]["word_matches"][j]
    return (w["document_token_index"], w["first_document_token_index"],
            w["last_document_token_index"])


def test_ontology_multiword_info_at_sentence_boundaries(
        mw_info_matches):  # ref :941
    ms = mw_info_matches["onto_sent_start"]
    assert len(ms) == 1
    assert _span(ms, 0) == (0, 0, 0)
    assert _span(ms, 1) == (1, 1, 1)
    assert _span(ms, 2) == (3, 2, 3)


def test_ontology_multiword_info_not_at_sentence_boundaries(
        mw_info_matches):  # ref :964
    ms = mw_info_matches["onto_mid"]
    assert len(ms) == 1
    assert _span(ms, 0) == (1, 1, 1)
    assert _span(ms, 1) == (2, 2, 2)
    assert _span(ms, 2) == (4, 3, 4)


def test_entity_multiword_info_at_sentence_boundaries(
        mw_info_matches):  # ref :987
    ms = mw_info_matches["ent_sent_start"]
    assert len(ms) == 1
    assert _span(ms, 0) == (0, 0, 0)
    assert _span(ms, 1) == (1, 1, 1)
    assert _span(ms, 2) == (4, 2, 4)


def test_entity_multiword_info_not_at_sentence_boundaries(
        mw_info_matches):  # ref :1010
    ms = mw_info_matches["ent_mid"]
    assert len(ms) == 1
    assert _span(ms, 0) == (1, 1, 1)
    assert _span(ms, 1) == (2, 2, 2)
    assert _span(ms, 2) == (5, 3, 5)


def test_corpus_frequency_information(spark):  # ref :1033
    # the reference's expected dict is reproduced as a SUBSET check:
    # this engine's postings add ENTITYNOUN fallback entries the
    # reference computes lazily (pipeline/postings.py:57-60), so the
    # full dict contains extra keys by design
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Yesterday Fido chased Richard Paul Hudson in Prague with Fido "
        "and Balu.", "1")
    m.parse_and_register_document(
        "Yesterday Balu chased Hudson in Munich.", "2")
    d, maximum = m.get_corpus_frequency_information()
    for k, v in (("yesterday", 2), ("ENTITYPERSON", 6), ("fido", 2),
                 ("chase", 2), ("richard", 1), ("paul", 1),
                 ("hudson", 2), ("richard paul hudson", 1),
                 ("ENTITYGPE", 2), ("prague", 1), ("balu", 2),
                 ("munich", 1)):
        assert d.get(k) == v, (k, d.get(k))
    assert maximum == max(d.values())
