"""EN semantics parity batch 2, transcribed from the reference's
tests/en/test_semantics_EN.py (reference line cited per test) — the
tests NOT already covered by tests/test_reference_parity.py /
tests/test_nlp.py: derived-lemma suffix rules, matching reprs,
displaced prepositions, prepositional complements (verb + adjective,
active/passive), modifying adverbial phrases, whose-clauses, relative
prepositional phrases, or-conjunctions, noun-mention coreference and
initial question words.  Dependency assertions check the semantic
subset of the reference's child strings over our label names.

NOT ported (documented divergences):
- the four *_non_coreferring_pronoun prepositional-complement cases
  (ref :538-665): the reference excludes a pleonastic 'It' as the
  gerund's controller; our parser links it (subset-asserting the dobj
  would pass but the reference's point IS the exclusion)
- test_displaced_preposition_no_complementizer_with_conjunction and
  friends over conjoined ANTECEDENTS (ref :315-342, 364-403): the
  displaced preposition reaches only the closest antecedent in our
  parse
- the adjective-complement relative-clause and
  conjunction-of-dependent-verb coreferring variants (ref :557, :688):
  the copular relative rewires the adjective as amod before the
  gerund-complement pass can fire
- test_formerly_problematic_sentence_no_exception_thrown /
  test_maximum_mentions_difference: covered in substance by
  tests/test_reference_parity.py's chain-cap tests
"""

import pytest

from holmes_extractor_spark.nlp.parser import parse_document


def _dl(text):
    p = parse_document(text, "en")
    return (sorted((d["parent"], d["child"], d["label"], d["uncertain"])
                   for d in p["deps"]), p)


def _has(ds, *wanted):
    missing = [w for w in wanted if w not in ds]
    assert not missing, f"missing {missing} in {ds}"


# ------------------------------------------------------ or-conjunction

def test_one_righthand_sibling_with_or_conjunction():  # ref :36
    _, p = _dl("The dog or the hound chased the cat")
    assert p["tokens"][1]["righthand_siblings"] == [4]
    assert p["tokens"][1]["involved_in_or"]
    assert p["tokens"][4]["involved_in_or"]
    assert p["tokens"][4]["righthand_siblings"] == []


def test_many_righthand_siblings_with_or_conjunction():  # ref :43
    _, p = _dl("The dog, the wolf or the hound chased the cat")
    assert p["tokens"][1]["righthand_siblings"] == [4, 7]
    for i in (1, 4, 7):
        assert p["tokens"][i]["involved_in_or"]


# ------------------------------------------------- relative structures

def test_which_many_antecedents():  # ref :243
    ds, _ = _dl("The lion, the tiger and the dog which chased the cat "
                "were tired")
    _has(ds, (9, 1, "nsubj", True), (9, 4, "nsubj", True),
         (9, 7, "nsubj", False), (9, 11, "dobj", False))


def test_that_subj_one_antecedent():  # ref :252
    ds, _ = _dl("The dog that chased the cat was tired")
    _has(ds, (3, 1, "nsubj", False), (3, 5, "dobj", False))


def test_relant_predicate_conjunction():  # ref :293
    ds, _ = _dl("The cat the dog chased and pursued were tired")
    _has(ds, (4, 1, "relant", False), (4, 3, "nsubj", False),
         (6, 1, "relant", False))
    assert (6, 3, "nsubj", False) in ds or (6, 3, "nsubj", True) in ds


def test_simple_whose_clause():  # ref :405
    ds, _ = _dl("The dog whose owner I met was tired")
    _has(ds, (3, 1, "poss", False))


def test_whose_clause_with_conjunction_of_possessor():  # ref :412
    ds, _ = _dl("The dog whose owner and friend I met was tired")
    _has(ds, (3, 1, "poss", False), (5, 1, "poss", False))


def test_whose_clause_with_conjunction_of_possessed():  # ref :421
    ds, _ = _dl("The lion and dog whose owner I met were tired")
    _has(ds, (5, 1, "poss", True), (5, 3, "poss", False))


def test_simple_relative_prepositional_phrase():  # ref :838
    ds, _ = _dl("The table from which we ate.")
    _has(ds, (5, 1, "pobjp", False), (5, 4, "nsubj", False))


def test_conjunction_relative_prepositional_phrase():  # ref :845
    ds, _ = _dl("The table and the chair from which you and I ate and "
                "drank.")
    for v in (10, 12):
        _has(ds, (v, 1, "pobjp", True), (v, 4, "pobjp", True),
             (v, 7, "nsubj", False), (v, 9, "nsubj", False))


def test_predicative_adjective_in_relative_clause():  # ref :958
    ds, _ = _dl("He saw his son, who was sad.")
    _has(ds, (1, 3, "dobj", False), (3, 7, "amod", False))


# --------------------------------------------- displaced prepositions

def test_displaced_preposition_phrasal_verb():  # ref :301
    ds, _ = _dl("The office you ate your roll in was new")
    _has(ds, (6, 1, "pobj", False))


def test_displaced_preposition_no_complementizer():  # ref :306
    # (the reference also asserts roll's '4:poss' — possessive
    # determiners carry no poss dep in our scheme)
    ds, _ = _dl("The office you ate your roll at was new")
    _has(ds, (6, 1, "pobj", False))


def test_displaced_preposition_no_complementizer_with_second_preposition():
    # ref :325
    ds, _ = _dl("The office you ate your roll with gusto at was new")
    _has(ds, (8, 1, "pobj", False))


def test_displaced_preposition_that():  # ref :345
    ds, _ = _dl("The office that you ate your roll at was new")
    _has(ds, (7, 1, "pobj", False))


def test_displaced_preposition_that_preposition_points_to_that():
    # ref :354
    ds, _ = _dl("The building that you ate your roll at was new")
    _has(ds, (7, 1, "pobj", False))


def test_displaced_preposition_that_with_second_preposition():  # ref :385
    ds, _ = _dl("The office that you ate your roll with gusto at was new")
    _has(ds, (9, 1, "pobj", False))


# ------------------------------------------------- modal/control misc

def test_participle():  # ref :434
    _, p = _dl("An adopted child")
    assert p["tokens"][1]["lemma"] == "adopt"


def test_ought_to():  # ref :450
    ds, _ = _dl("He ought to do it")
    _has(ds, (3, 0, "nsubj", True))
    assert (3, 4, "dobj", True) in ds or (3, 4, "dobj", False) in ds


def test_dative_prepositional_phrase():  # ref :475
    ds, p = _dl("He gave it to the employee")
    _has(ds, (1, 0, "nsubj", False), (1, 2, "dobj", False),
         (1, 5, "pobjt", False))
    assert not p["tokens"][3]["is_matchable"]


def test_dative_prepositional_phrase_with_conjunction():  # ref :481
    ds, _ = _dl("He gave it to the employee and the boss")
    _has(ds, (1, 5, "pobjt", False), (1, 8, "pobjt", False))


def test_dependencies_not_added_to_sibling_to_the_right():  # ref :695
    ds, _ = _dl("He saw them and laughed")
    _has(ds, (4, 0, "nsubj", True))
    assert (4, 2, "dobj", False) not in ds and (4, 2, "dobj", True) not in ds


def test_complementization_with_conjunction_and_agent():  # ref :202
    ds, _ = _dl("The mouse ordered the dog and the cat to be chased by "
                "the cat and the tiger")
    _has(ds, (10, 4, "nsubjpass", True), (10, 7, "nsubjpass", True),
         (10, 13, "pobjb", False), (10, 16, "pobjb", False))


# ------------------------------------- modifying adverbial phrases

def test_subjective_modifying_adverbial_phrase():  # ref :498
    ds, _ = _dl("The lion-chased cat came home")
    _has(ds, (2, 1, "advmodsubj", False), (2, 3, "advmodobj", False))


def test_subjective_modifying_adverbial_phrase_with_conjunction():
    # ref :503
    ds, _ = _dl("The lion-chased cat and mouse came home")
    _has(ds, (2, 1, "advmodsubj", False), (2, 3, "advmodobj", False),
         (2, 5, "advmodobj", True))


def test_objective_modifying_adverbial_phrase():  # ref :508
    ds, _ = _dl("The cat-chasing lion came home")
    _has(ds, (2, 1, "advmodobj", False), (2, 3, "advmodsubj", False))


def test_objective_modifying_adverbial_phrase_with_conjunction():
    # ref :513
    ds, _ = _dl("The cat-chasing lion and dog came home")
    _has(ds, (2, 1, "advmodobj", False), (2, 3, "advmodsubj", False),
         (2, 5, "advmodsubj", True))


# --------------------------------- prepositional complements (active)

def test_verb_prepositional_complement_simple_active():  # ref :518
    ds, _ = _dl("The dog was thinking about chasing a cat")
    _has(ds, (5, 1, "nsubj", True), (5, 7, "dobj", False))


def test_verb_prepositional_complement_with_conjunction_active():
    # ref :523
    ds, _ = _dl("The dog and the lion were thinking about chasing a cat "
                "and a mouse")
    _has(ds, (8, 1, "nsubj", True), (8, 4, "nsubj", True),
         (8, 10, "dobj", False), (8, 13, "dobj", False))


def test_verb_prepositional_complement_with_relative_clause_active():
    # ref :529
    ds, _ = _dl("The dog who was thinking about chasing a cat came home")
    _has(ds, (6, 1, "nsubj", True), (6, 8, "dobj", False))


def test_verb_preposition_complement_with_coreferring_pronoun_active():
    # ref :534
    ds, _ = _dl("He saw a dog. It was thinking about chasing a cat")
    _has(ds, (9, 5, "nsubj", True), (9, 11, "dobj", False))


def test_adjective_prepositional_complement_simple_active():  # ref :546
    ds, _ = _dl("The dog was worried about chasing a cat")
    _has(ds, (5, 1, "nsubj", True), (5, 7, "dobj", False))


def test_adjective_prepositional_complement_with_conjunction_active():
    # ref :551
    ds, _ = _dl("The dog and the lion were worried about chasing a cat "
                "and a mouse")
    _has(ds, (8, 1, "nsubj", True), (8, 4, "nsubj", True),
         (8, 10, "dobj", False), (8, 13, "dobj", False))


def test_adjective_preposition_complement_with_coreferring_pronoun_active():
    # ref :563
    ds, _ = _dl("He saw a dog. He was worried about chasing a cat")
    _has(ds, (9, 5, "nsubj", True), (9, 11, "dobj", False))


# -------------------------------- prepositional complements (passive)

def test_verb_prepositional_complement_simple_passive():  # ref :574
    ds, _ = _dl("The cat was thinking about being chased by a dog")
    _has(ds, (6, 1, "nsubjpass", True), (6, 9, "pobjb", False))


def test_verb_prepositional_complement_with_conjunction_passive():
    # ref :580
    ds, _ = _dl("The cat and the mouse were thinking about being chased "
                "by a dog and a lion")
    _has(ds, (9, 1, "nsubjpass", True), (9, 4, "nsubjpass", True),
         (9, 12, "pobjb", False), (9, 15, "pobjb", False))


def test_verb_prepositional_complement_with_relative_clause_passive():
    # ref :586
    ds, _ = _dl("The cat who was thinking about being chased by a dog "
                "came home")
    _has(ds, (7, 1, "nsubjpass", True), (7, 10, "pobjb", False))


def test_verb_preposition_complement_with_coreferring_pronoun_passive():
    # ref :592
    ds, _ = _dl("He saw a dog. It was thinking about being chased by a "
                "cat")
    _has(ds, (10, 5, "nsubjpass", True), (10, 13, "pobjb", False))


def test_adjective_prepositional_complement_simple_passive():  # ref :603
    ds, _ = _dl("The cat was worried about being chased by a dog")
    _has(ds, (6, 1, "nsubjpass", True), (6, 9, "pobjb", False))


def test_adjective_prepositional_complement_with_conjunction_passive():
    # ref :608
    ds, _ = _dl("The cat and the mouse were worried about being chased "
                "by a dog and a lion")
    _has(ds, (9, 1, "nsubjpass", True), (9, 4, "nsubjpass", True),
         (9, 12, "pobjb", False), (9, 15, "pobjb", False))


def test_adjective_prepositional_complement_with_relative_clause_passive():
    # ref :614
    ds, _ = _dl("The cat who was worried about being chased by a dog "
                "came home")
    _has(ds, (7, 1, "nsubjpass", True), (7, 10, "pobjb", False))


def test_adjective_preposition_complement_with_coreferring_pronoun_passive():
    # ref :620
    ds, _ = _dl("He saw a dog. It was worried about being chased by a "
                "cat")
    _has(ds, (10, 5, "nsubjpass", True), (10, 13, "pobjb", False))


def test_verb_prepositional_complement_with_conjunction_of_dependent_verb():
    # ref :666
    ds, _ = _dl("The cat and the mouse kept on singing and shouting")
    for v in (7, 9):
        _has(ds, (v, 1, "nsubj", True), (v, 4, "nsubj", True))


def test_verb_p_c_with_conjunction_of_dependent_verb_and_coreferring_pronoun():
    # ref :672
    ds, _ = _dl("I saw a cat. It kept on singing and shouting")
    for v in (8, 10):
        _has(ds, (v, 5, "nsubj", True))


# -------------------------------------------- predicative adjectives

def test_predicative_adjective_with_non_coreferring_pronoun():  # ref :96
    ds, _ = _dl("It was big")
    _has(ds, (0, 2, "amod", False))


def test_predicative_adjective_with_coreferring_pronoun():  # ref :103
    ds, _ = _dl("I saw a dog. It was big")
    _has(ds, (3, 7, "amod", False), (5, 7, "amod", False))


# -------------------------------------------------- preposition extras

def test_multiple_preposition_dependencies_added_to_noun():  # ref :682
    ds, _ = _dl("The employee needs insurance for the next five years "
                "and in Europe")
    _has(ds, (2, 4, "prep", False), (2, 8, "pobjp", False),
         (2, 10, "prep", False), (2, 11, "pobjp", False))


def test_single_preposition_dependency_added_to_coreferring_pronoun():
    # ref :689
    ds, _ = _dl("We discussed the house. The employee needs it for the "
                "next five years")
    _has(ds, (8, 9, "prepposs", True), (8, 13, "pobjp", True))


# ------------------------------------------------ coreference surface

def test_coreference_within_sentence():  # ref :700
    _, p = _dl("The employee got home and he was surprised")
    assert p["tokens"][1]["coref_chain"] == [1, 5]
    assert p["tokens"][5]["coref_chain"] == [1, 5]


def test_coreference_conjunction_in_antecedent():  # ref :730
    _, p = _dl("Richard and Carol came to work. They had a discussion")
    assert 7 in p["tokens"][0]["coref_chain"]
    assert 7 in p["tokens"][2]["coref_chain"]


def test_most_specific_coreferring_term_index_with_pronoun():  # ref :771
    _, p = _dl("I saw Richard. The person came home. He was surprised.")
    assert p["tokens"][5]["most_specific_coref"] == 2


def test_most_specific_coreferring_term_index_without_pronoun():
    # ref :782
    _, p = _dl("I saw Richard. The person came home.")
    assert p["tokens"][2]["most_specific_coref"] == 2
    assert p["tokens"][5]["most_specific_coref"] == 2
    assert p["tokens"][3]["most_specific_coref"] < 0


def test_most_specific_coreferring_term_index_with_coordination():
    # ref :791
    _, p = _dl("I saw Richard. The person and Maria were talking. "
               "They came home.")
    assert p["tokens"][2]["most_specific_coref"] == 2
    assert p["tokens"][5]["most_specific_coref"] == 2
    assert p["tokens"][7]["most_specific_coref"] < 0


# ------------------------------------------------ derived lemma rules

@pytest.mark.parametrize("text,i,derived", [
    ("A long imprisonment.", 2, "imprison"),        # ref :872
    ("He was imprisoned.", 2, "imprison"),          # ref :876
    ("Linearization problems.", 0, "linearize"),    # ref :880
    ("Linearisation problems.", 0, "linearise"),    # ref :885
    ("They used it very economically.", 4, "economic"),  # ref :889
    ("It stank horribly.", 2, "horrible"),          # ref :893
    ("Regrettably it was a problem.", 0, "regrettable"),  # ref :897
    ("He used the software happily.", 4, "happy"),  # ref :901
    ("It went swingingly.", 2, "swinging"),         # ref :905
    ("There was a certain laxness.", 4, "lax"),     # ref :909
    ("There was a certain bawdiness.", 4, "bawdy"),  # ref :913
    ("The playing was very loud.", 1, "play"),      # ref :917
    ("The ramming of the vehicle was very loud.", 1, "ram"),  # ref :921
    ("The verification of the results.", 1, "verify"),  # ref :925
    ("The manipulation of the results.", 1, "manipulate"),  # ref :929
    ("The domestication of the dog.", 1, "domesticate"),  # ref :933
    ("vehicle.", 0, "vehicle"),                     # ref :937
])
def test_derived_lemma_rules(text, i, derived):
    _, p = _dl(text)
    assert p["tokens"][i]["derived_lemma"] == derived


def test_direct_matching_reprs_only_lemma():  # ref :864
    _, p = _dl("dog")
    assert p["tokens"][0]["direct_reprs"] == ["dog"]


def test_direct_matching_reprs_text_and_lemma():  # ref :868
    _, p = _dl("dogs")
    assert p["tokens"][0]["direct_reprs"] == ["dog", "dogs"]


def test_derivation_matching_reprs_only_lemma():  # ref :941
    _, p = _dl("dog")
    assert p["tokens"][0]["derivation_reprs"] == []


def test_derivation_matching_reprs_text_and_lemma():  # ref :945
    _, p = _dl("happiness")
    assert p["tokens"][0]["derivation_reprs"] == ["happy"]


def test_pipe():  # ref :953
    _, p1 = _dl("some dogs")
    _, p2 = _dl("some cats")
    assert p1["tokens"][1]["lemma"] == "dog"
    assert p2["tokens"][1]["lemma"] == "cat"


# ---------------------------------------------- initial question words

def test_question_word_after_double_preposition():  # ref :970
    _, p = _dl("Because of whom did you come?")
    assert p["tokens"][2]["is_initial_question_word"]


def test_question_word_control_1():  # ref :978
    _, p = _dl(". Whom did you talk to?")
    assert not any(t["is_initial_question_word"] for t in p["tokens"])
