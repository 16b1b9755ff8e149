"""EN coreference structural-matching parity suite, transcribed from
the reference's tests/en/test_structural_matching_with_coreference_EN.py
(cited per test as ref :line).

The fixture mirrors the reference module setup (ref :6-30): one manager
with the transcribed test ontology (asymmetric) and the same search
phrases, coreference resolution ON. All documents are registered up
front and matched in ONE distributed job (matching is per-document, so
per-test slices are observably identical to the reference's
register-then-match pattern).
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

from tests.test_structural_matching_en_ported import REF_ONTOLOGY

# ref :13-30
SEARCH_PHRASES = [
    "A dog chases a cat",
    "A big horse chases a cat",
    "Somebody writes a book about an animal",
    "A tiger chases a little cat",
    "A big lion chases a cat",
    "An ENTITYPERSON needs insurance",
    "University for four years",
    "A big company makes a loss",
    "A tired dog",
    "A panther chases a panther",
    "A leopard chases a leopard",
    "A holiday is hard to find",
    "A man sings",
    "Somebody finds a policy",
    "Somebody attempts to explain",
    "An adopted boy",
    "A running boy",
]

DOCS = {
    "same_sent": "I saw a dog and it was chasing a cat.",
    "same_sent_wrong": "I saw a dog and it was being chased by a cat.",
    "same_sent_plural": "I saw dogs and they were chasing a cat.",
    "same_sent_conj_both": "I saw a dog and a dog, while they were chasing a cat.",
    "same_sent_conj_left": "I saw a dog and a horse while they were chasing a cat.",
    "same_sent_conj_right": "I saw a horse and a dog and they were chasing a cat.",
    "same_sent_pron_conj": ("I talked to Peter Jones and Jane Jones, "
                            "while he and she needed insurance."),
    "same_sent_left_pron": ("I talked to Peter Jones, while he and "
                            "Jane Jones needed insurance."),
    "same_sent_left_noun_not": ("I talked to Jane, while a horse and she "
                                "needed insurance."),
    "diff_sent": "I saw a cat. A dog was chasing it.",
    "diff_sent_wrong": "I saw a dog. It was being chased by a cat.",
    "diff_sent_plural": "I saw cats. They were being chased by a dog.",
    "diff_sent_conj_both": "I saw a cat and a cat. A dog was chasing them.",
    "diff_sent_conj_left": "I saw a cat and a horse. A dog was chasing them.",
    "diff_sent_pron_conj": ("I talked to Peter Jones and Jane Jones. "
                            "He and she needed insurance."),
    "diff_sent_left_pron": ("I talked to Peter Jones. He and Jane Jones "
                            "needed insurance."),
    "diff_sent_left_noun_not": ("I talked to Jane Jones. A horse and she "
                                "needed insurance."),
    "dep_same_sent": "I saw a big horse and it was chasing a cat.",
    "dep_same_sent_plural": "I saw big horses and they were chasing a cat.",
    "noun_dep_same_sent": "I saw a big horse and the horse was chasing a cat.",
    "dep_diff_sent": "I saw a big horse. It was chasing a cat.",
    "dep_diff_sent_plural": "I saw big horses. They were chasing a cat.",
    "three_sent": "I saw a horse. It was chasing a cat. It was big.",
    "noun_active_verbal": ("I saw a big horse. The horse was thinking "
                           "about chasing a cat."),
    "ambiguous_univ": ("We visited the university. Richard attended it "
                       "for four years"),
    "reflexive": "The panther chased itself",
    "reflexive_conj_same": "The panther and the panther chased themselves",
    "reflexive_conj_diff": "The panther and the leopard chased themselves",
    "repeated_noun": "We saw a big dog. The dog was chasing a cat.",
    "repeated_noun_both": "We saw a tired dog. The dog was chasing a donkey.",
    "rel_clause": "I saw a cat. The dog that had been chasing it was tired",
    "dep_conj_both": ("I saw a big horse and a big horse. They were "
                      "chasing a cat."),
    "dep_conj_left": ("I saw a big horse and a little horse. They were "
                      "chasing a cat."),
    "dep_conj_right": ("I saw a little horse and a big horse. They were "
                       "chasing a cat."),
    "pron_conj_mixed": "I saw a big horse. It and a big lion were chasing a cat.",
    "tough_coref": "We discussed holidays. They were very hard to find.",
    "tough_coref_neg": "We discussed a holiday. It was found",
    "prep_phrase": ("We discussed dogs. My friend decided to write a "
                    "book about them."),
    "prep_phrase_conj": ("We discussed the dog and the cat. My friend "
                         "decided to write a book about them."),
    "involves_true": "I saw a cat. A dog was chasing it.",
    "involves_false": "A dog was chasing a cat.",
    # ---- round-4 additions (refs :147-:996)
    "same_sent_right_pron": ("I talked to Jane Jones, while Peter Jones "
                             "and she needed insurance."),
    "same_sent_right_noun_not": ("I talked to Peter Jones, while he and "
                                 "a horse need insurance."),
    "diff_sent_conj_right": ("I saw a horse and a cat. They were being "
                             "chased by a dog."),
    "diff_sent_right_pron": ("I talked to Jane Jones. Both Peter Jones "
                             "and she needed insurance."),
    "diff_sent_right_noun_not": ("I talked to Peter Jones. He and a "
                                 "horse need insurance."),
    "dep_conj_same_both": ("I saw a big horse and a big horse and they "
                           "were chasing a cat."),
    "pron_conj_same_both": ("I saw a big horse, and it and a big lion "
                            "were chasing a cat."),
    "pron_conj_same_pron": ("I saw a big horse, and it and a little "
                            "horse were chasing a cat."),
    "pron_conj_same_noun": ("I saw a little horse, and it and a big "
                            "horse were chasing a cat."),
    "plural_noun_dep_same": ("I saw some big horses and the horses were "
                             "chasing a cat."),
    "noun_pron_conj_same_noun": ("I saw a little horse, and the horse "
                                 "and a big horse were chasing a cat."),
    "pron_conj_diff_pron": ("I saw a big horse. It and a little horse "
                            "were chasing a cat."),
    "pron_conj_diff_noun": ("I saw a little horse. It and a big horse "
                            "were chasing a cat."),
    "noun_dep_diff": "I saw a big horse. The horse was chasing a cat.",
    "plural_noun_dep_diff": ("I saw some big horses. The horses were "
                             "chasing a cat."),
    "noun_pron_conj_diff_noun": ("I saw a little horse. The horse and a "
                                 "big horse were chasing a cat."),
    "pron_active_verbal": ("I saw a dog. It was thinking about chasing "
                           "a cat."),
    "pron_passive_verbal": ("I saw a cat. It was thinking about being "
                            "chased by a dog."),
    "pron_active_adjectival": ("I saw a dog. It was happy about chasing "
                               "a cat."),
    "pron_passive_adjectival": ("I saw a cat. It was happy about being "
                                "chased by a dog."),
    "noun_passive_verbal": ("I saw a little cat. The cat was thinking "
                            "about being chased by a tiger."),
    "noun_active_adjectival": ("I saw a big horse. The horse was happy "
                               "about chasing a cat."),
    "noun_passive_adjectival": ("I saw a little cat. The cat was happy "
                                "about being chased by a tiger."),
    "mentions_following": ("A big horse was chasing a cat. The horse "
                           "was happy."),
    "dict_sents_one": ("A sentence. I saw a dog and he was chasing a "
                       "cat. Another sentence."),
    "dict_sents_two": ("A sentence. I saw a dog.He was chasing a cat. "
                       "Another sentence."),
    "dict_sents_three": ("A sentence. I saw a dog. I was happy.He was "
                         "chasing a cat. Another sentence."),
    "dict_sents_none_surrounding": ("I saw a dog.I was happy. It was "
                                    "chasing a cat."),
    "max_mentions": ("There was a dog. He was happy. He was happy. "
                     "He chased a cat."),
    "over_max_mentions": ("There was a dog. He was happy. He was happy. "
                          "He was happy. He chased a cat."),
    "tough_compound": ("We discussed holidays. They were very hard to "
                       "find and to find"),
    "obj_adj_verb_simple": "We discussed policies. They was very hard to find",
    "obj_adj_verb_compound": ("We discussed policies. They and the other "
                              "policy were very hard to find and to find"),
    "subj_adj_verb_simple": "We saw the man. He was very glad to sing",
    "subj_adj_verb_compound": ("We saw the man. He and the other man were "
                               "very glad and glad to sing and to sing"),
    "np_conj_only_one": "A dog and a man came.  A dog and a man sang",
    "np_conj_both": "A man and a man came.  A man and a man sang",
    "coref_derivation": "They demanded an explanation. Somebody attempted it.",
    "dobj_amod": "I saw a boy. Someone had adopted him",
    "nsubj_amod": "I saw a boy. He was running",
    "dobj_amod_conj": "I saw a boy and a boy. Someone had adopted them",
    "nsubj_amod_conj": "Yesterday I saw a boy and a boy. They were running",
}


@pytest.fixture(scope="module")
def by_doc(spark):
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY)
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


def ext_words(ms, sp_label=None):
    """Set of (doc_index, extracted_word) pairs across word matches."""
    out = set()
    for m in ms:
        if sp_label is not None and m["search_phrase_label"] != sp_label:
            continue
        for w in m["word_matches"]:
            out.add((w["doc_index"], w["extracted_word"]))
    return out


# ------------------------------------------------ same-sentence pronoun

def test_simple_pronoun_coreference_same_sentence(by_doc):  # ref :54
    ms = by_doc["same_sent"]
    assert len(ms) == 1
    assert (3, "dog") in ext_words(ms)
    assert (9, "cat") in ext_words(ms)


def test_perform_coreference_resolution_false(spark):  # ref :64
    m = SparkHolmesManager(spark, perform_coreference_resolution=False)
    m.register_search_phrase("A dog chases a cat")
    m.parse_and_register_document("I saw a dog and it was chasing a cat.", "d")
    assert m.match() == []


def test_simple_pronoun_coreference_same_sentence_wrong_structure(by_doc):  # ref :72
    assert by_doc["same_sent_wrong"] == []


def test_simple_pronoun_coreference_same_sentence_plural_antecedent(by_doc):  # ref :80
    ms = by_doc["same_sent_plural"]
    assert len(ms) == 1
    assert (2, "dog") in ext_words(ms)


def test_same_sentence_conjunction_in_antecedent_both_match(by_doc):  # ref :89
    ms = by_doc["same_sent_conj_both"]
    assert len(ms) == 2
    assert {(3, "dog"), (6, "dog")} <= ext_words(ms)


def test_same_sentence_conjunction_in_antecedent_left_matches(by_doc):  # ref :101
    ms = by_doc["same_sent_conj_left"]
    assert len(ms) == 1
    assert (3, "dog") in ext_words(ms)


def test_same_sentence_conjunction_in_antecedent_right_matches(by_doc):  # ref :112
    ms = by_doc["same_sent_conj_right"]
    assert len(ms) == 1
    assert (6, "dog") in ext_words(ms)


def test_same_sentence_conjunction_pronouns_both_match(by_doc):  # ref :123
    ms = by_doc["same_sent_pron_conj"]
    assert len(ms) == 2
    assert {(4, "peter jones"), (7, "jane jones")} <= ext_words(ms)


def test_same_sentence_conjunction_lefthand_is_pronoun(by_doc):  # ref :135
    ms = by_doc["same_sent_left_pron"]
    assert len(ms) == 2
    assert {(4, "peter jones"), (10, "jane jones")} <= ext_words(ms)


def test_same_sentence_conjunction_lefthand_noun_not_match(by_doc):  # ref :159
    ms = by_doc["same_sent_left_noun_not"]
    assert len(ms) == 1
    assert (3, "jane") in ext_words(ms)


# ------------------------------------------------ diff-sentence pronoun

def test_simple_pronoun_coreference_diff_sentence(by_doc):  # ref :181
    ms = by_doc["diff_sent"]
    assert len(ms) >= 1
    assert {(6, "dog"), (8, "chase"), (3, "cat")} <= ext_words(ms)


def test_simple_pronoun_coreference_diff_sentence_wrong_structure(by_doc):  # ref :191
    assert by_doc["diff_sent_wrong"] == []


def test_simple_pronoun_coreference_diff_sentence_plural_antecedent(by_doc):  # ref :199
    ms = by_doc["diff_sent_plural"]
    assert len(ms) == 1
    assert (2, "cat") in ext_words(ms)


def test_diff_sentence_conjunction_in_antecedent_both_match(by_doc):  # ref :208
    ms = by_doc["diff_sent_conj_both"]
    assert len(ms) == 2
    assert {(3, "cat"), (6, "cat")} <= ext_words(ms)


def test_diff_sentence_conjunction_in_antecedent_left_matches(by_doc):  # ref :220
    ms = by_doc["diff_sent_conj_left"]
    assert len(ms) == 1
    assert (3, "cat") in ext_words(ms)


def test_diff_sentence_conjunction_pronouns_both_match(by_doc):  # ref :242
    ms = by_doc["diff_sent_pron_conj"]
    assert len(ms) == 2
    assert {(4, "peter jones"), (7, "jane jones")} <= ext_words(ms)


def test_diff_sentence_conjunction_lefthand_is_pronoun(by_doc):  # ref :254
    ms = by_doc["diff_sent_left_pron"]
    assert len(ms) == 2
    assert {(4, "peter jones"), (9, "jane jones")} <= ext_words(ms)


def test_diff_sentence_conjunction_lefthand_noun_not_match(by_doc):  # ref :278
    ms = by_doc["diff_sent_left_noun_not"]
    assert len(ms) == 1
    assert (4, "jane jones") in ext_words(ms)


# ------------------------------------- antecedents carrying dependencies

def test_pronoun_coreferent_has_dependency_same_sentence(by_doc):  # ref :300
    ms = by_doc["dep_same_sent"]
    assert len(ms) == 1
    assert {(3, "big"), (4, "horse")} <= ext_words(ms)


def test_plural_pronoun_coreferent_has_dependency_same_sentence(by_doc):  # ref :310
    ms = by_doc["dep_same_sent_plural"]
    assert len(ms) == 1
    assert {(2, "big"), (3, "horse")} <= ext_words(ms)


def test_noun_coreferent_has_dependency_same_sentence(by_doc):  # ref :396
    ms = by_doc["noun_dep_same_sent"]
    assert len(ms) == 1
    assert {(3, "big"), (7, "horse")} <= ext_words(ms)


def test_pronoun_coreferent_has_dependency_diff_sentence(by_doc):  # ref :426
    ms = by_doc["dep_diff_sent"]
    assert len(ms) == 1
    assert {(3, "big"), (4, "horse")} <= ext_words(ms)


def test_plural_pronoun_coreferent_has_dependency_diff_sentence(by_doc):  # ref :436
    ms = by_doc["dep_diff_sent_plural"]
    assert len(ms) == 1
    assert {(2, "big"), (3, "horse")} <= ext_words(ms)


def test_pronoun_coreferent_has_dependency_three_sentences(by_doc):  # ref :552
    ms = by_doc["three_sent"]
    assert len(ms) == 1
    assert {(13, "big"), (3, "horse")} <= ext_words(ms)


def test_noun_coreferent_in_active_verbal_governing_clause(by_doc):  # ref :602
    ms = by_doc["noun_active_verbal"]
    assert len(ms) == 1
    assert {(3, "big"), (7, "horse")} <= ext_words(ms)
    assert ms[0]["uncertain"]


def test_pronoun_coreferent_in_ambiguous_noun_or_verb_dependency(by_doc):  # ref :646
    ms = by_doc["ambiguous_univ"]
    assert len(ms) == 1
    assert (3, "university") in ext_words(ms)
    assert ms[0]["uncertain"]


# ------------------------------------------------------------ reflexives

def test_reflexive_pronoun_coreferent(by_doc):  # ref :656
    ms = by_doc["reflexive"]
    assert len(ms) == 1
    assert (1, "panther") in ext_words(ms)


def test_reflexive_pronoun_coreferents_with_conjunction_same_noun(by_doc):  # ref :664
    ms = by_doc["reflexive_conj_same"]
    assert len(ms) == 4
    assert {(1, "panther"), (4, "panther")} <= ext_words(ms)


def test_reflexive_pronoun_coreferents_with_conjunction_diff_noun(by_doc):  # ref :680
    ms = by_doc["reflexive_conj_diff"]
    assert len(ms) == 2
    assert (1, "panther") in ext_words(ms, "A panther chases a panther")
    assert (4, "leopard") in ext_words(ms, "A leopard chases a leopard")


# --------------------------------------------------- noun mention chains

def test_repeated_noun(by_doc):  # ref :702
    ms = by_doc["repeated_noun"]
    assert len(ms) >= 1
    assert (7, "dog") in ext_words(ms, "A dog chases a cat")


def test_repeated_noun_match_both_mentions(by_doc):  # ref :711
    ms = [m for m in by_doc["repeated_noun_both"]
          if m["search_phrase_label"] == "A tired dog"]
    assert len(ms) == 2
    assert {(3, "tired"), (4, "dog"), (7, "dog")} <= ext_words(ms)


def test_relative_clause(by_doc):  # ref :733
    ms = by_doc["rel_clause"]
    assert len(ms) == 2
    assert (3, "cat") in ext_words(ms, "A dog chases a cat")


def test_pronoun_coreferents_with_dependency_conjunction_diff_sentence_both_match(by_doc):  # ref :445
    ms = [m for m in by_doc["dep_conj_both"]
          if m["search_phrase_label"] == "A big horse chases a cat"]
    assert len(ms) == 2
    assert {(3, "big"), (4, "horse"), (7, "big"), (8, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_dependency_conjunction_diff_sentence_left_matches(by_doc):  # ref :460
    ms = [m for m in by_doc["dep_conj_left"]
          if m["search_phrase_label"] == "A big horse chases a cat"]
    assert len(ms) == 1
    assert {(3, "big"), (4, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_dependency_conjunction_diff_sentence_right_matches(by_doc):  # ref :472
    ms = [m for m in by_doc["dep_conj_right"]
          if m["search_phrase_label"] == "A big horse chases a cat"]
    assert len(ms) == 1
    assert {(7, "big"), (8, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_pronoun_conjunction_diff_sentence(by_doc):  # ref :484
    ms = [m for m in by_doc["pron_conj_mixed"]
          if m["search_phrase_label"] == "A big horse chases a cat"]
    assert len(ms) == 1
    assert {(3, "big"), (4, "horse")} <= ext_words(ms)


def test_adjective_verb_phrase_as_search_phrase_matches_simple(by_doc):  # ref :832
    ms = [m for m in by_doc["tough_coref"]
          if m["search_phrase_label"] == "A holiday is hard to find"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_adjective_verb_phrase_no_match_with_normal_phrase(by_doc):  # ref :841
    assert [m for m in by_doc["tough_coref_neg"]
            if m["search_phrase_label"] == "A holiday is hard to find"] == []


def test_prepositional_phrase_no_conjunction(by_doc):  # ref :901
    ms = [m for m in by_doc["prep_phrase"]
          if m["search_phrase_label"] == "Somebody writes a book about an animal"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_prepositional_phrase_with_conjunction(by_doc):  # ref :911
    ms = [m for m in by_doc["prep_phrase_conj"]
          if m["search_phrase_label"] == "Somebody writes a book about an animal"]
    assert len(ms) == 2 and all(not m["uncertain"] for m in ms)


# ------------------------------------------------------------ flag tests

def test_involves_coreference_true(by_doc):  # ref :812
    ms = by_doc["involves_true"]
    assert len(ms) >= 1 and ms[0]["involves_coreference"]


def test_involves_coreference_false(by_doc):  # ref :823
    ms = by_doc["involves_false"]
    assert len(ms) == 1 and not ms[0]["involves_coreference"]


# ------------------------------------------ round-4 ported additions

def test_same_sentence_conjunction_righthand_is_pronoun(by_doc):  # ref :147
    ms = by_doc["same_sent_right_pron"]
    assert len(ms) == 2
    assert {(8, "peter jones"), (4, "jane jones")} <= ext_words(ms)


def test_same_sentence_conjunction_righthand_noun_not_match(by_doc):  # ref :170
    ms = by_doc["same_sent_right_noun_not"]
    assert len(ms) == 1
    assert (4, "peter jones") in ext_words(ms)


def test_diff_sentence_conjunction_in_antecedent_right_matches(by_doc):  # ref :231
    ms = by_doc["diff_sent_conj_right"]
    assert len(ms) == 1
    assert (6, "cat") in ext_words(ms)


def test_diff_sentence_conjunction_righthand_is_pronoun(by_doc):  # ref :266
    ms = by_doc["diff_sent_right_pron"]
    assert len(ms) == 2
    assert {(8, "peter jones"), (4, "jane jones")} <= ext_words(ms)


def test_diff_sentence_conjunction_righthand_noun_not_match(by_doc):  # ref :289
    ms = by_doc["diff_sent_right_noun_not"]
    assert len(ms) == 1
    assert (4, "peter jones") in ext_words(ms)


def test_pronoun_coreferents_with_dependency_conjunction_same_sentence_both(by_doc):  # ref :320
    ms = by_doc["dep_conj_same_both"]
    assert len(ms) == 2
    assert {(3, "big"), (4, "horse"), (7, "big"), (8, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_pronoun_conjunction_same_sentence_both(by_doc):  # ref :358
    ms = by_doc["pron_conj_same_both"]
    assert len(ms) == 2
    assert {(3, "big"), (4, "horse"), (10, "big"), (11, "lion")} <= ext_words(ms)


def test_pronoun_coreferents_with_pronoun_conjunction_same_sentence_pronoun(by_doc):  # ref :372
    ms = by_doc["pron_conj_same_pron"]
    assert len(ms) == 1
    assert {(3, "big"), (4, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_pronoun_conjunction_same_sentence_noun(by_doc):  # ref :384
    ms = by_doc["pron_conj_same_noun"]
    assert len(ms) == 1
    assert {(10, "big"), (11, "horse")} <= ext_words(ms)


def test_plural_noun_coreferent_has_dependency_same_sentence(by_doc):  # ref :406
    ms = by_doc["plural_noun_dep_same"]
    assert len(ms) == 1
    assert {(3, "big"), (7, "horse")} <= ext_words(ms)


def test_noun_coreferents_with_pronoun_conjunction_same_sentence_noun(by_doc):  # ref :416
    ms = by_doc["noun_pron_conj_same_noun"]
    assert len(ms) == 1
    assert {(11, "big"), (12, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_pronoun_conjunction_diff_sentence_pronoun(by_doc):  # ref :498
    ms = by_doc["pron_conj_diff_pron"]
    assert len(ms) == 1
    assert {(3, "big"), (4, "horse")} <= ext_words(ms)


def test_pronoun_coreferents_with_pronoun_conjunction_diff_sentence_noun(by_doc):  # ref :510
    ms = by_doc["pron_conj_diff_noun"]
    assert len(ms) == 1
    assert {(9, "big"), (10, "horse")} <= ext_words(ms)


def test_noun_coreferent_has_dependency_diff_sentence(by_doc):  # ref :522
    ms = by_doc["noun_dep_diff"]
    assert len(ms) == 1
    assert {(3, "big"), (7, "horse")} <= ext_words(ms)


def test_plural_noun_coreferent_has_dependency_diff_sentence(by_doc):  # ref :532
    ms = by_doc["plural_noun_dep_diff"]
    assert len(ms) == 1
    assert {(3, "big"), (7, "horse")} <= ext_words(ms)


def test_noun_coreferents_with_pronoun_conjunction_diff_sentence_noun(by_doc):  # ref :542
    ms = by_doc["noun_pron_conj_diff_noun"]
    assert len(ms) == 1
    assert {(10, "big"), (11, "horse")} <= ext_words(ms)


def test_pronoun_coreferent_in_active_verbal_governing_clause(by_doc):  # ref :562
    ms = by_doc["pron_active_verbal"]
    assert len(ms) == 1
    assert (3, "dog") in ext_words(ms) and ms[0]["uncertain"]


def test_pronoun_coreferent_in_passive_verbal_governing_clause(by_doc):  # ref :572
    ms = by_doc["pron_passive_verbal"]
    assert len(ms) == 1
    assert (3, "cat") in ext_words(ms) and ms[0]["uncertain"]


def test_pronoun_coreferent_in_active_adjectival_governing_clause(by_doc):  # ref :582
    ms = by_doc["pron_active_adjectival"]
    assert len(ms) == 1
    assert (3, "dog") in ext_words(ms) and ms[0]["uncertain"]


def test_pronoun_coreferent_in_passive_adjectival_governing_clause(by_doc):  # ref :592
    ms = by_doc["pron_passive_adjectival"]
    assert len(ms) == 1
    assert (3, "cat") in ext_words(ms) and ms[0]["uncertain"]


def test_noun_coreferent_in_passive_verbal_governing_clause(by_doc):  # ref :613
    ms = by_doc["noun_passive_verbal"]
    assert len(ms) == 1
    assert {(3, "little"), (7, "cat")} <= ext_words(ms)
    assert ms[0]["uncertain"]


def test_noun_coreferent_in_active_adjectival_governing_clause(by_doc):  # ref :624
    ms = by_doc["noun_active_adjectival"]
    assert len(ms) == 1
    assert {(3, "big"), (7, "horse")} <= ext_words(ms)
    assert ms[0]["uncertain"]


def test_noun_coreferent_in_passive_adjectival_governing_clause(by_doc):  # ref :635
    ms = by_doc["noun_passive_adjectival"]
    assert len(ms) == 1
    assert {(3, "little"), (7, "cat")} <= ext_words(ms)
    assert ms[0]["uncertain"]


def test_mentions_following_structural_match(by_doc):  # ref :723
    ms = by_doc["mentions_following"]
    assert len(ms) == 1
    assert {(1, "big"), (2, "horse")} <= ext_words(ms)


# -------------------- sentences_within_document dicts (ref :742-:785)

def test_dictionary_sentences_one_sentence(by_doc):  # ref :742
    ms = by_doc["dict_sents_one"]
    assert ms[0]["sentences_within_document"] == \
        "I saw a dog and he was chasing a cat."


def test_dictionary_sentences_two_sentences(by_doc):  # ref :753
    ms = by_doc["dict_sents_two"]
    assert ms[0]["sentences_within_document"] == \
        "I saw a dog. He was chasing a cat."


def test_dictionary_sentences_three_sentences(by_doc):  # ref :764
    ms = by_doc["dict_sents_three"]
    assert ms[0]["sentences_within_document"] == \
        "I saw a dog. I was happy. He was chasing a cat."


def test_dictionary_sentences_three_sentences_none_surrounding(by_doc):  # ref :775
    ms = by_doc["dict_sents_none_surrounding"]
    assert ms[0]["sentences_within_document"] == \
        "I saw a dog. I was happy. It was chasing a cat."


# ------------------------------ mention-distance cap (ref :796-:811)

def test_maximum_mentions_difference(by_doc):  # ref :796
    assert len(by_doc["max_mentions"]) == 1


def test_over_maximum_mentions_difference(by_doc):  # ref :804
    assert by_doc["over_max_mentions"] == []


# -------------------- adjective-verb phrases with coref (ref :849-:900)

def test_adjective_verb_phrase_as_search_phrase_matches_compound(by_doc):  # ref :849
    ms = [m for m in by_doc["tough_compound"]
          if m["search_phrase_label"] == "A holiday is hard to find"]
    assert len(ms) == 2 and all(not m["uncertain"] for m in ms)


def test_objective_adjective_verb_phrase_matches_normal_search_phrase_simple(by_doc):  # ref :859
    ms = [m for m in by_doc["obj_adj_verb_simple"]
          if m["search_phrase_label"] == "Somebody finds a policy"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_objective_adjective_verb_phrase_matches_normal_search_phrase_compound(by_doc):  # ref :868
    ms = [m for m in by_doc["obj_adj_verb_compound"]
          if m["search_phrase_label"] == "Somebody finds a policy"]
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_subjective_adjective_verb_phrase_matches_normal_search_phrase_simple(by_doc):  # ref :880
    ms = [m for m in by_doc["subj_adj_verb_simple"]
          if m["search_phrase_label"] == "A man sings"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_subjective_adjective_verb_phrase_matches_normal_search_phrase_compound(by_doc):  # ref :889
    ms = [m for m in by_doc["subj_adj_verb_compound"]
          if m["search_phrase_label"] == "A man sings"]
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


# ----------------------- noun-phrase conjunction coref (ref :921-:948)

def test_coreference_of_noun_phrase_with_conjunction_only_one_matches(by_doc):  # ref :921
    ms = [m for m in by_doc["np_conj_only_one"]
          if m["search_phrase_label"] == "A man sings"]
    assert len(ms) == 1 and all(not m["uncertain"] for m in ms)


def test_coreference_of_noun_phrase_with_conjunction_both_match(by_doc):  # ref :931
    ms = [m for m in by_doc["np_conj_both"]
          if m["search_phrase_label"] == "A man sings"]
    assert len(ms) == 2 and all(not m["uncertain"] for m in ms)


def test_coreference_and_derivation(by_doc):  # ref :949
    ms = [m for m in by_doc["coref_derivation"]
          if m["search_phrase_label"] == "Somebody attempts to explain"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][1]["match_type"] == "derivation"


# ------------------------------------- amod implications (ref :970-:1005)

def test_dobj_matches_amod(by_doc):  # ref :970
    ms = by_doc["dobj_amod"]
    assert len(ms) == 1 and ms[0]["uncertain"]
    assert (3, "boy") in ext_words(ms)


def test_nsubj_matches_amod(by_doc):  # ref :980
    assert len(by_doc["nsubj_amod"]) == 1


def test_dobj_matches_amod_with_conjunction(by_doc):  # ref :986
    ms = by_doc["dobj_amod_conj"]
    assert len(ms) == 2 and all(m["uncertain"] for m in ms)


def test_nsubj_matches_amod_with_conjunction(by_doc):  # ref :996
    assert len(by_doc["nsubj_amod_conj"]) == 2
