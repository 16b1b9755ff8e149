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
