"""DE structural-matching parity suite, transcribed from the
reference's tests/de/test_structural_matching_DE.py (cited per test as
ref :line). Same one-job pattern as the EN ported suite.
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

SEARCH_PHRASES = [
    "Ein Hund jagt eine Katze",
    "Ein Mann ist schlau",
    "Der reiche Mann",
    "Die Frau gibt dem Mann das Buch",
]

DOCS = {
    "direct": "Der Hund jagte die Katze",
    "sub_neg": ("Es wurde nie behauptet, dass ein Hund eine Katze "
                "gejagt hatte."),
    "inverted": "Die Katze jagte den Hund",
    "passive": "Die Katze wurde vom Hund gejagt",
    "neg": "Der Hund jagte die Katze nicht",
    "adj_pred": "Der Mann war reich",
    "adj_attr": "Der schlaue Mann",
    "conj_subj": "Der Hund und der Hund jagten die Katze",
    "conj_obj": "Der Hund jagte die Katze und die Katze",
    "double_obj": "Die Frau gab dem Mann das Buch",
}


@pytest.fixture(scope="module")
def by_doc(spark):
    m = SparkHolmesManager(spark)
    for sp in SEARCH_PHRASES:
        m.register_search_phrase(sp, lang="de")
    for label, text in DOCS.items():
        m.parse_and_register_document(text, label, lang="de")
    grouped: dict[str, list[dict]] = {k: [] for k in DOCS}
    for match in m.match():
        grouped[match["document"]].append(match)
    return grouped


def test_direct_matching(by_doc):  # ref :83
    ms = by_doc["direct"]
    assert len(ms) == 1 and not ms[0]["negated"] and not ms[0]["uncertain"]
    assert ms[0]["search_phrase_label"] == "Ein Hund jagt eine Katze"


def test_matching_with_negation_in_subordinate_clause(by_doc):  # ref :90
    ms = by_doc["sub_neg"]
    assert len(ms) == 1 and ms[0]["negated"] and not ms[0]["uncertain"]


def test_nouns_inverted(by_doc):  # ref :97
    assert by_doc["inverted"] == []


def test_passive(by_doc):
    ms = by_doc["passive"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_negation(by_doc):
    ms = by_doc["neg"]
    assert len(ms) == 1 and ms[0]["negated"]


def test_adjective_swapping_predicative_doc(by_doc):
    # doc "Der Mann war reich" matches attributive phrase
    # "Der reiche Mann" (ref adjective-swap cases)
    assert len(by_doc["adj_pred"]) == 1


def test_adjective_swapping_attributive_doc(by_doc):
    # doc "Der schlaue Mann" matches predicative phrase
    # "Ein Mann ist schlau"
    assert len(by_doc["adj_attr"]) == 1


def test_subject_conjunction(by_doc):
    assert len(by_doc["conj_subj"]) == 2


def test_object_conjunction(by_doc):
    assert len(by_doc["conj_obj"]) == 2


def test_double_object_dative(by_doc):
    ms = by_doc["double_obj"]
    assert len(ms) == 1
