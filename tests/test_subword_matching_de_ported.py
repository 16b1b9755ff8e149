"""DE subword-granular structural matching, transcribed from the
reference's tests/de/test_structural_matching_DE.py:593-1010 (cited per
test as ref :line). Word matches carry the reference match-dict keys
document_token_index / document_subword_index /
document_subword_containing_token_index (reference
structural_matching.py:849-877).

One Spark job per fixture: all documents register once and the grouped
match() output is asserted per document label.
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

EX = "Extraktion der Information"
MA = "Maßnahmen der Beschaffung der Information"
JAGT = "Ein Hund jagt eine Katze"
GROSS = "Das große Interesse"
KM = "Knochenmark wird extrahiert"

DOCS = {
    "katzenjagd": "Die Katzenjagd durch den Hund",
    "katzenjagd_conj_subwords": "Die Katzen- und Katzenjagd durch den Hund",
    "katzenjagd_conj_hunde": "Die Katzenjagd durch den Hund und den Hund",
    "hundenjagd_durch": "Die Hundenjagd durch die Katze",
    "hundenjagd_von": "Die Hundenjagd von der Katze und der Katze",
    "grossinteresse": "Das Großinteresse",
    "zwei_gleich": "Informationsextraktion",
    "zwei_anfang": "Informationsextraktionsmaßnahmen",
    "zwei_ende": "Maßnahmeninformationsextraktion",
    "zwei_verschieden": "Maßnahmenextraktion der Maßnahmeninformation",
    "conj2_first": "Informationsentnahme und -extraktion",
    "conj3_first": "Informationsentnahme, -extraktion und -freude",
    "conj2_last": "Informations- und Entnahmeextraktion",
    "conj3_last": "Freude-, Informations- und Entnahmeextraktion",
    "conj_mitte": ("Freudeverwaltungs--, -informationsextraktions- "
                   "und -entnahmeverwaltung"),
    "drei_initial": ("Informationsbeschaffungsmaßnahmen waren das, "
                     "worüber wir sprachen."),
    "drei_spaeter": "Wir redeten über Informationsbeschaffungsmaßnahmen.",
    "drei_anfang": "Informationsbeschaffungsmaßnahmenextraktion.",
    "drei_ende": "Extraktionsinformationsbeschaffungsmaßnahmen.",
    "split_zwei_eins": "Maßnahmen der Informationsbeschaffung",
    "split_zwei_eins_mehr": ("Extraktionsmaßnahmen der "
                             "Extraktionsinformationsbeschaffung"),
    "split_eins_zwei": "Beschaffungsmaßnahmen der Information",
    "split_eins_zwei_mehr": ("Extraktionsbeschaffungsmaßnahmen der "
                             "Extraktionsinformation"),
    "drei_conj2_zwei_eins": "Informationsbeschaffungsprobleme und -maßnahmen",
    "drei_conj3_zwei_eins": ("Informationsbeschaffungsprobleme, -maßnahmen "
                             "und -interessen"),
    "drei_conj2_eins_zwei": "Informationsprobleme und -beschaffungsmaßnahmen",
    "drei_conj3_eins_zwei": ("Informationsprobleme, -interessen und "
                             "-beschaffungsmaßnahmen"),
    "drei_conj2_last_eins_zwei": ("Informations- und "
                                  "Interessenbeschaffungsmaßnahmen"),
    "drei_conj3_last_eins_zwei": ("Informations-, Problem- und "
                                  "Interessenbeschaffungsmaßnahmen"),
    "drei_conj2_last_zwei_eins": ("Informationsbeschaffungs- und "
                                  "Interessenmaßnahmen"),
    "drei_conj3_gemischt": ("Informationsinteressen, -beschaffungs- und "
                            "Problemmaßnahmen"),
    "drei_conj_mit_anderen": ("Informationsinteressen, -interessen-, "
                              "-beschaffungs-, -interessen- und "
                              "Problemmaßnahmen"),
    "oder_conj": "Informationsinteressen oder -extraktion",
    "km_derivation": "Knochenmarkextraktion",
}


@pytest.fixture(scope="module")
def by_doc(spark):
    m = SparkHolmesManager(spark)
    for p in (EX, MA, JAGT, GROSS, KM):
        m.register_search_phrase(p, lang="de")
    for label, text in DOCS.items():
        m.parse_and_register_document(text, label, lang="de")
    grouped: dict[str, list[dict]] = {k: [] for k in DOCS}
    for match in m.match():
        grouped[match["document"]].append(match)
    return grouped


def _wm(ms, i, j):
    """(document_token_index, document_subword_index,
    document_subword_containing_token_index) of word match j in
    match i."""
    w = ms[i]["word_matches"][j]
    return (w["document_token_index"], w["document_subword_index"],
            w["document_subword_containing_token_index"])


def test_objective_deverbal_subword_phrase_with_durch_no_conjunction(
        by_doc):  # ref :593
    assert len(by_doc["katzenjagd"]) == 1


def test_objective_deverbal_subword_conjunction_within_subwords(
        by_doc):  # ref :599
    assert len(by_doc["katzenjagd_conj_subwords"]) == 2


def test_objective_deverbal_subword_phrase_with_durch(by_doc):  # ref :605
    assert len(by_doc["katzenjagd_conj_hunde"]) == 2


def test_subjective_deverbal_subword_phrase_with_durch(by_doc):  # ref :610
    assert by_doc["hundenjagd_durch"] == []


def test_subjective_deverbal_subword_phrase_with_von(by_doc):  # ref :615
    assert len(by_doc["hundenjagd_von"]) == 2


def test_adjectival_subword(by_doc):  # ref :620
    assert len(by_doc["grossinteresse"]) == 1


def test_two_subwords_filling_same_word(by_doc):  # ref :625
    ms = by_doc["zwei_gleich"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0)[1] == 1 and _wm(ms, 0, 1)[1] == 0


def test_two_subwords_at_beginning_of_same_word(by_doc):  # ref :632
    ms = by_doc["zwei_anfang"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0)[1] == 1 and _wm(ms, 0, 1)[1] == 0


def test_two_subwords_at_end_of_same_word(by_doc):  # ref :639
    ms = by_doc["zwei_ende"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0)[1] == 2 and _wm(ms, 0, 1)[1] == 1


def test_two_subwords_in_different_words(by_doc):  # ref :646
    ms = by_doc["zwei_verschieden"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0)[:2] == (0, 1)
    assert _wm(ms, 0, 1)[:2] == (2, 1)


def test_two_subwords_two_word_conjunction_first_element(by_doc):  # ref :654
    ms = by_doc["conj2_first"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 1, 2)
    assert _wm(ms, 0, 1) == (2, 0, 0)


def test_two_subwords_three_word_conjunction_first_element(
        by_doc):  # ref :666
    ms = by_doc["conj3_first"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 1, 2)
    assert _wm(ms, 0, 1) == (2, 0, 0)


def test_two_subwords_two_word_conjunction_last_element(by_doc):  # ref :680
    ms = by_doc["conj2_last"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (0, 1, 2)
    assert _wm(ms, 0, 1) == (0, 0, 0)


def test_two_subwords_three_word_conjunction_last_element(
        by_doc):  # ref :693
    ms = by_doc["conj3_last"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 1, 4)
    assert _wm(ms, 0, 1) == (2, 0, 2)


def test_two_subwords_in_middle_element(by_doc):  # ref :707
    ms = by_doc["conj_mitte"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 1, 2)
    assert _wm(ms, 0, 1) == (2, 0, 2)


def test_three_subwords_filling_same_word_initial_position(
        by_doc):  # ref :720
    ms = by_doc["drei_initial"]
    assert len(ms) == 1
    assert [_wm(ms, 0, j)[1] for j in range(3)] == [2, 1, 0]


def test_three_subwords_filling_same_word_later_position(
        by_doc):  # ref :728
    ms = by_doc["drei_spaeter"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0)[:2] == (3, 2)
    assert _wm(ms, 0, 1)[:2] == (3, 1)
    assert _wm(ms, 0, 2)[:2] == (3, 0)


def test_three_subwords_filling_same_word_beginning_of_word(
        by_doc):  # ref :739
    ms = by_doc["drei_anfang"]
    assert len(ms) == 1
    assert [_wm(ms, 0, j)[1] for j in range(3)] == [2, 1, 0]


def test_three_subwords_filling_same_word_end_of_word(by_doc):  # ref :747
    ms = by_doc["drei_ende"]
    assert len(ms) == 1
    assert [_wm(ms, 0, j)[1] for j in range(3)] == [3, 2, 1]


def test_three_subwords_split_two_one(by_doc):  # ref :755
    ms = by_doc["split_zwei_eins"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0)[:2] == (0, None)
    assert _wm(ms, 0, 1) == (2, 1, 2)
    assert _wm(ms, 0, 2) == (2, 0, 2)


def test_three_subwords_split_two_one_with_more_subwords(
        by_doc):  # ref :768
    ms = by_doc["split_zwei_eins_mehr"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (0, 1, 0)
    assert _wm(ms, 0, 1) == (2, 2, 2)
    assert _wm(ms, 0, 2) == (2, 1, 2)


def test_three_subwords_split_one_two(by_doc):  # ref :786
    assert by_doc["split_eins_zwei"] == []


def test_three_subwords_split_one_two_with_more_subwords(
        by_doc):  # ref :791
    assert by_doc["split_eins_zwei_mehr"] == []


def test_three_subwords_two_word_conjunction_first_elements_two_one(
        by_doc):  # ref :796
    ms = by_doc["drei_conj2_zwei_eins"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 2, 2)
    assert _wm(ms, 0, 1) == (2, 1, 0)
    assert _wm(ms, 0, 2) == (2, 0, 0)


def test_three_subwords_three_word_conjunction_first_elements_two_one(
        by_doc):  # ref :812
    ms = by_doc["drei_conj3_zwei_eins"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 2, 2)
    assert _wm(ms, 0, 1) == (2, 1, 0)
    assert _wm(ms, 0, 2) == (2, 0, 0)


def test_three_subwords_two_word_conjunction_first_elements_one_two(
        by_doc):  # ref :829
    ms = by_doc["drei_conj2_eins_zwei"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 2, 2)
    assert _wm(ms, 0, 1) == (2, 1, 2)
    assert _wm(ms, 0, 2) == (2, 0, 0)


def test_three_subwords_three_word_conjunction_first_elements_one_two(
        by_doc):  # ref :845
    ms = by_doc["drei_conj3_eins_zwei"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (4, 2, 4)
    assert _wm(ms, 0, 1) == (4, 1, 4)
    assert _wm(ms, 0, 2) == (4, 0, 0)


def test_three_subwords_two_word_conjunction_last_elements_one_two(
        by_doc):  # ref :862
    ms = by_doc["drei_conj2_last_eins_zwei"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (0, 2, 2)
    assert _wm(ms, 0, 1) == (0, 1, 2)
    assert _wm(ms, 0, 2) == (0, 0, 0)


def test_three_subwords_three_word_conjunction_last_elements_one_two(
        by_doc):  # ref :878
    ms = by_doc["drei_conj3_last_eins_zwei"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (0, 2, 4)
    assert ms[0]["word_matches"][0]["document_word"] == "maßnahme"
    assert _wm(ms, 0, 1) == (0, 1, 4)
    assert ms[0]["word_matches"][1]["document_word"] == "beschaffung"
    assert _wm(ms, 0, 2) == (0, 0, 0)
    assert ms[0]["word_matches"][2]["document_word"] == "information"


def test_three_subwords_two_word_conjunction_last_elements_two_one(
        by_doc):  # ref :898
    ms = by_doc["drei_conj2_last_zwei_eins"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (0, 2, 2)
    assert _wm(ms, 0, 1) == (0, 1, 0)
    assert _wm(ms, 0, 2) == (0, 0, 0)


def test_three_subwords_three_word_conjunction(by_doc):  # ref :914
    ms = by_doc["drei_conj3_gemischt"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (2, 2, 4)
    assert _wm(ms, 0, 1) == (2, 1, 2)
    assert _wm(ms, 0, 2) == (2, 0, 0)


def test_three_subwords_three_word_conjunction_with_other_words(
        by_doc):  # ref :930
    ms = by_doc["drei_conj_mit_anderen"]
    assert len(ms) == 1
    assert _wm(ms, 0, 0) == (4, 2, 8)
    assert _wm(ms, 0, 1) == (4, 1, 4)
    assert _wm(ms, 0, 2) == (4, 0, 0)


def test_uncertain_subword_match_with_or_conjunction(by_doc):  # ref :950
    ms = by_doc["oder_conj"]
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_derivation_matching_with_subwords(by_doc):  # ref :988
    assert len(by_doc["km_derivation"]) == 1


# --- ontology-with-subwords block (reference tests/de/test_ontology.owl
# subwordtests: Komputerlinguistik ≡ Linguistik ≡ Sprachwissenschaft)

SUBWORD_ONTOLOGY = [
    ("komputerlinguistik", "equivalentClass", "linguistik"),
    ("komputerlinguistik", "equivalentClass", "sprachwissenschaft"),
    ("linguistik", "equivalentClass", "sprachwissenschaft"),
    ("jagd", "equivalentClass", "jagen"),
    ("monitor", "subClassOf", "hardware"),
]

ONTO_DOCS = {
    "literatur": "Die Literaturlinguistik",
    "sprachwissenschaft": "Die Sprachwissenschaft",
    "komputer": "Die Komputerlinguistik",
}


@pytest.fixture(scope="module")
def by_doc_onto(spark):
    m = SparkHolmesManager(spark, ontology=SUBWORD_ONTOLOGY)
    m.register_search_phrase("Die Linguistik", lang="de")
    for label, text in ONTO_DOCS.items():
        m.parse_and_register_document(text, label, lang="de")
    grouped: dict[str, list[dict]] = {k: [] for k in ONTO_DOCS}
    for match in m.match():
        grouped[match["document"]].append(match)
    return grouped


def test_ontology_matching_with_subwords(by_doc_onto):  # ref :971
    assert len(by_doc_onto["literatur"]) == 1


def test_ontology_matching_with_whole_word_containing_subwords(
        by_doc_onto):  # ref :977
    assert len(by_doc_onto["sprachwissenschaft"]) == 1


def test_ontology_matching_with_whole_word_and_subword(
        by_doc_onto):  # ref :982
    assert len(by_doc_onto["komputer"]) == 2
