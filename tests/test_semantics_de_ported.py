"""Ported from the reference's tests/de/test_semantics_DE.py (cited
per test as ref :line) — the German compound-subword goldens, the
-ung nominalization rules, negation scoping, predicative adjectives
and conjunction structure. Pure Python over the shared parse layer
(the reference drives de_core_news_lg + holmes extensions; this port
asserts the same observable fields of the stand-in parser).

Dependency-structure assertions are expressed over our semantic dep
list (labels nsubj/amod/... instead of the reference's sb/nk/... —
the template mapping is RELATION_TEMPLATES_DE's concern).
"""

import pytest

from holmes_extractor_spark.nlp.parser import parse_document


def subwords(word: str):
    return parse_document(word, "de")["tokens"][0]["subwords"]


# ----------------------------------------------- subword decomposition

def test_subwords_without_fugen_s():  # ref :786
    sw = subwords("Telefaxnummer.")
    assert [(s["text"], s["lemma"], s["idx"], s["char_start"])
            for s in sw] == [
        ("telefax", "telefax", 0, 0), ("nummer", "nummer", 1, 7)]


def test_subwords_with_fugen_s():  # ref :802
    sw = subwords("Widerrufsbelehrung")
    assert [(s["text"], s["lemma"], s["idx"], s["char_start"])
            for s in sw] == [
        ("widerruf", "widerruf", 0, 0), ("belehrung", "belehrung", 1, 9)]


def test_no_subwords_without_s():  # ref :818
    assert subwords("Lappalie") == []


def test_no_subwords_with_s():  # ref :822
    assert subwords("Datenschutz") == []


def test_no_subwords_because_of_extra_letter_after_valid_subwords():
    # ref :826
    assert subwords("ZahlungsverkehrX") == []


def test_subwords_word_twice_in_document():  # ref :840
    p = parse_document(
        "Widerrufsbelehrung und die widerrufsbelehrung waren interessant",
        "de")
    for i in (0, 3):
        sw = p["tokens"][i]["subwords"]
        assert [(s["text"], s["lemma"], s["char_start"]) for s in sw] == [
            ("widerruf", "widerruf", 0), ("belehrung", "belehrung", 9)]


def test_three_subwords_with_non_whitelisted_fugen_s():  # ref :871
    sw = subwords("Inhaltsverzeichnisanlage")
    assert [(s["text"], s["lemma"], s["char_start"]) for s in sw] == [
        ("inhalt", "inhalt", 0), ("verzeichnis", "verzeichnis", 7),
        ("anlage", "anlage", 18)]


def test_four_subwords_with_whitelisted_fugen_s():  # ref :894
    sw = subwords("Finanzdienstleistungsaufsicht")
    assert [(s["text"], s["lemma"]) for s in sw] == [
        ("finanz", "finanz"), ("dienst", "dienst"),
        ("leistung", "leistung"), ("aufsicht", "aufsicht")]


def test_inflected_main_word():  # ref :908
    sw = subwords("Verbraucherstreitbeilegungsgesetze")
    assert [(s["text"], s["lemma"]) for s in sw] == [
        ("verbraucher", "verbraucher"), ("streit", "streit"),
        ("beilegung", "beilegung"), ("gesetze", "gesetz")]


def test_inflected_subword_other_than_fugen_s():  # ref :922
    sw = subwords("Bundesoberbehörde")
    assert [(s["text"], s["lemma"]) for s in sw] == [
        ("bundes", "bund"), ("oberbehörde", "oberbehörde")]


def test_initial_short_word():  # ref :933
    sw = subwords("Vorversicherung")
    assert [(s["text"], s["lemma"]) for s in sw] == [
        ("vor", "vor"), ("versicherung", "versicherung")]


def test_subwords_score_too_high():  # ref :942
    assert subwords("Requalifizierung") == []


def test_final_blacklisted_subword():  # ref :947
    assert subwords("Gemütlichkeit") == []


def test_subword_rejected_because_of_bigraphs():  # ref :952
    assert subwords("Verantwortung") == []


def test_nonsense_word():  # ref :957
    sw = subwords("WiderrufsbelehrungWiderrufsrecht.")
    assert [(s["text"], s["char_start"]) for s in sw] == [
        ("widerruf", 0), ("belehrung", 9), ("widerruf", 18), ("recht", 27)]


# ------------------------------------------------ derived lemma rules

@pytest.mark.parametrize("word,derived", [
    ("Verwandlung.", "verwandeln"),    # ref :2126 (-lung after consonant)
    ("Bilanzierung.", "bilanzieren"),  # ref :2130 (-ierung)
    ("Erzählung.", "erzählen"),        # ref :2134 (-lung after vowel sound)
])
def test_derived_lemma_ung_rules(word, derived):
    t = parse_document(word, "de")["tokens"][0]
    assert t["derived_lemma"] == derived


def test_ung_blacklist():  # ref :1017 sprung/schwung keep their form
    t = parse_document("Sprung.", "de")["tokens"][0]
    # the transcribed derivation.csv wins where it has an entry
    # (sprung → springen); the point of the blacklist is that the
    # generic rule must NOT produce 'sprungen'
    assert t["derived_lemma"] != "sprungen"


# -------------------------------------------------- negation scoping

def test_negator_negation_within_clause():  # ref :104
    p = parse_document("Der Hund jagte die Katze nicht", "de")
    assert p["tokens"][2]["is_negated"]


def test_operator_negation_within_clause():  # ref :108
    p = parse_document("Kein Hund hat irgendeine Katze gejagt", "de")
    assert p["tokens"][1]["is_negated"]


def test_negator_negation_within_parent_clause():  # ref :114
    p = parse_document(
        "Er meinte nicht, dass der Hund die Katze gejagt hätte", "de")
    assert p["tokens"][9]["is_negated"]


def test_operator_negation_within_parent_clause():  # ref :120
    p = parse_document("Keiner behauptete, dass der Hund die Katze jagte",
                       "de")
    assert p["tokens"][8]["is_negated"]


def test_negator_negation_within_child_clause():  # ref :124
    p = parse_document("Der Hund jagte die Katze, die nicht glücklich war",
                       "de")
    assert not p["tokens"][2]["is_negated"]


# --------------------------------------- conjunction / sibling structure

def _deps(text):
    p = parse_document(text, "de")
    return {(d["parent"], d["child"], d["label"]) for d in p["deps"]}, p


def test_one_righthand_sibling_with_and_conjunction():  # ref :25
    _, p = _deps("Der Hund und der Löwe jagten die Katze")
    assert p["tokens"][1]["righthand_siblings"] == [4]
    assert p["tokens"][4]["righthand_siblings"] == []


def test_righthand_siblings_of_semantic_children_two():  # ref :59
    # "Der große und starke Hund kam heim": both adjectives modify the
    # noun (reference doc[4] children 1:nk; 3:nk)
    ds, _ = _deps("Der große und starke Hund kam heim")
    assert (4, 1, "amod") in ds and (4, 3, "amod") in ds


def test_semantic_children_of_righthand_siblings_two():  # ref :72
    # "Der große Hund und Löwe": the adjective distributes over both
    # conjuncts (reference doc[4] children 1:nk)
    ds, p = _deps("Der große Hund und Löwe")
    assert (2, 1, "amod") in ds and (4, 1, "amod") in ds
    assert p["tokens"][2]["righthand_siblings"] == [4]


def test_predicative_adjective():  # ref :89
    # "Der Hund war groß" → the adjective reaches the noun as a
    # modifier (reference doc[1] children 3:nk) and stays matchable
    ds, p = _deps("Der Hund war groß")
    assert (1, 3, "amod") in ds
    assert p["tokens"][3]["is_matchable"]


def test_predicative_adjective_with_conjunction():  # ref :96
    # "Der Hund und die Katze waren groß und stark" — every (noun,
    # adjective) pair is modified (reference doc[1] children
    # 2:cd; 6:nk; 8:nk and doc[4] children 6:nk; 8:nk)
    ds, _ = _deps("Der Hund und die Katze waren groß und stark")
    for noun in (1, 4):
        for adj in (6, 8):
            assert (noun, adj, "amod") in ds, (noun, adj)
