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


# ======================================================================
# round-5 batch: tenses, modals, relatives, separable verbs, von/durch
# phrases and zu-clause complements (reference test_semantics_DE.py
# :134-595).  Reference sb/oa/og/da map to our nsubj/dobj/pobjo/dative;
# under a werden-passive oa→nsubjpass and the von/durch agent→pobjb;
# (U) = uncertain flag on the dep.
# ======================================================================

def _dl(text):
    p = parse_document(text, "de")
    return (sorted((d["parent"], d["child"], d["label"], d["uncertain"])
                   for d in p["deps"]), p)


def _has(ds, *wanted):
    missing = [w for w in wanted if w not in ds]
    assert not missing, f"missing {missing} in {ds}"


def test_dass_clause():  # ref :134
    ds, _ = _dl("Er ist zuversichtlich, dass der Hund die Katze jagen wird")
    _has(ds, (9, 6, "nsubj", False), (9, 8, "dobj", False))


def test_active_perfect():  # ref :140
    ds, p = _dl("Der Hund hat die Katze gejagt")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "dobj", False))


def test_active_pluperfect():  # ref :147
    ds, _ = _dl("Der Hund hatte die Katze gejagt")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "dobj", False))


def test_active_future():  # ref :154
    ds, _ = _dl("Der Hund wird die Katze jagen")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "dobj", False))


def test_active_future_perfect():  # ref :161
    ds, p = _dl("Der Hund wird die Katze gejagt haben")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "dobj", False))
    assert not p["tokens"][2]["is_matchable"]   # wird
    assert not p["tokens"][6]["is_matchable"]   # haben


def test_von_passive_perfect():  # ref :172
    ds, _ = _dl("Die Katze ist vom Hund gejagt worden")
    _has(ds, (5, 1, "nsubjpass", False), (5, 4, "pobjb", False))


def test_von_passive_pluperfect():  # ref :181
    ds, _ = _dl("Die Katze war vom Hund gejagt worden")
    _has(ds, (5, 1, "nsubjpass", False), (5, 4, "pobjb", False))


def test_von_passive_future():  # ref :190
    ds, _ = _dl("Die Katze wird vom Hund gejagt werden")
    _has(ds, (5, 1, "nsubjpass", False), (5, 4, "pobjb", False))


def test_von_passive_future_perfect():  # ref :199
    ds, p = _dl("Die Katze wird vom Hund gejagt worden sein")
    _has(ds, (5, 1, "nsubjpass", False), (5, 4, "pobjb", False))
    assert not p["tokens"][6]["is_matchable"]   # worden
    assert not p["tokens"][7]["is_matchable"]   # sein


def test_complex_tense_noun_conjunction_active():  # ref :210
    ds, _ = _dl("Der Hund und der Löwe haben die Katze und die Maus gejagt")
    _has(ds, (11, 1, "nsubj", False), (11, 4, "nsubj", False),
         (11, 7, "dobj", False), (11, 10, "dobj", False))


def test_complex_tense_noun_conjunction_passive():  # ref :216
    ds, _ = _dl("Die Katze und die Maus werden vom Hund und Löwen "
                "gejagt werden")
    _has(ds, (10, 1, "nsubjpass", False), (10, 4, "nsubjpass", False),
         (10, 7, "pobjb", False), (10, 9, "pobjb", False))


def test_complex_tense_verb_conjunction_active_1():  # ref :222
    ds, _ = _dl("Der Hund wird die Katze gejagt und gefressen haben")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "dobj", False),
         (7, 1, "nsubj", False), (7, 4, "dobj", False))


def test_complex_tense_verb_conjunction_active_2():  # ref :230 (OVS)
    ds, _ = _dl("Die Katze wird der Hund gejagt und gefressen haben")
    _has(ds, (5, 1, "dobj", False), (5, 4, "nsubj", False),
         (7, 1, "dobj", False), (7, 4, "nsubj", False))


def test_complex_tense_verb_conjunction_active_3():  # ref :238 (OVS)
    ds, _ = _dl("Den Hund wird die Katze gejagt und gefressen haben")
    _has(ds, (5, 1, "dobj", False), (5, 4, "nsubj", False),
         (7, 1, "dobj", False), (7, 4, "nsubj", False))


def test_complex_tense_verb_conjunction_passive():  # ref :246
    ds, _ = _dl("Die Katze wird vom Hund gejagt und gefressen werden")
    _has(ds, (5, 1, "nsubjpass", False), (5, 4, "pobjb", False),
         (7, 1, "nsubjpass", False), (7, 4, "pobjb", False))


def test_conjunction_everywhere_active_1():  # ref :254
    ds, _ = _dl("Der Hund und der Löwe werden die Katze und die Maus "
                "jagen und fressen")
    for v in (11, 13):
        _has(ds, (v, 1, "nsubj", False), (v, 4, "nsubj", False),
             (v, 7, "dobj", False), (v, 10, "dobj", False))


def test_conjunction_everywhere_active_2():  # ref :262 (OVS)
    ds, _ = _dl("Die Katze und die Maus werden der Hund und der Löwe "
                "jagen und fressen")
    for v in (11, 13):
        _has(ds, (v, 1, "dobj", False), (v, 4, "dobj", False),
             (v, 7, "nsubj", False), (v, 10, "nsubj", False))


def test_conjunction_everywhere_active_3():  # ref :270 (OVS)
    ds, _ = _dl("Den Hund und den Löwen werden die Katze und die Maus "
                "jagen und fressen")
    for v in (11, 13):
        _has(ds, (v, 1, "dobj", False), (v, 4, "dobj", False),
             (v, 7, "nsubj", False), (v, 10, "nsubj", False))


def test_conjunction_everywhere_passive():  # ref :278
    ds, _ = _dl("Die Katze und die Maus werden durch den Hund und den "
                "Löwen gejagt und gefressen werden")
    for v in (12, 14):
        _has(ds, (v, 1, "nsubjpass", False), (v, 4, "nsubjpass", False),
             (v, 8, "pobjb", False), (v, 11, "pobjb", False))


def test_simple_modal_verb_active():  # ref :286
    ds, p = _dl("Der Hund soll die Katze jagen")
    _has(ds, (5, 1, "nsubj", True), (5, 4, "dobj", True))
    assert not p["tokens"][2]["is_matchable"]


def test_simple_modal_verb_passive():  # ref :294
    ds, _ = _dl("Die Katze kann vom Hund gejagt werden")
    _has(ds, (5, 1, "nsubjpass", True), (5, 4, "pobjb", True))


def test_negated_modal_verb():  # ref :301
    ds, p = _dl("Der Hund soll die Katze nicht jagen")
    _has(ds, (6, 1, "nsubj", True), (6, 4, "dobj", True))
    assert p["tokens"][6]["is_negated"]


def test_modal_verb_with_conjunction():  # ref :307
    ds, _ = _dl("Die Katze und die Maus können den Hund und den Löwen "
                "jagen")
    _has(ds, (11, 1, "nsubj", True), (11, 4, "nsubj", True),
         (11, 7, "dobj", True), (11, 10, "dobj", True))


def test_relative_pronoun_nominative():  # ref :315
    ds, _ = _dl("Der Hund, der die Katze jagte, war müde")
    _has(ds, (6, 1, "nsubj", False), (6, 5, "dobj", False))


def test_relative_pronoun_nominative_with_conjunction():  # ref :320
    ds, _ = _dl("Der Hund, der die Katze und die Maus jagte, war müde")
    _has(ds, (9, 1, "nsubj", False), (9, 5, "dobj", False),
         (9, 8, "dobj", False))


def test_relative_pronoun_nominative_with_passive():  # ref :326
    ds, _ = _dl("Die Katze, die vom Hund gejagt wurde, war müde")
    _has(ds, (6, 1, "nsubjpass", False), (6, 5, "pobjb", False))


def test_relative_pronoun_accusative():  # ref :331
    ds, _ = _dl("Der Bär, den der Hund jagte, war müde")
    _has(ds, (6, 1, "dobj", False), (6, 5, "nsubj", False))


def test_relative_pronoun_conjunction_everywhere_active():  # ref :336
    ds, _ = _dl("Der Hund, der Elefant und der Bär, die die Katze und "
                "die Maus gejagt und gefressen haben, waren müde")
    for v in (15, 17):
        _has(ds, (v, 1, "nsubj", True), (v, 4, "nsubj", True),
             (v, 7, "nsubj", False), (v, 11, "dobj", False),
             (v, 14, "dobj", False))


def test_separable_verb():  # ref :352
    ds, p = _dl("Er nimmt die Situation auf")
    assert p["tokens"][1]["lemma"] == "aufnehmen"
    _has(ds, (1, 0, "nsubj", False), (1, 3, "dobj", False))


def test_separable_verb_in_main_clause_but_infinitive_in_dependent_clause():
    # ref :358
    _, p = _dl("Der Mitarbeiter hatte vor, dies zu tun")
    assert p["tokens"][7]["lemma"] == "tun"
    assert p["tokens"][2]["lemma"] == "vorhaben"


def test_separable_verb_in_main_clause_but_separable_infinitive_in_dependent_clause():
    # ref :362
    _, p = _dl("Der Mitarbeiter hatte vor, eine Versicherung "
               "abzuschließen")
    assert p["tokens"][7]["lemma"] == "abschließen"


def test_apprart():  # ref :367
    ds, p = _dl("Er geht zur Party")
    assert p["tokens"][2]["lemma"] == "zu"
    _has(ds, (1, 0, "nsubj", False), (1, 3, "pobjp", False))


def test_von_phrase_1():  # ref :373
    ds, _ = _dl("Der Abschluss von einer Versicherung")
    _has(ds, (1, 4, "pobjo", False))


def test_von_phrase_with_conjunction():  # ref :378
    ds, _ = _dl("Der Abschluss und Aufrechterhaltung von einer "
                "Versicherung und einem Vertrag")
    _has(ds, (1, 6, "pobjo", False), (1, 9, "pobjo", False),
         (3, 6, "pobjo", False), (3, 9, "pobjo", False))


def test_von_and_durch_phrase():  # ref :386
    ds, _ = _dl("Der Abschluss von einer Versicherung durch einen Makler")
    _has(ds, (1, 4, "pobjo", False))


def test_genitive_and_durch_phrase():  # ref :393
    ds, _ = _dl("Der Abschluss einer Versicherung durch einen Makler")
    _has(ds, (1, 3, "pobjo", False))


def test_subjective_zu_clause_complement_simple_active():  # ref :399
    ds, _ = _dl("Der Hund überlegte, eine Katze zu jagen")
    _has(ds, (7, 1, "nsubj", True), (7, 5, "dobj", True))


def test_subjective_zu_clause_complement_with_conjunction_active():
    # ref :404
    ds, _ = _dl("Der Hund und der Löwe entschlossen sich, eine Katze "
                "und eine Maus zu jagen")
    _has(ds, (14, 1, "nsubj", True), (14, 4, "nsubj", True),
         (14, 9, "dobj", True), (14, 12, "dobj", True))


def test_adjective_complement_simple_active():  # ref :416
    ds, _ = _dl("Der Hund war darüber froh, eine Katze zu jagen")
    _has(ds, (9, 1, "nsubj", True), (9, 7, "dobj", True))


def test_adjective_complement_with_conjunction_active():  # ref :421
    ds, _ = _dl("Der Hund war darüber froh, eine Katze und eine Maus "
                "zu jagen")
    _has(ds, (12, 1, "nsubj", True), (12, 7, "dobj", True),
         (12, 10, "dobj", True))


def test_objective_zu_clause_complement_simple_active():  # ref :427
    ds, _ = _dl("Der Löwe bat den Hund, eine Katze zu jagen")
    _has(ds, (9, 4, "nsubj", True), (9, 7, "dobj", True))


def test_objective_zu_clause_complement_with_conjunction_active():
    # ref :432
    ds, _ = _dl("Der Elefant schlug dem Hund und dem Löwen vor, eine "
                "Katze und eine Maus zu jagen")
    _has(ds, (16, 4, "nsubj", True), (16, 7, "nsubj", True),
         (16, 11, "dobj", True), (16, 14, "dobj", True))


def test_passive_governing_clause_zu_clause_complement_simple_active():
    # ref :438
    ds, _ = _dl("Der Hund wurde gebeten, eine Katze zu jagen")
    _has(ds, (8, 1, "nsubj", True), (8, 6, "dobj", True))


def test_um_zu_clause_complement_simple_active():  # ref :450
    ds, _ = _dl("Der Löwe benutzte den Hund, um eine Katze zu jagen")
    _has(ds, (10, 1, "nsubj", True), (10, 8, "dobj", True))


def test_um_zu_clause_complement_with_conjunction_active():  # ref :456
    ds, _ = _dl("Der Elefant benutzte den Hund und den Löwen, um eine "
                "Katze und eine Maus zu jagen")
    _has(ds, (16, 1, "nsubj", True), (16, 11, "dobj", True),
         (16, 14, "dobj", True))


def test_verb_complement_simple_passive():  # ref :462
    ds, _ = _dl("Die Katze dachte darüber nach, von einem Hund gejagt "
                "zu werden")
    _has(ds, (9, 1, "nsubjpass", True), (9, 8, "pobjb", True))


def test_adjective_complement_simple_passive():  # ref :488
    ds, _ = _dl("Die Katze war darüber froh, von einem Hund gejagt zu "
                "werden")
    _has(ds, (9, 1, "nsubjpass", True), (9, 8, "pobjb", True))


def test_adjective_complement_with_conjunction_passive():  # ref :494
    ds, _ = _dl("Die Katze war darüber froh, von einem Hund und einem "
                "Löwen gejagt zu werden")
    _has(ds, (12, 1, "nsubjpass", True), (12, 8, "pobjb", True),
         (12, 11, "pobjb", True))


def test_subjective_zu_clause_complement_simple_passive():  # ref :500
    ds, _ = _dl("Die Katze entschied, vom Hund gejagt zu werden")
    _has(ds, (6, 1, "nsubjpass", True), (6, 5, "pobjb", True))


def test_subjective_zu_clause_complement_with_conjunction_passive():
    # ref :505
    ds, _ = _dl("Die Katze und die Maus entschlossen sich, vom Hund "
                "und Löwen gejagt zu werden")
    _has(ds, (12, 1, "nsubjpass", True), (12, 4, "nsubjpass", True),
         (12, 9, "pobjb", True), (12, 11, "pobjb", True))


def test_objective_zu_clause_complement_simple_passive():  # ref :511
    ds, _ = _dl("Der Löwe bat die Katze, vom Hund gejagt zu werden")
    _has(ds, (8, 4, "nsubjpass", True), (8, 7, "pobjb", True))


def test_objective_zu_clause_complement_with_conjunction_passive():
    # ref :517
    ds, _ = _dl("Der Elefant schlug der Katze und der Maus vor, vom "
                "Hund und Löwen gejagt zu werden")
    _has(ds, (14, 4, "nsubjpass", True), (14, 7, "nsubjpass", True),
         (14, 11, "pobjb", True), (14, 13, "pobjb", True))


def test_passive_governing_clause_zu_clause_complement_simple_passive():
    # ref :523
    ds, _ = _dl("Die Katze wurde gebeten, von einem Hund gejagt zu "
                "werden")
    _has(ds, (8, 1, "nsubjpass", True), (8, 7, "pobjb", True))


def test_passive_governing_clause_zu_clause_complement_with_conjunction_passive():
    # ref :529
    ds, _ = _dl("Der Katze und der Maus wurde vorgeschlagen, von einem "
                "Löwen gejagt zu werden")
    _has(ds, (11, 1, "nsubjpass", True), (11, 4, "nsubjpass", True),
         (11, 10, "pobjb", True))


def test_um_zu_clause_complement_simple_passive():  # ref :535
    ds, _ = _dl("Der Löwe benutzte die Katze, um vom Hund gejagt zu "
                "werden")
    _has(ds, (9, 1, "nsubjpass", True), (9, 8, "pobjb", True))


def test_um_zu_clause_complement_with_conjunction_passive():  # ref :541
    ds, _ = _dl("Der Elefant benutzte die Katze und die Maus, um vom "
                "Hund und Löwen gejagt zu werden")
    _has(ds, (14, 1, "nsubjpass", True), (14, 11, "pobjb", True),
         (14, 13, "pobjb", True))


def test_verb_complement_with_conjunction_of_dependent_verb():  # ref :547
    ds, _ = _dl("Die Katze und die Maus haben entschieden, zu singen "
                "und zu schreien")
    _has(ds, (9, 1, "nsubj", True), (9, 4, "nsubj", True),
         (12, 1, "nsubj", True), (12, 4, "nsubj", True))


def test_objective_zu_clause_complement_with_conjunction_of_dependent_verb():
    # ref :563
    ds, _ = _dl("Die Katze und die Maus baten den Löwen, zu singen und "
                "zu schreien")
    _has(ds, (10, 7, "nsubj", True), (13, 7, "nsubj", True))


def test_um_zu_clause_complement_with_conjunction_of_dependent_verb():
    # ref :571
    ds, _ = _dl("Die Katze und die Maus benutzen den Löwen, um zu "
                "singen und zu schreien")
    _has(ds, (11, 1, "nsubj", True), (11, 4, "nsubj", True),
         (14, 1, "nsubj", True), (14, 4, "nsubj", True))


def test_von_preposition_in_von_clause_unmatchable():  # ref :603
    _, p = _dl("Die Kündigung von einer Versicherung")
    assert not p["tokens"][2]["is_matchable"]


def test_adjective_complement_proper_name():  # ref :626
    ds, _ = _dl("Richard war froh, es zu verstehen.")
    _has(ds, (6, 0, "nsubj", True))


# ----------------------------------------------------------------------
# round-5 batch 2: ungrammatical-case tolerance, moposs, relative
# prepositional phrases, verb conjunction further right, non-recorded
# subwords and initial question words (reference test_semantics_DE.py
# :631-786, :2145-2210)
# ----------------------------------------------------------------------

def test_adjective_verb_clause_with_zu_objective_zu_separate_simple():
    # ref :644
    ds, _ = _dl("Richard war schwer zu erreichen.")
    _has(ds, (4, 0, "arg", True))  # reference '0:arg(U); 2:mo; 3:pm'


def test_ungrammatical_two_nominatives():  # ref :683
    ds, _ = _dl("Der Hund jagt der Hund")
    _has(ds, (2, 1, "nsubj", False), (2, 4, "dobj", False))


def test_ungrammatical_two_nominatives_with_noun_phrase_conjunction():
    # ref :688
    ds, _ = _dl("Der Hund und der Hund jagen der Hund und der Hund")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "nsubj", False),
         (5, 7, "dobj", False), (5, 10, "dobj", False))


def test_ungrammatical_two_accusatives():  # ref :703
    ds, _ = _dl("Den Hund jagt den Hund")
    _has(ds, (2, 1, "nsubj", False), (2, 4, "dobj", False))


def test_ungrammatical_two_accusatives_with_noun_phrase_conjunction():
    # ref :708
    ds, _ = _dl("Den Hund und den Hund jagen den Hund und den Hund")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "nsubj", False),
         (5, 7, "dobj", False), (5, 10, "dobj", False))


def test_subjects_in_main_and_subordinate_clauses():  # ref :722
    ds, _ = _dl("Ich glaube, dass eine Pflanze wächst")
    _has(ds, (1, 0, "nsubj", False), (6, 5, "nsubj", False))


def test_moposs_before_governing_verb():  # ref :727
    ds, _ = _dl("Ich möchte ein Konto für mein Kind eröffnen")
    _has(ds, (7, 0, "nsubj", True), (7, 3, "dobj", True),
         (7, 6, "pobjp", True))


def test_hat_vor_clause():  # ref :732
    ds, p = _dl("Ich habe vor, ein Konto zu eröffnen")
    _has(ds, (7, 0, "nsubj", True), (7, 5, "dobj", True))
    assert p["tokens"][1]["lemma"] == "vorhaben"


def test_simple_relative_prepositional_phrase():  # ref :737
    ds, _ = _dl("Der Tisch, von welchem wir aßen.")
    _has(ds, (6, 1, "pobjo", False), (6, 5, "nsubj", False))


def test_conjunction_relative_prepositional_phrase():  # ref :744
    ds, _ = _dl("Der Tisch und der Stuhl, von denen du und ich aßen "
                "und tranken.")
    for v in (11, 13):
        _has(ds, (v, 1, "pobjo", True), (v, 4, "pobjo", False),
             (v, 8, "nsubj", False), (v, 10, "nsubj", False))


def test_conjunction_with_subject_object_and_verb_further_right():
    # ref :757
    ds, _ = _dl("Der Mann aß das Fleisch und trank.")
    _has(ds, (2, 1, "nsubj", False), (2, 4, "dobj", False),
         (6, 1, "nsubj", False))
    assert (6, 4, "dobj", False) not in ds


def test_conjunction_with_subject_object_modal_and_verb_further_right():
    # ref :762
    ds, _ = _dl("Der Mann hat das Fleisch gegessen und getrunken.")
    _has(ds, (5, 1, "nsubj", False), (5, 4, "dobj", False),
         (7, 1, "nsubj", False), (7, 4, "dobj", False))


def test_von_phrase_2():  # ref :781
    ds, _ = _dl("Die Verwandlung von einem Mädchen")
    _has(ds, (1, 4, "pobjo", False))


def test_parent_token_indexes():  # ref :774
    ds, _ = _dl("Häuser im Dorf.")
    _has(ds, (0, 2, "pobjp", False))


def test_non_recorded_subword_alone():  # ref :2145
    assert subwords("Messerlein.") == []


def test_non_recorded_subword_at_end():  # ref :2149
    sw = subwords("Informationsmesserlein.")
    assert [s["lemma"] for s in sw] == ["information", "messer"]


def test_non_recorded_subword_in_middle():  # ref :2155
    sw = subwords("Messerleininformation.")
    assert [s["lemma"] for s in sw] == ["messer", "information"]


def test_non_recorded_subword_at_beginning():  # ref :2161
    sw = subwords("Leinmesserinformation.")
    assert [s["lemma"] for s in sw] == ["messer", "information"]


def test_question_word_initial():  # ref :2181
    p = parse_document("wem hast Du geholfen?", "de")
    assert p["tokens"][0]["is_initial_question_word"]


def test_question_word_after_preposition():  # ref :2185
    p = parse_document("Mit wem hast Du gesprochen?", "de")
    assert p["tokens"][1]["is_initial_question_word"]


def test_question_word_in_complex_phrase():  # ref :2189
    p = parse_document("Auf der Basis welcher Information bist Du "
                       "gekommen?", "de")
    assert p["tokens"][3]["is_initial_question_word"]


def test_question_word_control_1():  # ref :2193
    p = parse_document(". Wem hast Du geholfen?", "de")
    assert not any(t["is_initial_question_word"] for t in p["tokens"])


def test_question_word_control_2():  # ref :2198
    p = parse_document("Du bist gekommen wegen wem?", "de")
    assert not any(t["is_initial_question_word"] for t in p["tokens"])


def test_subject_predicate_with_question_word():  # ref :2203
    ds, _ = _dl("Was ist das?")
    _has(ds, (1, 0, "nsubj", False))
