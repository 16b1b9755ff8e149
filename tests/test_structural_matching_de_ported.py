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


# --------------------------------------------- round-4 ported additions
# one-manager-per-case fixture for the cases that need their own
# search-phrase sets (mirrors the reference's
# holmes_manager_with_variable_search_phrases)

def _de(spark, phrases, doc):
    m = SparkHolmesManager(spark)
    for p in phrases:
        if isinstance(p, tuple):
            m.register_search_phrase(p[0], label=p[1], lang="de")
        else:
            m.register_search_phrase(p, lang="de")
    m.parse_and_register_document(doc, "d", lang="de")
    return m.match()


JAGT = "Ein Hund jagt eine Katze"


def test_different_object(spark):  # ref :100
    assert _de(spark, [JAGT], "Der Hund jagte das Pferd") == []


def test_noun_phrase_negation(spark):  # ref :111
    ms = _de(spark, [JAGT], "Kein Hund jagte keine Katze")
    assert len(ms) == 1 and ms[0]["negated"] and not ms[0]["uncertain"]


def test_irrelevant_negation(spark):  # ref :118
    ms = _de(spark, [JAGT], "Der nicht alte Hund jagte die Katze")
    assert len(ms) == 1 and not ms[0]["negated"] and not ms[0]["uncertain"]


def test_adjective_swapping_with_conjunction(spark):  # ref :133
    ms = _de(spark, ["Der reiche Mann"], "Der schlaue und schlaue Mann")
    assert ms == []
    ms = _de(spark, ["Ein Mann ist schlau"], "Der Mann war reich und reich")
    assert ms == []


def test_conjunction_with_and(spark):  # ref :146
    ms = _de(spark, [JAGT],
             "Der Hund und der Hund jagten die Katze und eine Katze")
    assert len(ms) == 4 and all(not m["uncertain"] for m in ms)


def test_conjunction_with_or(spark):  # ref :153
    ms = _de(spark, [JAGT],
             "Der Hund oder der Hund jagten die Katze und eine Katze")
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_threeway_conjunction_with_or(spark):  # ref :160
    ms = _de(spark, [JAGT], "Der Hund, der Hund oder der Hund jagten "
                            "die Katze und eine Katze")
    assert len(ms) == 6 and all(m["uncertain"] for m in ms)


def test_active_future_and_perfect(spark):  # ref :175
    ms = _de(spark, [JAGT], "Der Hund wird die Katze jagen")
    assert len(ms) == 1 and not ms[0]["uncertain"]
    ms = _de(spark, [JAGT], "Der Hund hatte die Katze gejagt")
    assert len(ms) == 1 and not ms[0]["uncertain"]


@pytest.mark.parametrize("doc", [
    "Die Katze wird vom Hund gejagt",
    "Die Katze wird vom Hund gejagt werden",
    "Die Katze war vom Hund gejagt worden",
    "Die Katze wird vom Hund gejagt worden sein",
])
def test_passive_with_von(spark, doc):  # ref :185
    ms = _de(spark, [JAGT], doc)
    assert len(ms) == 1 and not ms[0]["uncertain"]


@pytest.mark.parametrize("doc", [
    "Die Katze wird durch den Hund gejagt",
    "Die Katze wird durch den Hund gejagt werden",
    "Die Katze war durch den Hund gejagt worden",
    "Die Katze wird durch den Hund gejagt worden sein",
])
def test_passive_with_durch(spark, doc):  # ref :203
    ms = _de(spark, [JAGT], doc)
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_modal(spark):  # ref :221
    ms = _de(spark, [JAGT], "Der Hund könnte eine Katze jagen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_relative_pronoun_nominative(spark):  # ref :233
    ms = _de(spark, [JAGT], "Der Hund, der die Katze jagte, war müde")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_relative_pronoun_nominative_inverted(spark):  # ref :239
    assert _de(spark, [JAGT],
               "Die Katze, die den Hund jagte, war müde") == []


def test_relative_pronoun_nominative_with_conjunction(spark):  # ref :244
    ms = _de(spark, [JAGT],
             "Der Hund, der die Katze und die Katze jagte, war müde")
    assert len(ms) == 2 and all(not m["uncertain"] for m in ms)


def test_relative_pronoun_nominative_with_passive(spark):  # ref :251
    ms = _de(spark, [JAGT],
             "Die Katze, die vom Hund gejagt wurde, war müde")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_relative_pronoun_accusative(spark):  # ref :257
    ms = _de(spark, ["Ein Hund jagt einen Bären"],
             "Der Bär, den der Hund jagte, war müde")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_separable_verb(spark):  # ref :263
    ms = _de(spark, [("Ein Student geht aus", "excursion")],
             "Die Studenten werden ausgehen")
    assert len(ms) == 1 and not ms[0]["uncertain"]
    assert ms[0]["search_phrase_label"] == "excursion"


def test_von_phrase_matches_genitive_phrase(spark):  # ref :270
    ms = _de(spark, ["Der Abschluss einer Versicherung"],
             "Der Abschluss von einer Versicherung")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_genitive_phrase_matches_von_phrase(spark):  # ref :283
    ms = _de(spark, ["Die Kündigung von einer Versicherung"],
             "Die Kündigung einer Versicherung")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_genitive_phrase_matches_von_phrase_with_coordination(spark):  # ref :289
    ms = _de(spark, ["Die Kündigung von einer Versicherung"],
             "Die Kündigung einer Versicherung und einer Versicherung")
    assert len(ms) == 2 and all(not m["uncertain"] for m in ms)


def test_subjective_zu_clause_complement_with_conjunction_active(spark):  # ref :296
    ms = _de(spark, [JAGT], "Der Hund und der Löwe entschlossen sich, "
                            "eine Katze und eine Maus zu jagen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_subjective_zu_clause_complement_simple_passive(spark):  # ref :321
    ms = _de(spark, [JAGT], "Die Katze entschied, vom Hund gejagt zu werden")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_passive_search_phrase_with_active_searched_sentence(spark):  # ref :333
    ms = _de(spark, ["Eine Katze wurde von einem Hund gejagt"],
             "Der Hund wird die Katze jagen")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_passive_search_phrase_with_active_conjunction(spark):  # ref :342
    ms = _de(spark, ["Eine Katze wurde von einem Hund gejagt"],
             "Der Hund und der Hund haben die Katze und die Katze gejagt")
    assert len(ms) == 4 and all(not m["uncertain"] for m in ms)


def test_passive_search_phrase_with_passive_conjunction(spark):  # ref :352
    ms = _de(spark, ["Eine Katze wurde von einem Hund gejagt"],
             "Die Katze und die Katze werden von einem Hund und einem "
             "Hund gejagt werden")
    assert len(ms) == 4 and all(not m["uncertain"] for m in ms)


def test_passive_search_phrase_with_negated_searched_sentence(spark):  # ref :362
    ms = _de(spark, ["Eine Katze wurde von einem Hund gejagt"],
             "Der Hund jagte die Katze nie")
    assert len(ms) == 1 and not ms[0]["uncertain"] and ms[0]["negated"]


def test_question_search_phrase_with_active_searched_sentence(spark):  # ref :372
    ms = _de(spark, ["Welche Hunde fressen Knochen?"],
             "Der Hund wird den Knochen fressen")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_question_search_phrase_with_active_conjunction(spark):  # ref :381
    ms = _de(spark, ["Welche Hunde fressen Knochen?"],
             "Der Hund und der Hund haben einen Knochen und einen "
             "Knochen gefressen")
    assert len(ms) == 4 and all(not m["uncertain"] for m in ms)


def test_question_search_phrase_with_passive_conjunction(spark):  # ref :391
    ms = _de(spark, ["Welche Hunde fressen Knochen?"],
             "Der Knochen und der Knochen werden von einem Hund und "
             "einem Hund gefressen werden")
    assert len(ms) == 4 and all(not m["uncertain"] for m in ms)


def test_question_search_phrase_with_negated_searched_sentence(spark):  # ref :401
    ms = _de(spark, ["Welche Hunde fressen Knochen?"],
             "Der Hund fraß den Knochen nie")
    assert len(ms) == 1 and not ms[0]["uncertain"] and ms[0]["negated"]


def test_original_search_phrase_root_not_matchable(spark):  # ref :411
    ms = _de(spark, ["Wer war traurig?"], "Der Mann war sehr traurig.")
    assert len(ms) == 1


def test_non_grammatical_auxiliary(spark):  # ref :416
    ms = _de(spark, ["Das Fahrzeug hat einen Fehler"],
             "Das Fahrzeug hat einen Fehler.")
    assert len(ms) == 1


def test_entitynoun_as_root_node(spark):  # ref :421
    ms = _de(spark, ["Ein ENTITYNOUN"],
             "Hunde, Katzen, Löwen und Elefanten")
    assert len(ms) == 4


def test_entitynoun_as_non_root_node(spark):  # ref :429
    ms = _de(spark, ["Ich sah ein ENTITYNOUN"],
             "Ich sah einen Hund und eine Katze")
    assert len(ms) == 2


def test_involves_coreference_false_de(spark):  # ref :454
    ms = _de(spark, [JAGT], "Ein Hund jagte eine Katze.")
    assert len(ms) == 1 and not ms[0]["involves_coreference"]
    assert not ms[0]["word_matches"][0]["involves_coreference"]


def test_matching_additional_preposition_dependency_on_verb(spark):  # ref :449
    # our fixture registers ONE phrase (the reference registers three
    # overlapping für-phrases and expects 3 matches)
    ms = _de(spark, ["Jemand braucht eine Versicherung für fünf Jahre"],
             "Der Mitarbeiter braucht eine Versicherung für die "
             "nächsten fünf Jahre")
    assert len(ms) == 1


# --------------------------------------------- round-5 ported additions
# (hyphen-compound normalization, predicate-adjective zu-infinitives,
# prepositional-phrase search phrases, ENTITY guards)

def test_von_genitive_coordination(spark):  # ref :276
    ms = _de(spark, ["Der Abschluss einer Versicherung"],
             "Der Abschluss und der Abschluss von einer Versicherung "
             "und einer Versicherung")
    assert len(ms) == 4 and all(not m["uncertain"] for m in ms)


def test_adjective_complement_conjunction_active(spark):  # ref :302
    ms = _de(spark, [JAGT],
             "Der Hund war darüber besorgt, eine Katze und eine Maus "
             "zu jagen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_passive_governing_zu_clause(spark):  # ref :309
    ms = _de(spark, [JAGT],
             "Dem Hund und dem Löwen wurde vorgeschlagen, eine Katze "
             "und eine Maus zu jagen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_verb_complement_simple_passive(spark):  # ref :315
    ms = _de(spark, [JAGT],
             "Die Katze dachte darüber nach, von einem Hund gejagt zu "
             "werden")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_um_zu_clause_conjunction_passive(spark):  # ref :327
    ms = _de(spark, [JAGT],
             "Die Katze benutzte den Elefant und die Maus, um vom Hund "
             "und Löwen gejagt zu werden")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_empty_string_no_entitymisc(spark):  # ref :464
    ms = _de(spark, ["ENTITYMISC"],
             """
             Hier wird in einem Satz etwas besprochen.
             Und hier wird in einem zweiten Satz etwas anderes besprochen.
             """)
    assert ms == []


def test_capital_entity_not_entity_token(spark):  # ref :477
    assert _de(spark, ["ENTITY"], "Richard Hudson") == []
    ms = _de(spark, ["ENTITY"],
             "Wir haben eine Entity und eine zweite ENTITY besprochen.")
    assert len(ms) == 2


def test_adjective_verb_phrase_simple(spark):  # ref :488
    ms = _de(spark, ["Ein Urlaub ist schwer zu buchen"],
             "Der Urlaub war sehr schwer zu buchen")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_adjective_verb_phrase_no_match_normal(spark):  # ref :494
    assert _de(spark, ["Ein Urlaub ist schwer zu buchen"],
               "Der Urlaub wurde gebucht") == []


def test_adjective_verb_phrase_compound(spark):  # ref :499
    ms = _de(spark, ["Ein Urlaub ist schwer zu buchen"],
             "Der Urlaub und der Urlaub waren sehr schwer und schwer "
             "zu buchen und zu buchen")
    assert len(ms) == 8 and all(not m["uncertain"] for m in ms)


def test_objective_adj_verb_separate_zu_simple(spark):  # ref :506
    ms = _de(spark, ["Jemand findet eine Versicherung"],
             "Die Versicherung war sehr schwer zu finden")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_objective_adj_verb_separate_zu_compound(spark):  # ref :512
    ms = _de(spark, ["Jemand findet eine Versicherung"],
             "Die Versicherung und die Versicherung waren sehr schwer "
             "und schwer zu finden und zu finden")
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_objective_adj_verb_integrated_zu_simple(spark):  # ref :519
    ms = _de(spark, ["Jemand schließt eine Versicherung ab"],
             "Die Versicherung war sehr schwer abzuschließen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_objective_adj_verb_integrated_zu_compound(spark):  # ref :525
    ms = _de(spark, ["Jemand schließt eine Versicherung ab"],
             "Die Versicherung und die Versicherung waren sehr schwer "
             "und schwer abzuschließen und abzuschließen")
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_subjective_adj_verb_separate_zu_simple(spark):  # ref :532
    ms = _de(spark, ["Ein Mann singt"],
             "Der Mann war sehr froh zu singen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_subjective_adj_verb_separate_zu_compound(spark):  # ref :538
    ms = _de(spark, ["Ein Mann singt"],
             "Der Mann und der Mann waren sehr froh zu singen und zu "
             "singen")
    assert len(ms) == 4 and all(m["uncertain"] for m in ms)


def test_subjective_adj_verb_integrated_zu_simple(spark):  # ref :545
    ms = _de(spark, ["Ein Mann geht aus"],
             "Der Mann war sehr froh auszugehen")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_subjective_adj_verb_integrated_zu_compound(spark):  # ref :551
    ms = _de(spark, ["Ein Mann geht aus"],
             "Der Mann und der Mann waren sehr froh auszugehen")
    assert len(ms) == 2 and all(m["uncertain"] for m in ms)


def test_prep_phrase_on_noun(spark):  # ref :568
    ms = _de(spark, ["Eine Party in den Bergen"],
             "Eine Party in den Bergen")
    assert len(ms) == 1


def test_prep_phrase_on_noun_conjunction(spark):  # ref :573
    ms = _de(spark, ["Eine Party in den Bergen"],
             "Eine Party in den Bergen und den Bergen")
    assert len(ms) == 2


def test_prep_phrase_on_verb(spark):  # ref :578
    ms = _de(spark, ["Jemand wandert in den Bergen"],
             "Mein Freund wandert in den Bergen")
    assert len(ms) == 1


def test_prep_phrase_on_verb_conjunction(spark):  # ref :583
    ms = _de(spark, ["Jemand wandert in den Bergen"],
             "Mein Freund wandert in den Bergen und den Bergen")
    assert len(ms) == 2


def test_moposs_before_governing_verb(spark):  # ref :588
    ms = _de(spark, ["Jemand eröffnet ein Konto für ein Kind"],
             "Richard Hudson möchte ein Konto für sein Kind eröffnen")
    assert len(ms) == 1


HYPHEN_PHRASES = [
    "Ein großes Wort-Mit-Bindestrich",
    "Ein kleines Wortmitbindestrich",
    "Ein großes Wort-Ohne-Bindestrich",
    "Ein kleines Wortohnebindestrich",
]


@pytest.mark.parametrize("doc", [
    "Ein großes Wort-Mit-Bindestrich",       # ref :997
    "Ein großes Wortmitbindestrich",         # ref :1002
    "Ein kleines Wort-Mit-Bindestrich",      # ref :1007
    "Ein kleines Wortmitbindestrich",        # ref :1012
    "Ein großes Wort-Ohne-Bindestrich",      # ref :1017
    "Ein großes Wortohnebindestrich",        # ref :1022
    "Ein kleines Wort-Ohne-Bindestrich",     # ref :1027
    "Ein kleines Wortohnebindestrich",       # ref :1032
])
def test_hyphenation_adjective(spark, doc):
    ms = _de(spark, HYPHEN_PHRASES, doc)
    assert len(ms) == 1


@pytest.mark.parametrize("phrase,doc", [
    ("Einfach-Wort-Mit-Bindestrich", "Einfachwortmitbindestrich"),  # :1037
    ("Einfachwortohnebindestrich", "Einfach-Wort-Ohne-Bindestrich"),  # :1042
    ("Wort-Mit-Bindestrich-Nicht-In-Ontologie",
     "Wortmitbindestrichnichtinontologie"),                          # :1047
    ("Wortohnebindestrichnichtinontologie",
     "Wort-Ohne-Bindestrich-Nicht-In-Ontologie"),                    # :1052
])
def test_hyphenation_single_word(spark, phrase, doc):
    ms = _de(spark, [phrase], doc)
    assert len(ms) == 1


def test_recursion_problem_solved(spark):  # ref :1103
    ms = _de(spark, ["Jemand wohnt in einem ENTITYLOC"],
             "Ich wohne seit 2010 in Paris")
    assert len(ms) == 1


# ------------------- round-5 ported additions (refs :167-:1108)

def test_generic_pronoun_with_auxiliary(spark):  # ref :167
    ms = _de(spark, ["Jemand hat einen Berg gesehen"],
             "Ein Berg wurde gesehen")
    assert len(ms) == 1


def test_generic_pronoun_with_modal(spark):  # ref :171
    ms = _de(spark, ["Jemand soll einen Fluss sehen"],
             "Ein Fluss wurde gesehen")
    assert len(ms) == 1


def test_tricky_passive(spark):  # ref :227
    ms = _de(spark, ["Jemand hat einen Berg gesehen"],
             "Warum der Berg gesehen wurde, ist unklar")
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_separable_verb_in_main_and_dependent_clauses(spark):  # ref :444
    ms = _de(spark, ["Jemand schließt eine Versicherung ab"],
             "Der Mitarbeiter hatte vor, eine Versicherung abzuschließen.")
    assert len(ms) == 1


def test_uncertain_subword_match_with_or_conjunction(spark):  # ref :954
    ms = _de(spark, ["Extraktion der Information"],
             "Informationsinteressen oder -extraktion")
    assert len(ms) == 1 and ms[0]["uncertain"]


def test_derivation_matching_with_subwords(spark):  # ref :992
    ms = _de(spark, ["Knochenmark wird extrahiert"],
             "Knochenmarkextraktion")
    assert len(ms) == 1


def test_matching_across_non_reported_subword(spark):  # ref :1072
    # 'Messerleininformation' splits messer+information — the
    # diminutive 'lein' is consumed but never reported (reference
    # non_recorded_subword_list, de language_specific_rules.py:328)
    ms = _de(spark, ["Information eines Messers"],
             "Messerleininformation")
    assert len(ms) == 1


def test_ontology_update_problem_solved(spark):  # ref :1108
    # benötigen ≡ brauchen in the DE test ontology
    # (reference tests/de/test_ontology.owl:107-111)
    m = SparkHolmesManager(
        spark, ontology=[("benötigen", "equivalentClass", "brauchen")])
    m.register_search_phrase("Jemand benötigt ein Auto", lang="de")
    m.parse_and_register_document("Jemand braucht ein Auto", "d", lang="de")
    assert len(m.match()) == 1


# ------- embedding gates (refs :558-:1098; deterministic DE vectors
# stand in for de_core_news_lg, same relative geometry)

DE_VECTORS = {
    "hund": [1.0, 0.0, 0.0],
    "katze": [0.8, 0.6, 0.0],        # cos(hund, katze) = 0.8
    "blau": [0.0, 1.0, 0.0],
    "grün": [0.0, 0.8, 0.6],         # cos(blau, grün) = 0.8
    "könig": [0.0, 0.0, 1.0],
    "prinz": [0.6, 0.0, 0.8],        # cos(könig, prinz) = 0.8
    "erholung": [0.6, 0.8, 0.0],
    # kur ≈ erholung by vector — but 'Kur' has only 3 chars, below the
    # DE minimum_embedding_match_word_length of 4
    # (de language_specific_rules.py:1579), so the pair NEVER
    # embedding-matches
    "kur": [0.6, 0.8, 0.0],
    # identical vectors — but VERB pos is outside
    # permissible_embedding_pos (de language_specific_rules.py:1575)
    "herabfallen": [0.5, 0.5, 0.7071],
    "hervorkommen": [0.5, 0.5, 0.7071],
}


def _de_emb(spark, phrases, doc):
    # mirrors the reference's holmes_manager_with_embeddings
    # (test_structural_matching_DE.py:55-60): overall 0.7, root-word
    # embedding matching on, coreference off
    m = SparkHolmesManager(spark, ontology=[], vectors=DE_VECTORS,
                           overall_similarity_threshold=0.7,
                           embedding_based_matching_on_root_words=True,
                           perform_coreference_resolution=False)
    for p in phrases:
        m.register_search_phrase(p, lang="de")
    m.parse_and_register_document(doc, "d", lang="de")
    return m.match()


def test_german_embeddings(spark):  # ref :558
    ms = _de_emb(spark, ["Ein Mann sieht einen großen Hund"],
                 "Der Mann sah eine große Katze")
    assert len(ms) == 1
    wm = {w["sp_word"]: w for w in ms[0]["word_matches"]}
    assert wm["hund"]["match_type"] == "embedding"


def test_german_embeddings_inflected_adjective(spark):  # ref :563
    ms = _de_emb(spark, ["Der Himmel ist grün"],
                 "Ich wohne im blauen Himmel")
    assert len(ms) == 1
    wm = {w["sp_word"]: w for w in ms[0]["word_matches"]}
    assert wm["grün"]["match_type"] == "embedding"


def test_embedding_match_on_root_subword(spark):  # ref :960
    ms = _de_emb(spark, ["Der König einer Stadt"], "Stadtprinz")
    assert len(ms) == 1
    doc_words = sorted(w["doc_word"] for w in ms[0]["word_matches"])
    assert doc_words == ["prinz", "stadt"]


def test_embedding_match_on_non_root_subword(spark):  # ref :967
    ms = _de_emb(spark, ["Die Abdankung eines Königs"],
                 "Die Prinzenabdankung")
    assert len(ms) == 1
    doc_words = sorted(w["doc_word"] for w in ms[0]["word_matches"])
    assert doc_words == ["abdankung", "prinz"]


def test_no_embedding_match_word_too_short(spark):  # ref :1077
    # kur ≈ erholung by vector, but 'Kur' < 4 chars: only the direct
    # SP matches
    ms = _de_emb(spark, ["Erholung", "Jemand geht auf eine Kur"],
                 "Sie ging auf eine Erholung")
    assert len(ms) == 1
    assert ms[0]["search_phrase_label"] == "Erholung"


def test_no_embedding_match_word_too_short_control(spark):  # ref :1083
    ms = _de_emb(spark, ["Erholung", "Jemand geht auf eine Kur"],
                 "Sie ging auf eine Kur")
    assert len(ms) == 1
    assert ms[0]["search_phrase_label"] == "Jemand geht auf eine Kur"


def test_no_embedding_wrong_pos(spark):  # ref :1088
    # identical vectors, but VERB is not a permissible embedding pos
    assert _de_emb(spark, ["herabfallen"], "hervorkommen") == []


def test_no_embedding_subword_too_short(spark):  # ref :1093
    # the subword 'kur' inside Kurinteresse is below the 4-char DE
    # minimum — subword permission gates on lemma length
    # (reference parsing.py:2880-2881)
    assert _de_emb(spark, ["Erholung"], "Kurinteresse") == []


def test_no_embedding_search_phrase_word_too_short(spark):  # ref :1098
    ms = _de_emb(spark, ["Jemand geht auf eine Kur"],
                 "Jemand geht auf eine Kur")
    assert len(ms) == 1


# ----------------------------------------------------------------------
# round-5 batch 3: tenses as matches, adjective-swap conjunctions,
# prepositional phrases at both governors (reference
# tests/de/test_structural_matching_DE.py :125-186, :454-463, :568-587)
# ----------------------------------------------------------------------

R5_SEARCH_PHRASES = [
    "Ein Hund jagt eine Katze",
    "Der reiche Mann",
    "Ein Mann ist schlau",
    "Eine Party in den Bergen",
    "Jemand wandert in den Bergen",
]

R5_DOCS = {
    "fut": "Der Hund wird die Katze jagen",
    "plup": "Der Hund hatte die Katze gejagt",
    "adjconj_attr": "Der schlaue und schlaue Mann",
    "adjconj_pred": "Der Mann war reich und reich",
    "ppnoun": "Eine Party in den Bergen",
    "ppnoun_conj": "Eine Party in den Bergen und den Bergen",
    "ppverb": "Mein Freund wandert in den Bergen",
    "ppverb_conj": "Mein Freund wandert in den Bergen und den Bergen",
    "nocoref": "Ein Hund jagte eine Katze.",
}


@pytest.fixture(scope="module")
def r5_by_doc(spark):
    m = SparkHolmesManager(spark)
    for sp in R5_SEARCH_PHRASES:
        m.register_search_phrase(sp, lang="de")
    for label, text in R5_DOCS.items():
        m.parse_and_register_document(text, label, lang="de")
    grouped: dict[str, list[dict]] = {k: [] for k in R5_DOCS}
    for match in m.match():
        grouped[match["document"]].append(match)
    return grouped


def test_active_future(r5_by_doc):  # ref :175
    ms = r5_by_doc["fut"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_active_pluperfect_match(r5_by_doc):  # ref :180
    ms = r5_by_doc["plup"]
    assert len(ms) == 1 and not ms[0]["uncertain"]


def test_adjective_swapping_with_conjunction_attr(r5_by_doc):  # ref :133
    ms = r5_by_doc["adjconj_attr"]
    assert len(ms) == 2 and not any(mm["uncertain"] for mm in ms)


def test_adjective_swapping_with_conjunction_pred(r5_by_doc):  # ref :140
    ms = r5_by_doc["adjconj_pred"]
    assert len(ms) == 2 and not any(mm["uncertain"] for mm in ms)


def test_prepositional_phrase_dependent_on_noun_no_conjunction(r5_by_doc):
    # ref :568
    assert len(r5_by_doc["ppnoun"]) == 1


def test_prepositional_phrase_dependent_on_noun_with_conjunction(r5_by_doc):
    # ref :573
    assert len(r5_by_doc["ppnoun_conj"]) == 2


def test_prepositional_phrase_dependent_on_verb_no_conjunction(r5_by_doc):
    # ref :578
    assert len(r5_by_doc["ppverb"]) == 1


def test_prepositional_phrase_dependent_on_verb_with_conjunction(r5_by_doc):
    # ref :583
    assert len(r5_by_doc["ppverb_conj"]) == 2


def test_involves_coreference_false(r5_by_doc):  # ref :454
    ms = r5_by_doc["nocoref"]
    assert len(ms) == 1
    assert not ms[0]["involves_coreference"]
    assert not ms[0]["word_matches"][0]["involves_coreference"]
