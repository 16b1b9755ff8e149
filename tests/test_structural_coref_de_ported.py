"""DE coreference structural-matching parity suite, transcribed from
the reference's tests/de/test_structural_matching_with_coreference_DE.py
(cited per test as ref :line). Same one-job pattern as the EN coref
ported suite: the fixture mirrors the reference module setup (ref
:6-30) — one manager with the reference's search phrases, coreference
resolution ON; all documents registered up front, matched in ONE
distributed job, grouped per document label.

NOT ported (2 of 37): the 'Peters GmbH' extracted-word pair
(ref :345-361) — their assertions encode spaCy-DE tokenization of
'Peters GmbH' and a coreferee noun-chain between 'GmbH' and 'Firma'
that the deterministic parser stand-in does not model.

Two adjective assertions note where the reference extracts the spaCy
lemma ('groß') while the deterministic stand-in reports the matched
surface form ('großes') — same token, same match type.
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

# ref :10-24
SEARCH_PHRASES = [
    "Ein Hund jagt eine Katze",
    "Ein großes Pferd jagt eine Katze",
    "Ein Tiger jagt eine kleine Katze",
    "Ein großer Löwe jagt eine Katze",
    "Ein ENTITYPER braucht Versicherung",
    "Jemand versucht, zu erklären",
    "ein müder Hund",
    "Ein Gepard jagt einen Gepard",
    "Ein Leopard jagt einen Leopard",
    "Ein Urlaub ist schwer zu finden",
    "Jemand liebt einen Elefanten",
    "Jemand folgt einem Elefanten der Vergangenheit",
    "Ein verkaufter Urlaub",
    "Eine große Firma hat Probleme",
]

DOCS = {
    "same_sent": "Ich sah einen Hund, und er jagte eine Katze.",
    "same_sent_wrong": ("Ich sah einen Hund und er wurde von einer "
                        "Katze gejagt."),
    "same_sent_plural": "Ich sah Hunde und sie jagten eine Katze.",
    "same_sent_conj_both": ("Ich sah einen Hund und einen Hund, und "
                            "die jagten eine Katze."),
    "same_sent_conj_left": ("Ich sah einen Hund und ein Pferd, und sie "
                            "jagten eine Katze."),
    "same_sent_conj_right": ("Ich sah ein Pferd und einen Hund, und "
                             "die jagten eine Katze."),
    "same_sent_pron_conj": ("Ich redete mit Peter Müller und Jana "
                            "Müller, während sie und er Versicherung "
                            "brauchten."),
    "same_sent_left_pron": ("Ich redete mit Peter Müller, während er "
                            "und Jana Müller Versicherung brauchten."),
    # ref :119 keeps the reference's literal text (initial "I")
    "same_sent_right_pron": ("I redete mit Jana Müller, während Peter "
                             "Müller und sie Versicherung brauchten."),
    "same_sent_right_noun_not": ("Ich redete mit Peter Müller, während "
                                 "er und ein Pferd Versicherung "
                                 "brauchten."),
    "diff_sent": "Ich sah eine Katze. Ein Hund jagte sie.",
    "diff_sent_wrong": ("Ich sah einen Hund. Er wurde durch eine Katze "
                        "gejagt."),
    "diff_sent_plural": ("Ich sah Katzen. Sie wurden durch einen Hund "
                         "gejagt."),
    "diff_sent_conj_both": ("Ich sah eine Katze und eine Katze. Ein "
                            "Hund hat sie gejagt."),
    "diff_sent_conj_left": ("Ich sah eine Katze und ein Pferd. Ein "
                            "Hund hat sie gejagt."),
    "diff_sent_conj_right": ("Ich sah ein Pferd und eine Katze. Ein "
                             "Hund hat sie gejagt"),
    "pron_dep_same": ("Ich sah ein großes Pferd, und dieses jagte "
                      "eine Katze."),
    "pron_dep_conj_both": ("Ich sah ein großes Pferd und ein großes "
                           "Pferd, und sie jagten eine Katze."),
    "noun_dep_same": ("Ich sah ein großes Pferd, und das Pferd jagte "
                      "eine Katze."),
    "pron_dep_three_sent": ("Ich sah ein Pferd. Es jagte eine Katze. "
                            "Es war groß"),
    "reflexive": "Der Gepard jagte sich",
    "reflexive_conj_same": "Der Gepard und der Gepard jagten sich",
    "reflexive_conj_diff": "Der Gepard und der Leopard jagten sich",
    "repeated_noun": ("Wir sahen einen großes Hund. Der Hund jagte "
                      "eine Katze"),
    "repeated_noun_both": ("Wir sahen einen müden Hund. Der Hund "
                           "jagte einen Esel"),
    "mentions_following": ("Ein großes Pferd jagte eine Katze. Das "
                           "Pferd war glücklich."),
    "adj_verb_phrase": ("Wir besprachen einen Urlaub. Er war sehr "
                        "schwer zu finden."),
    "coref_derivation": ("Ich wollte eine Erklärung. Der Nachbar hat "
                         "sie versucht."),
    "subword_simple": "Es gab einen Riesenelefanten. Alle liebten ihn.",
    "subword_compound": ("Es gab einen Riesenelefanten und einen "
                         "zweiten Riesenelefanten. Alle liebten sie."),
    "subword_prev_simple": ("Es gab einen Vergangenheitselefanten. "
                            "Alle folgten ihm."),
    "subword_prev_compound": ("Es gab einen Vergangenheitselefanten "
                              "und einen zweiten "
                              "Vergangenheitselefanten. Alle folgten "
                              "ihnen."),
    "subword_rev_simple": ("Es gab einen Versicherungsurlaub. Jemand "
                           "verkaufte ihn."),
    "subword_rev_compound": ("Es gab einen Versicherungsurlaub und "
                             "einen Versicherungsurlaub. Jemand "
                             "verkaufte sie."),
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
    for v in grouped.values():
        v.sort(key=lambda mm: mm["index_within_document"])
    return grouped


def ext_words(ms, sp_label=None):
    out = set()
    for m in ms:
        if sp_label is not None and m["search_phrase_label"] != sp_label:
            continue
        for w in m["word_matches"]:
            out.add((w["doc_index"], w["extracted_word"]))
    return out


# ------------------------------------------------ same-sentence pronoun

def test_simple_pronoun_coreference_same_sentence(by_doc):  # ref :43
    ms = by_doc["same_sent"]
    assert len(ms) == 1
    assert {(3, "hund"), (7, "jagen"), (9, "katze")} <= ext_words(ms)


def test_perform_coreference_resolution_false(spark):  # ref :52
    m = SparkHolmesManager(spark, perform_coreference_resolution=False)
    m.register_search_phrase("Ein Hund jagt eine Katze", lang="de")
    m.parse_and_register_document(
        "Ich sah einen Hund, und er jagte eine Katze.", "d", lang="de")
    assert m.match() == []


def test_same_sentence_wrong_structure(by_doc):  # ref :59
    assert by_doc["same_sent_wrong"] == []


def test_same_sentence_plural_antecedent(by_doc):  # ref :66
    ms = by_doc["same_sent_plural"]
    assert len(ms) == 1
    assert (2, "hund") in ext_words(ms)


def test_same_sentence_conjunction_in_antecedent_both_match(by_doc):  # ref :74
    ms = by_doc["same_sent_conj_both"]
    assert len(ms) == 2
    assert {(3, "hund"), (6, "hund")} <= ext_words(ms)


def test_same_sentence_conjunction_in_antecedent_left_matches(by_doc):  # ref :83
    ms = by_doc["same_sent_conj_left"]
    assert len(ms) == 1
    assert (3, "hund") in ext_words(ms)


def test_same_sentence_conjunction_in_antecedent_right_matches(by_doc):  # ref :91
    ms = by_doc["same_sent_conj_right"]
    assert len(ms) == 1
    assert (6, "hund") in ext_words(ms)


def test_same_sentence_conjunction_pronouns_both_match(by_doc):  # ref :99
    ms = by_doc["same_sent_pron_conj"]
    assert len(ms) == 2
    assert {(4, "peter müller"), (7, "jana müller")} <= ext_words(ms)


def test_same_sentence_conjunction_lefthand_is_pronoun(by_doc):  # ref :108
    ms = by_doc["same_sent_left_pron"]
    assert len(ms) == 2
    assert {(4, "peter müller"), (10, "jana müller")} <= ext_words(ms)


def test_same_sentence_conjunction_righthand_is_pronoun(by_doc):  # ref :117
    ms = by_doc["same_sent_right_pron"]
    assert len(ms) == 2
    assert {(8, "peter müller"), (4, "jana müller")} <= ext_words(ms)


def test_same_sentence_conjunction_righthand_noun_not_match(by_doc):  # ref :126
    ms = by_doc["same_sent_right_noun_not"]
    assert len(ms) == 1
    assert (4, "peter müller") in ext_words(ms)


# ------------------------------------------- different-sentence pronoun

def test_simple_pronoun_coreference_diff_sentence(by_doc):  # ref :134
    ms = by_doc["diff_sent"]
    assert len(ms) == 1
    assert {(6, "hund"), (7, "jagen"), (3, "katze")} <= ext_words(ms)


def test_diff_sentence_wrong_structure(by_doc):  # ref :143
    assert by_doc["diff_sent_wrong"] == []


def test_diff_sentence_plural_antecedent(by_doc):  # ref :150
    ms = by_doc["diff_sent_plural"]
    assert len(ms) == 1
    assert (2, "katze") in ext_words(ms)


def test_diff_sentence_conjunction_in_antecedent_both_match(by_doc):  # ref :158
    ms = by_doc["diff_sent_conj_both"]
    assert len(ms) == 2
    assert {(3, "katze"), (6, "katze")} <= ext_words(ms)


def test_diff_sentence_conjunction_in_antecedent_left_matches(by_doc):  # ref :167
    ms = by_doc["diff_sent_conj_left"]
    assert len(ms) == 1
    assert (3, "katze") in ext_words(ms)


def test_diff_sentence_conjunction_in_antecedent_right_matches(by_doc):  # ref :175
    ms = by_doc["diff_sent_conj_right"]
    assert len(ms) == 1
    assert (6, "katze") in ext_words(ms)


# --------------------------------------- coreferent carries a dependency

def test_pronoun_coreferent_has_dependency_same_sentence(by_doc):  # ref :183
    ms = by_doc["pron_dep_same"]
    assert len(ms) == 1
    # ref asserts extracted 'groß' (spaCy lemma); the deterministic
    # stand-in reports the matched surface form of the same token
    assert {(3, "großes"), (4, "pferd")} <= ext_words(ms)


def test_pronoun_coreferents_with_dependency_conjunction_both(by_doc):  # ref :192
    ms = by_doc["pron_dep_conj_both"]
    assert len(ms) == 2
    assert {(3, "großes"), (4, "pferd"),
            (7, "großes"), (8, "pferd")} <= ext_words(ms)


def test_noun_coreferent_has_dependency_same_sentence(by_doc):  # ref :204
    ms = by_doc["noun_dep_same"]
    assert len(ms) == 1
    assert {(3, "großes"), (8, "pferd")} <= ext_words(ms)


def test_pronoun_coreferent_has_dependency_three_sentences(by_doc):  # ref :213
    ms = by_doc["pron_dep_three_sent"]
    assert len(ms) == 1
    assert {(12, "groß"), (3, "pferd")} <= ext_words(ms)


# ------------------------------------------------------------ reflexive

def test_reflexive_pronoun_coreferent(by_doc):  # ref :222
    ms = by_doc["reflexive"]
    assert len(ms) == 1
    wm = ms[0]["word_matches"]
    assert (wm[0]["doc_index"], wm[0]["extracted_word"]) == (1, "gepard")
    assert (wm[2]["doc_index"], wm[2]["extracted_word"]) == (1, "gepard")


def test_reflexive_pronoun_coreferents_with_conjunction_same_noun(by_doc):  # ref :231
    ms = by_doc["reflexive_conj_same"]
    assert len(ms) == 4
    pairs = {(m["word_matches"][0]["doc_index"],
              m["word_matches"][2]["doc_index"]) for m in ms}
    assert pairs == {(1, 1), (1, 4), (4, 1), (4, 4)}


def test_reflexive_pronoun_coreferents_with_conjunction_diff_noun(by_doc):  # ref :246
    ms = by_doc["reflexive_conj_diff"]
    assert len(ms) == 2
    got = {(m["word_matches"][0]["doc_index"],
            m["word_matches"][0]["extracted_word"],
            m["word_matches"][2]["doc_index"]) for m in ms}
    assert got == {(1, "gepard", 1), (4, "leopard", 4)}


# -------------------------------------------------------- noun mentions

def test_repeated_noun(by_doc):  # ref :257
    ms = by_doc["repeated_noun"]
    assert len(ms) == 1
    assert (7, "hund") in ext_words(ms)


def test_repeated_noun_match_both_mentions(by_doc):  # ref :265
    ms = by_doc["repeated_noun_both"]
    assert len(ms) == 2
    assert {(3, "müde"), (4, "hund"), (7, "hund")} <= ext_words(ms)


def test_mentions_following_structural_match(by_doc):  # ref :277
    ms = by_doc["mentions_following"]
    assert len(ms) == 1
    assert {(1, "großes"), (2, "pferd")} <= ext_words(ms)


# ------------------------------------------------- verb phrases & misc

def test_adjective_verb_phrase_as_search_phrase_matches_simple(by_doc):  # ref :287
    ms = by_doc["adj_verb_phrase"]
    assert len(ms) == 1
    assert not ms[0]["uncertain"]


def test_coreference_and_derivation(by_doc):  # ref :295
    ms = by_doc["coref_derivation"]
    assert len(ms) == 1
    assert ms[0]["word_matches"][1]["match_type"] == "derivation"


# ------------------------------------------------------------- subwords

def test_coreference_and_last_subword_matched_simple(by_doc):  # ref :303
    ms = by_doc["subword_simple"]
    assert len(ms) == 1
    assert (3, "elefant") in ext_words(ms)


def test_coreference_and_last_subword_matched_compound(by_doc):  # ref :311
    ms = by_doc["subword_compound"]
    assert len(ms) == 2
    assert {(3, "elefant"), (7, "elefant")} <= ext_words(ms)


def test_coreference_and_last_subword_and_previous_subword_simple(by_doc):  # ref :321
    ms = by_doc["subword_prev_simple"]
    assert len(ms) == 1
    assert (3, "elefant") in ext_words(ms)
    assert (3, "vergangenheit") in ext_words(ms)


def test_coreference_and_last_subword_and_previous_subword_compound(by_doc):  # ref :329
    ms = by_doc["subword_prev_compound"]
    assert len(ms) == 2
    assert {(3, "elefant"), (7, "elefant")} <= ext_words(ms)


def test_coreference_and_last_subword_and_reverse_dependency_simple(by_doc):  # ref :337
    ms = by_doc["subword_rev_simple"]
    assert len(ms) == 1
    assert (3, "urlaub") in ext_words(ms)


def test_coreference_and_last_subword_and_reverse_dependency_compound(by_doc):  # ref :345
    ms = by_doc["subword_rev_compound"]
    assert len(ms) == 2
    assert {(3, "urlaub"), (6, "urlaub")} <= ext_words(ms)
