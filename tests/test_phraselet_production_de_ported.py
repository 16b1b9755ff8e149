"""DE phraselet-production parity suite, transcribed from the
reference's tests/de/test_phraselet_production_DE.py (cited per case).

Pure-Python (no Spark): drives the extraction layer the way the
reference's _check_equals drives add_phraselets_to_dict — the produced
label SET must equal the reference's expectation exactly, including
the German derived-lemma spellings (pflanze→pflanz via the reference's
NN final-e stripping, de language_specific_rules.py:1086-1094;
versicherung→versichern via the -ung rule; geben→gabe via
derivation.csv).

NOT ported (documented gaps):
- test_subwords_with_conjunction_one_not_hyphenated_* (ref :311-349):
  expects the non-hyphenated conjunct 'Beschaffungsmaßnahmen' to keep
  whole-word relation copies (verb-acc: beschaffungsmaßnahmen-…) the
  hyphenated-fragment path does not produce — conjunction distribution
  over MIXED hyphenated/whole compounds is not modeled
- test_frequency_factors_with_subwords (ref :478-496): asserts
  reference-exact float strings for corpus-frequency factors wired
  through add_phraselets_to_dict's words_to_corpus_frequencies; our
  frequency factors enter at topic-match time (query/topic.py) and are
  covered by the freq_factors oracle instead
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.nlp.parser import parse_document
from holmes_extractor_spark.pipeline.linking import hypernym_ancestors
from holmes_extractor_spark.pipeline.phraselets import (
    apply_ontology_reverse_derivation, extract_candidate_edges,
    extract_phraselets, ontology_reverse_derivation_map,
    replace_with_hypernym_ancestors)

# transcribed from reference tests/de/test_ontology.owl (subClassOf /
# equivalentClass triples used by the hypernym + intcompound cases)
REF_ONTOLOGY_DE = [
    ("jagd", "equivalentClass", "jagen"),
    ("komputerlinguistik", "equivalentClass", "linguistik"),
    ("komputerlinguistik", "equivalentClass", "sprachwissenschaft"),
    ("linguistik", "equivalentClass", "sprachwissenschaft"),
    ("monitor", "subClassOf", "hardware"),
    ("benötigen", "equivalentClass", "brauchen"),
]

ANCESTORS = hypernym_ancestors(REF_ONTOLOGY_DE)

# the reference manager loads the ontology globally, so its
# reverse-derivation map applies to every production call (ontology
# entities incl. the bare classes, tests/de/test_ontology.owl)
ONTO_WORDS = {"jagd", "jagen", "komputerlinguistik", "linguistik",
              "sprachwissenschaft", "monitor", "hardware", "benötigen",
              "brauchen", "abfliegen"}
ONTO_REVERSE = ontology_reverse_derivation_map(ONTO_WORDS, "de")


def labels(text, hypernyms=False, include_reverse_only=False,
           match_all_words=False, include_questions=False):
    p = parse_document(text, "de")
    rels, words = extract_phraselets(
        p, "de", match_all_words=match_all_words,
        include_reverse_only=include_reverse_only,
        include_questions=include_questions)
    rels, words = apply_ontology_reverse_derivation(
        rels, words, ONTO_REVERSE)
    if hypernyms:
        rels, words = replace_with_hypernym_ancestors(rels, words, ANCESTORS)
    return sorted({e["label"] for e in rels} | {w["label"] for w in words})


# (ref line, text, expected labels, kwargs)
CASES = [
    (":57", "Eine Pflanze wächst",
     ['verb-nom: wachsen-pflanz', 'word: pflanz'], {}),
    (":61", "Eine Pflanze wächst auf",
     ['verb-nom: aufwachsen-pflanz', 'word: pflanz'], {}),
    (":65", "Eine Pflanze wird gepflanzt",
     ['verb-acc: pflanzen-pflanz', 'word: pflanz'], {}),
    (":69", "Jemand gibt einer Pflanze etwas",
     ['verb-dat: gabe-pflanz', 'word: pflanz'], {}),
    (":73", "Eine gesunde Pflanze",
     ['noun-dependent: pflanz-gesund', 'word: pflanz'], {}),
    (":77", "Die Pflanze eines Gärtners",
     ['verb-acc: pflanz-gärtner', 'word: gärtner', 'word: pflanz'], {}),
    (":81", "lange schauen", ['verb-adverb: schau-lang'], {}),
    (":84", "Der Gärtner gibt der netten Frau ihr Mittagessen",
     ['verb-nom: gabe-gärtner', 'verb-acc: gabe-mittagessen',
      'verb-dat: gabe-frau', 'noun-dependent: frau-nett',
      'noun-dependent: mittagessen-frau', 'word: gärtner', 'word: frau',
      'word: mittagessen'], {}),
    # :92/:113 assert the same sets through raw add_phraselets_to_dict
    # (include_reverse_only=True adds nothing here)
    (":92", "Der Gärtner gibt der netten Frau ihr Mittagessen",
     ['verb-nom: gabe-gärtner', 'verb-acc: gabe-mittagessen',
      'verb-dat: gabe-frau', 'noun-dependent: frau-nett',
      'noun-dependent: mittagessen-frau', 'word: gärtner', 'word: frau',
      'word: mittagessen'], {"include_reverse_only": True}),
    (":113", "Der Landschaftsgärtner gibt der netten Frau ihr Mittagessen",
     ['verb-nom: gabe-landschaftsgärtner', 'verb-acc: gabe-mittagessen',
      'verb-dat: gabe-frau', 'noun-dependent: frau-nett',
      'noun-dependent: mittagessen-frau', 'word: landschaftsgärtner',
      'word: frau', 'word: mittagessen',
      'intcompound: gärtner-landschaft', 'verb-nom: gabe-gärtner'],
     {"include_reverse_only": True}),
    (":145", "Immer hat er es",
     ['verb-adverb: haben-immer'], {"include_reverse_only": True}),
    (":149", "Er hat es immer gehabt",
     ['verb-adverb: haben-immer'], {"include_reverse_only": True}),
    (":153", "Immer soll er es haben",
     ['verb-adverb: haben-immer'], {"include_reverse_only": True}),
    (":157", "Immer hat er es",
     ['word: haben', 'word: immer'], {}),
    (":161", "Immer hat er es gehabt",
     ['word: haben', 'word: immer'], {}),
    (":165", "Immer soll er es haben",
     ['word: haben', 'word: immer'], {}),
    (":169", "Dann tat er es zu Hause",
     ['word: haus', 'prepgovernor-noun: tat-haus', 'prep-noun: zu-haus'],
     {"include_reverse_only": True}),
    (":174", "Dann tat er es zu Hause", ['word: haus'], {}),
    (":178", "springen", ['word: sprung'], {}),
    (":181", "unter", ['word: unter'], {}),
    (":184", "Der Gärtner gibt der netten Frau ihr Mittagessen",
     ['word: gärtner', 'word: frau', 'word: mittagessen',
      'word: gabe', 'word: nett', 'verb-nom: gabe-gärtner',
      'verb-dat: gabe-frau', 'verb-acc: gabe-mittagessen',
      'noun-dependent: frau-nett', 'noun-dependent: mittagessen-frau'],
     {"match_all_words": True}),
    (":191", "Er braucht eine Versicherung für fünf Jahre",
     ['verb-acc: brauchen-versichern', 'noun-dependent: jahr-fünf',
      'prepgovernor-noun: brauchen-jahr',
      'prepgovernor-noun: versichern-jahr',
      'word: jahr', 'word: versichern'], {}),
    (":197", "Er braucht eine Versicherung für fünf Jahre",
     ['verb-acc: brauchen-versichern', 'noun-dependent: jahr-fünf',
      'prepgovernor-noun: brauchen-jahr',
      'prepgovernor-noun: versichern-jahr',
      'word: jahr', 'word: versichern', 'prep-noun: für-jahr'],
     {"include_reverse_only": True}),
    (":205", "Richard Paul Hudson kam",
     ['verb-nom: kommen-richard paul hudson',
      'word: richard paul hudson'], {}),
    (":210", "Richard Paul Hudson kam",
     ['verb-nom: kommen-richard paul hudson',
      'word: richard', 'word: paul', 'word: hudson', 'word: kommen'],
     {"match_all_words": True}),
    (":215", "Informationsextraktion aus den Daten wurde durchgeführt",
     ['verb-acc: durchführen-informationsextraktion', 'word: extraktion',
      'word: aus', 'word: informationsextraktion',
      'prepgovernor-noun: informationsextraktion-datum',
      'word: information',
      'prepgovernor-noun: durchführen-datum', 'word: durchführen',
      'intcompound: extraktion-information', 'word: datum',
      'prepgovernor-noun: extraktion-datum',
      'verb-acc: durchführen-extraktion'], {"match_all_words": True}),
    (":224", "Informationsextraktion aus den Daten wurde durchgeführt",
     ['verb-acc: durchführen-informationsextraktion',
      'word: informationsextraktion',
      'prepgovernor-noun: informationsextraktion-datum',
      'prepgovernor-noun: durchführen-datum',
      'intcompound: extraktion-information', 'word: datum',
      'prepgovernor-noun: extraktion-datum',
      'verb-acc: durchführen-extraktion'], {}),
    (":233", "Informationsextraktion aus den Daten wurde durchgeführt",
     ['verb-acc: durchführen-informationsextraktion', 'word: extraktion',
      'word: aus', 'word: informationsextraktion',
      'prepgovernor-noun: informationsextraktion-datum',
      'word: information',
      'prepgovernor-noun: durchführen-datum', 'word: durchführen',
      'intcompound: extraktion-information', 'word: datum',
      'prepgovernor-noun: extraktion-datum',
      'verb-acc: durchführen-extraktion', 'prep-noun: aus-datum'],
     {"match_all_words": True, "include_reverse_only": True}),
    (":244", "Informationsextraktion aus den Daten wurde durchgeführt",
     ['verb-acc: durchführen-informationsextraktion',
      'word: informationsextraktion',
      'prepgovernor-noun: informationsextraktion-datum',
      'prepgovernor-noun: durchführen-datum',
      'intcompound: extraktion-information', 'word: datum',
      'prepgovernor-noun: extraktion-datum',
      'verb-acc: durchführen-extraktion', 'prep-noun: aus-datum'],
     {"include_reverse_only": True}),
    (":255", "Der Informationsmonitor war groß",
     ['noun-dependent: informationsmonitor-groß',
      'word: informationsmonitor',
      'noun-dependent: monitor-groß',
      'intcompound: monitor-information'], {}),
    (":262", "Der Informationsmonitor war groß",
     ['noun-dependent: informationsmonitor-groß',
      'word: informationsmonitor',
      'noun-dependent: hardware-groß',
      'intcompound: hardware-information'], {"hypernyms": True}),
    (":270", "Der Informationsmonitor war groß",
     ['noun-dependent: informationsmonitor-groß',
      'word: informationsmonitor',
      'noun-dependent: hardware-groß',
      'intcompound: hardware-information',
      'word: groß', 'word: information', 'word: hardware', 'word: sein'],
     {"hypernyms": True, "match_all_words": True}),
    (":281",
     "Der König von den Informationsinteressen-, -beschaffungs- und "
     "-problemmaßnahmen",
     ['intcompound: beschaffen-information',
      'word: könig',
      'verb-acc: könig-maßnahm',
      'intcompound: problem-information',
      'intcompound: maßnahm-problem',
      'intcompound: maßnahm-beschaffen',
      'intcompound: maßnahm-interesse',
      'intcompound: interesse-information',
      'word: problem', 'word: information', 'word: interesse',
      'word: beschaffen', 'word: maßnahm'], {"match_all_words": True}),
    (":299",
     "Der König von den Informationsinteressen-, -beschaffungs- und "
     "-problemmaßnahmen",
     ['intcompound: beschaffen-information',
      'word: könig',
      'verb-acc: könig-maßnahm',
      'intcompound: problem-information',
      'intcompound: maßnahm-problem',
      'intcompound: maßnahm-beschaffen',
      'intcompound: maßnahm-interesse',
      'intcompound: interesse-information'], {}),
    (":351", "Wer kam?", ['head-WHnom: kommen-wer'],
     {"include_questions": True}),
    (":357", "Wer kam?", ['word: kommen'], {"match_all_words": True}),
]


@pytest.mark.parametrize("ref,text,expected,kw", CASES,
                         ids=[c[0] + " " + c[1][:28] for c in CASES])
def test_phraselet_production(ref, text, expected, kw):
    assert labels(text, **kw) == sorted(expected), \
        f"test_phraselet_production_DE.py{ref}"


def test_intcompound_parent_child_lemmas():  # ref :113 (info asserts)
    p = parse_document(
        "Der Landschaftsgärtner gibt der netten Frau ihr Mittagessen",
        "de")
    rels = extract_candidate_edges(p, "de")
    ic = [r for r in rels
          if r["label"] == "intcompound: gärtner-landschaft"][0]
    assert ic["pred_disp"] == "gärtner"
    assert ic["pred"] == "gärtner"
    assert ic["child_disp"] == "landschaft"
    assert ic["obj"] == "landschaft"


# ------------------------------------------- lemma-preference goldens
# The reference's add_phraselets_to_dict keeps ONE entry per derived
# lemma and prefers (a) the noun-tagged occurrence's raw lemma, then
# (b) the shorter raw lemma (reference parsing.py:2009-2035). Our
# pipeline derives the label from derived lemmas, so the label-level
# behavior (no 'word: amputieren' / 'word: informierung' keys, merged
# relation labels) holds by construction; these cases pin it.

def _dict_labels(text, match_all_words=True):
    return labels(text, match_all_words=match_all_words,
                  include_reverse_only=True)


def test_noun_lemmas_preferred_noun_lemma_first():  # ref :363
    ls = _dict_labels(
        "Sie besprachen die Amputation. Sie hatten ein Amputieren vor")
    assert "word: amputieren" not in ls
    assert "verb-acc: vorhaben-amputieren" not in ls
    assert "word: amputation" in ls
    assert "verb-acc: vorhaben-amputation" in ls


def test_noun_lemmas_preferred_noun_lemma_second():  # ref :377
    ls = _dict_labels(
        "Sie hatten ein Amputieren vor. Sie besprachen die Amputation.")
    assert "word: amputieren" not in ls
    assert "word: amputation" in ls
    assert "verb-acc: vorhaben-amputation" in ls


def test_noun_lemmas_preferred_control():  # ref :391
    ls = _dict_labels("Sie hatten ein Amputieren vor.")
    assert "word: amputieren" not in ls
    assert "word: amputation" in ls
    assert "verb-acc: vorhaben-amputation" in ls


def test_shorter_lemmas_preferred():  # ref :405, :419, :433
    for text in (
            "Sie besprachen Information. Sie besprachen Informierung.",
            "Sie besprachen Informierung. Sie besprachen Information.",
            "Sie besprachen Informierung."):
        ls = _dict_labels(text)
        assert "word: informierung" not in ls, text
        assert "verb-acc: besprechen-informierung" not in ls, text
        assert "word: information" in ls, text
        assert "verb-acc: besprechen-information" in ls, text


def test_shorter_lemmas_preferred_subwords():  # ref :441, :453, :465
    for text in ("Eine Informationskomitee und eine Informierungskomitee.",
                 "Eine Informierungskomitee und eine Informationskomitee.",
                 "Eine Informierungskomitee."):
        ls = _dict_labels(text)
        assert "word: informierung" not in ls, text
        assert "intcompound: komitee-informierung" not in ls, text
        assert "word: information" in ls, text
        assert "intcompound: komitee-information" in ls, text


def test_intcompound_when_word_in_ontology():  # ref :474
    ls = _dict_labels("Sprachwissenschaft.")
    assert ls == sorted(['word: sprachwissenschaft', 'word: sprach',
                         'word: wissenschaft',
                         'intcompound: wissenschaft-sprach'])


def test_intcompound_when_reverse_derived_lemma_in_ontology():  # ref :481
    ls = _dict_labels("Sammelabflug.")
    assert ls == sorted(['word: sammelabflug', 'word: sammel',
                         'word: abfliegen',
                         'intcompound: abfliegen-sammel'])
