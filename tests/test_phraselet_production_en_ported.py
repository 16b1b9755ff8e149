"""EN phraselet-production parity suite, transcribed from the
reference's tests/en/test_phraselet_production_EN.py (cited per case).

Pure-Python (no Spark): drives the extraction layer the way the
reference's _check_equals drives add_phraselets_to_dict — the produced
label SET must equal the reference's expectation exactly. Reverse-only
templates and reverse-only parent lemmas are filtered unless
include_reverse_only (the reference helper's default is False, ref
:32); hypernym replacement maps every pole to its most-general
ontology ancestor (ref :2427-2440). ``onto`` mirrors which reference
manager ran the case: the ontology managers (incl. the symmetric one)
apply the ontology text-form preference and reverse-derivation map at
production time; the no-ontology coref manager applies neither.

NOT ported (documented gaps):
- test_*_adm_false (ref :87, :113, :189, :494): the
  analyze_derivational_morphology=False manager flag is not modeled —
  our derived-lemma pass is always on (the flag only disables
  derivation, never changes structure)
- test_matching_reprs (ref :407) parent/child_*_matching_reprs field
  assertions: the phraselet-info repr lists live in the query compile
  step (query/structural.py) and are covered by
  tests/test_word_level_matching_ported.py instead
- test_frequency_factors* (ref :626-:781): corpus-frequency factors
  enter at topic-match time (query/topic.py:1495-1594) and are covered
  by the freq_factors oracle + selective-retry tests instead
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.nlp.parser import parse_document
from holmes_extractor_spark.pipeline.linking import hypernym_ancestors
from holmes_extractor_spark.pipeline.phraselets import (
    apply_ontology_reverse_derivation, extract_phraselets,
    ontology_reverse_derivation_map, replace_with_hypernym_ancestors)

from tests.test_structural_matching_en_ported import REF_ONTOLOGY

ANCESTORS = hypernym_ancestors(REF_ONTOLOGY)
ONTO_WORDS = frozenset(w for (a, _r, b) in REF_ONTOLOGY for w in (a, b))
ONTO_REVERSE = ontology_reverse_derivation_map(set(ONTO_WORDS), "en")
ONTO_MW = frozenset(w for w in ONTO_WORDS if " " in w or "-" in w)


def produce(text, hypernyms=False, include_reverse_only=False,
            match_all_words=False, include_questions=False, onto=True):
    p = parse_document(text, "en",
                       ontology_multiwords=ONTO_MW if onto else None)
    rels, words = extract_phraselets(
        p, "en", match_all_words=match_all_words,
        include_reverse_only=include_reverse_only,
        include_questions=include_questions,
        ontology_words=ONTO_WORDS if onto else None)
    if onto:
        rels, words = apply_ontology_reverse_derivation(
            rels, words, ONTO_REVERSE)
    if hypernyms:
        rels, words = replace_with_hypernym_ancestors(rels, words, ANCESTORS)
    return rels, words


def labels(text, **kw):
    rels, words = produce(text, **kw)
    return sorted({e["label"] for e in rels} | {w["label"] for w in words})


def word_dict(text, **kw):
    kw.setdefault("include_reverse_only", True)
    kw.setdefault("match_all_words", True)
    rels, words = produce(text, **kw)
    return {w["label"]: w for w in words}, {r["label"] for r in rels}


# (ref line, text, expected labels, kwargs)
CASES = [
    (":76", "A plant grows",
     ['predicate-actor: grow-plant', 'word: plant'], {}),
    (":81", "A plant grows up quickly",
     ['governor-adjective: grow up-quick', 'predicate-actor: grow up-plant',
      'word: plant'], {}),
    (":93", "A plant is grown",
     ['predicate-passivesubject: grow-plant', 'word: plant'], {}),
    (":98", "Somebody gives something to a plant",
     ['predicate-recipient: gift-plant', 'word: plant'], {}),
    (":103", "A healthy plant",
     ['governor-adjective: plant-healthy', 'word: plant'], {}),
    (":108", "They sailed rapidly",
     ['governor-adjective: sail-rapid'], {}),
    (":118", "A hobby plant",
     ['noun-noun: plant-hobby', 'word: plant', 'word: hobby'], {}),
    (":123", "A gardener's plant",
     ['word-ofword: plant-gardener', 'word: plant', 'word: gardener'], {}),
    (":128", "A gardener's healthy hobby plant grows in the sun",
     ['predicate-actor: grow-plant', 'governor-adjective: plant-healthy',
      'noun-noun: plant-hobby', 'word-ofword: plant-gardener',
      'prepgovernor-noun: grow-sun', 'word: plant', 'word: hobby',
      'word: gardener', 'word: sun'], {}),
    (":138", "A dog progresses",
     ['predicate-actor: progress-animal', 'word: animal'],
     dict(hypernyms=True)),
    (":143", "A big cat creature",
     ['governor-adjective: animal-big', 'word: animal'],
     dict(hypernyms=True)),
    (":148", "Fido progresses",
     ['predicate-actor: progress-animal', 'word: animal'],
     dict(hypernyms=True)),
    (":153", "Mimi Momo progresses",
     ['predicate-actor: progress-animal', 'word: animal'],
     dict(hypernyms=True)),
    (":158", "A dog progresses",
     ['predicate-actor: progress-dog', 'word: dog'], {}),
    (":163", "A big cat creature",
     ['governor-adjective: cat creature-big', 'word: cat creature'], {}),
    (":168", "Fido progresses",
     ['predicate-actor: progress-fido', 'word: fido'], {}),
    (":173", "Mimi Momo progresses",
     ['predicate-actor: progress-mimi momo', 'word: mimi momo'], {}),
    (":178", "School gear progresses",
     ['predicate-actor: progress-school gear', 'word: school gear'],
     dict(hypernyms=True)),
    (":183", "Information extraction progresses with information",
     ['predicate-actor: progress-extract', 'noun-noun: extract-inform',
      'prepgovernor-noun: progress-inform', 'word: inform',
      'word: extract'], {}),
    (":196", "He saw rainbows",
     ['predicate-patient: see-arc', 'word: arc'], dict(hypernyms=True)),
    (":202", "He saw rainbows",
     ['predicate-patient: see-rainbows', 'word: rainbows'], {}),
    # symmetric-ontology block (ref :208-:260): phraselet PRODUCTION is
    # direction-identical under Ontology(symmetric_matching=True) — the
    # symmetry flag only widens the match-time closure
    # (pipeline/linking.py ontology_closure_local(symmetric=True))
    (":208", "A dog progresses",
     ['predicate-actor: progress-animal', 'word: animal'],
     dict(hypernyms=True)),
    (":213", "A big cat creature",
     ['governor-adjective: animal-big', 'word: animal'],
     dict(hypernyms=True)),
    (":218", "Fido progresses",
     ['predicate-actor: progress-animal', 'word: animal'],
     dict(hypernyms=True)),
    (":223", "Mimi Momo progresses",
     ['predicate-actor: progress-animal', 'word: animal'],
     dict(hypernyms=True)),
    (":228", "A dog progresses",
     ['predicate-actor: progress-dog', 'word: dog'], {}),
    (":233", "A big cat creature",
     ['governor-adjective: cat creature-big', 'word: cat creature'], {}),
    (":238", "Fido progresses",
     ['predicate-actor: progress-fido', 'word: fido'], {}),
    (":243", "Mimi Momo progresses",
     ['predicate-actor: progress-mimi momo', 'word: mimi momo'], {}),
    (":248", "Information extraction progresses",
     ['predicate-actor: progress-extract', 'noun-noun: extract-inform',
      'word: inform', 'word: extract'], {}),
    (":254", "He saw rainbows",
     ['predicate-patient: see-arc', 'word: arc'], dict(hypernyms=True)),
    (":260", "He saw rainbows",
     ['predicate-patient: see-rainbows', 'word: rainbows'], {}),
    (":265", "He needs insurance for five years",
     ['predicate-patient: need-insurance', 'number-noun: year-five',
      'prepgovernor-noun: need-year', 'prepgovernor-noun: insurance-year',
      'word: insurance', 'word: year'], {}),
    (":272", "He needs insurance for five years",
     ['predicate-patient: need-insurance', 'number-noun: year-five',
      'prepgovernor-noun: need-year', 'prepgovernor-noun: insurance-year',
      'word: insurance', 'word: year', 'prep-noun: for-year'],
     dict(include_reverse_only=True)),
    (":280", "I saw a dog. He was chasing a cat and a cat",
     ['predicate-patient: see-dog', 'predicate-actor: chase-dog',
      'predicate-patient: chase-cat', 'word: dog', 'word: cat'],
     dict(onto=False)),
    (":286", "Always he had it", ['governor-adjective: have-always'],
     dict(include_reverse_only=True, onto=False)),
    (":290", "Always he had it", ['word: have', 'word: always'],
     dict(onto=False)),
    (":294", "So he did it at home",
     ['word: home', 'prepgovernor-noun: do-home', 'prep-noun: at-home'],
     dict(include_reverse_only=True, onto=False)),
    (":300", "So he did it at home", ['word: home'], dict(onto=False)),
    (":305", "Who opened the door?",
     ['head-WHsubj: open-who', 'predicate-patient: open-door',
      'word: door'], dict(include_questions=True, onto=False)),
    (":311", "Who opened the door?",
     ['predicate-patient: open-door', 'word: door'], dict(onto=False)),
    # ref :316 drives add_phraselets_to_dict directly with the same
    # expectation as :280 — ported as the coref label set
    (":316", "I saw a dog. He was chasing a cat and a cat",
     ['predicate-patient: see-dog', 'predicate-actor: chase-dog',
      'predicate-patient: chase-cat', 'word: dog', 'word: cat'],
     dict(onto=False)),
    (":342", "jump", ['word: jump'], {}),
    (":346", "in", ['word: in'], {}),
    (":350", "I saw a dog. He was chasing a cat and a cat",
     ['predicate-actor: chase-dog', 'predicate-patient: chase-cat',
      'predicate-patient: see-dog', 'word: dog', 'word: cat',
      'word: see', 'word: chase'],
     dict(match_all_words=True, onto=False)),
    (":357", "Richard Paul Hudson came",
     ['predicate-actor: come-richard paul hudson',
      'word: richard paul hudson'], dict(onto=False)),
    (":363", "The big Richard Paul Hudson",
     ['governor-adjective: richard paul hudson-big',
      'word: richard paul hudson'], dict(onto=False)),
    (":369", "The big Mimi Momo",
     ['governor-adjective: mimi momo-big', 'word: mimi momo'], {}),
    (":375", "Richard Paul Hudson came",
     ['predicate-actor: come-richard paul hudson',
      'word: richard', 'word: paul', 'word: hudson', 'word: come'],
     dict(match_all_words=True, onto=False)),
    (":381", "The big Richard Paul Hudson",
     ['governor-adjective: richard paul hudson-big',
      'word: richard', 'word: paul', 'word: hudson', 'word: big'],
     dict(match_all_words=True, onto=False)),
    (":388", "The big Mimi Momo",
     ['governor-adjective: mimi momo-big',
      'word: mimi', 'word: momo', 'word: big'],
     dict(match_all_words=True)),
    (":395", "The big Richard Pranaya Jones",
     ['governor-adjective: pranaya jones-big',
      'noun-noun: pranaya jones-richard',
      'word: pranaya', 'word: jones', 'word: richard', 'word: big'],
     dict(match_all_words=True)),
    (":401", "The big Richard Pranaya Jones",
     ['governor-adjective: pranaya jones-big',
      'noun-noun: pranaya jones-richard',
      'word: pranaya jones', 'word: richard'], {}),
]


@pytest.mark.parametrize("ref,text,expected,kw", CASES,
                         ids=[c[0] + " " + c[1][:28] for c in CASES])
def test_phraselet_production(ref, text, expected, kw):
    assert labels(text, **kw) == sorted(expected), \
        f"test_phraselet_production_EN.py{ref}"


# --- plain-lemma preference within a label (ref :431-:537): the label
# keys on the derived lemma; the phraselet's plain lemma follows the
# preferred nominal reading, with ties to the shorter spelling

def test_noun_lemmas_preferred_noun_lemma_first():  # ref :431
    wd, rl = word_dict("They wanted allowances. They wanted to allow it.",
                       onto=False)
    assert 'word: allowance' not in wd
    assert 'predicate-patient: want-allowance' not in rl
    assert wd['word: allow']["disp"] == 'allowance'
    assert 'predicate-patient: want-allow' in rl


def test_noun_lemmas_preferred_noun_lemma_second():  # ref :443
    wd, rl = word_dict("They wanted to allow it. They wanted allowances.",
                       onto=False)
    assert 'word: allowance' not in wd
    assert 'predicate-patient: want-allowance' not in rl
    assert wd['word: allow']["disp"] == 'allowance'
    assert 'predicate-patient: want-allow' in rl


def test_noun_lemmas_preferred_control_1():  # ref :455
    wd, rl = word_dict("They wanted to allow it.", onto=False)
    assert 'word: allowance' not in wd
    assert wd['word: allow']["disp"] == 'allow'
    assert 'predicate-patient: want-allow' in rl


def test_noun_lemmas_preferred_control_2():  # ref :467
    wd, rl = word_dict("They wanted allowances.", onto=False)
    assert 'word: allowance' not in wd
    assert wd['word: allow']["disp"] == 'allowance'
    assert 'predicate-patient: want-allow' in rl


def test_shorter_lemmas_preferred_shorter_lemma_first():  # ref :479
    wd, rl = word_dict("They discussed behavior. They discussed behaviour.",
                       onto=False)
    assert 'word: behaviour' not in wd and 'word: behavior' not in wd
    assert 'predicate-patient: discuss-behaviour' not in rl
    assert 'predicate-patient: discuss-behavior' not in rl
    assert wd['word: behave']["disp"] == 'behavior'
    assert 'predicate-patient: discuss-behave' in rl


def test_shorter_lemmas_preferred_shorter_lemma_second():  # ref :509
    wd, rl = word_dict("They discussed behaviour. They discussed behavior.",
                       onto=False)
    assert 'word: behaviour' not in wd and 'word: behavior' not in wd
    assert wd['word: behave']["disp"] == 'behavior'
    assert 'predicate-patient: discuss-behave' in rl


def test_shorter_lemmas_preferred_control():  # ref :524
    wd, rl = word_dict("They discussed behaviour. They behaved",
                       onto=False)
    assert 'word: behaviour' not in wd and 'word: behavior' not in wd
    assert wd['word: behave']["disp"] == 'behaviour'
    assert 'predicate-patient: discuss-behave' in rl


# --- ontology reverse-derivation at production (ref :541-:624)

def test_reverse_derived_lemmas_in_ontology_one_lemma_1():  # ref :541
    wd, rl = word_dict("He ate moodily")
    assert 'word: moody' not in wd
    assert 'governor-adjective: eat-moody' not in rl
    assert 'word: moodiness' in wd
    assert 'governor-adjective: eat-moodiness' in rl


def test_reverse_derived_lemmas_in_ontology_one_lemma_2():  # ref :560
    wd, rl = word_dict("He offended the cat")
    assert 'word: offend' not in wd
    assert 'predicate-patient: offend-cat' not in rl
    assert 'word: offence' in wd
    assert 'predicate-patient: offence-cat' in rl


def test_reverse_derived_lemmas_in_ontology_multiword_mall():  # ref :600
    wd, rl = word_dict("He used a waste horse")
    assert 'word: waste' in wd
    assert 'word: horse' in wd
    assert 'predicate-patient: use-wastage horse' in rl


def test_reverse_derived_lemmas_in_ontology_multiword_not_mall():  # ref :611
    wd, rl = word_dict("He used a waste horse", match_all_words=False)
    assert 'word: waste horse' not in wd
    assert 'predicate-patient: use-waste horse' not in rl
    assert 'word: wastage horse' in wd
    assert 'predicate-patient: use-wastage horse' in rl
