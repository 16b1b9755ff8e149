"""EN phraselet-production parity suite, transcribed from the
reference's tests/en/test_phraselet_production_EN.py (cited per case).

Pure-Python (no Spark): drives the extraction layer the way the
reference's _check_equals drives add_phraselets_to_dict — the produced
label SET must equal the reference's expectation exactly. Reverse-only
templates are filtered unless include_reverse_only (the reference
helper's default is False, ref :32); hypernym replacement maps every
pole to its most-general ontology ancestor (ref :2427-2440).
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.nlp.parser import parse_document
from holmes_extractor_spark.pipeline.linking import hypernym_ancestors
from holmes_extractor_spark.pipeline.phraselets import (
    REVERSE_ONLY_TEMPLATES, extract_candidate_edges,
    extract_word_phraselets, replace_with_hypernym_ancestors)

from tests.test_structural_matching_en_ported import REF_ONTOLOGY

ANCESTORS = hypernym_ancestors(REF_ONTOLOGY)


def labels(text, hypernyms=False, include_reverse_only=False,
           include_questions=False):
    p = parse_document(text, "en")
    rels = [r for r in extract_candidate_edges(
                p, "en", include_questions=include_questions)
            if not r.get("mention")]  # matching-only variants
    words = extract_word_phraselets(p, "en")
    if not include_reverse_only:
        rels = [r for r in rels
                if r["template"] not in REVERSE_ONLY_TEMPLATES]
    if hypernyms:
        rels, words = replace_with_hypernym_ancestors(rels, words, ANCESTORS)
    return sorted({e["label"] for e in rels} | {w["label"] for w in words})


# (ref line, text, expected labels, hypernym replacement)
CASES = [
    (":76", "A plant grows",
     ['predicate-actor: grow-plant', 'word: plant'], False),
    (":81", "A plant grows up quickly",
     ['governor-adjective: grow up-quick', 'predicate-actor: grow up-plant',
      'word: plant'], False),
    (":93", "A plant is grown",
     ['predicate-passivesubject: grow-plant', 'word: plant'], False),
    (":98", "Somebody gives something to a plant",
     ['predicate-recipient: gift-plant', 'word: plant'], False),
    (":103", "A healthy plant",
     ['governor-adjective: plant-healthy', 'word: plant'], False),
    (":108", "They sailed rapidly",
     ['governor-adjective: sail-rapid'], False),
    (":118", "A hobby plant",
     ['noun-noun: plant-hobby', 'word: plant', 'word: hobby'], False),
    (":123", "A gardener's plant",
     ['word-ofword: plant-gardener', 'word: plant', 'word: gardener'],
     False),
    (":128", "A gardener's healthy hobby plant grows in the sun",
     ['predicate-actor: grow-plant', 'governor-adjective: plant-healthy',
      'noun-noun: plant-hobby', 'word-ofword: plant-gardener',
      'prepgovernor-noun: grow-sun', 'word: plant', 'word: hobby',
      'word: gardener', 'word: sun'], False),
    (":138", "A dog progresses",
     ['predicate-actor: progress-animal', 'word: animal'], True),
    (":143", "A big cat creature",
     ['governor-adjective: animal-big', 'word: animal'], True),
    (":148", "Fido progresses",
     ['predicate-actor: progress-animal', 'word: animal'], True),
    (":153", "Mimi Momo progresses",
     ['predicate-actor: progress-animal', 'word: animal'], True),
    (":158", "A dog progresses",
     ['predicate-actor: progress-dog', 'word: dog'], False),
    (":163", "A big cat creature",
     ['governor-adjective: cat creature-big', 'word: cat creature'], False),
    (":168", "Fido progresses",
     ['predicate-actor: progress-fido', 'word: fido'], False),
    (":173", "Mimi Momo progresses",
     ['predicate-actor: progress-mimi momo', 'word: mimi momo'], False),
    (":178", "School gear progresses",
     ['predicate-actor: progress-school gear', 'word: school gear'], True),
    (":183", "Information extraction progresses with information",
     ['predicate-actor: progress-extract', 'noun-noun: extract-inform',
      'prepgovernor-noun: progress-inform', 'word: inform',
      'word: extract'], False),
]


@pytest.mark.parametrize("ref,text,expected,hyp", CASES,
                         ids=[c[0] + " " + c[1][:28] for c in CASES])
def test_phraselet_production(ref, text, expected, hyp):
    assert labels(text, hypernyms=hyp) == sorted(expected), \
        f"test_phraselet_production_EN.py{ref}"


def test_prepposs():  # ref :265
    assert labels("He needs insurance for five years") == sorted(
        ['predicate-patient: need-insurance', 'number-noun: year-five',
         'prepgovernor-noun: need-year', 'prepgovernor-noun: insurance-year',
         'word: insurance', 'word: year'])


def test_reverse_only():  # ref :272
    assert labels("He needs insurance for five years",
                  include_reverse_only=True) == sorted(
        ['predicate-patient: need-insurance', 'number-noun: year-five',
         'prepgovernor-noun: need-year', 'prepgovernor-noun: insurance-year',
         'word: insurance', 'word: year', 'prep-noun: for-year'])


def test_question_word():  # ref :305
    assert labels("Who opened the door?", include_questions=True) == sorted(
        ['head-WHsubj: open-who', 'predicate-patient: open-door',
         'word: door'])


def test_question_word_control():  # ref :311
    assert labels("Who opened the door?", include_questions=False) == sorted(
        ['predicate-patient: open-door', 'word: door'])
