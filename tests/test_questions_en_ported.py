"""EN initial-questions parity suite, transcribed from the reference's
tests/en/test_questions_EN.py (cited per test as ref :line).

The reference asserts exact activation scores under its per-test
parameterization; scores here depend on the same machinery but the
suite asserts the reference's OBSERVABLE semantics — which documents
match, which carry answers and with which answer texts, and how the
question variant ranks against its non-question control — which is
what the reference's question/control test pairs establish.
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager


def topic(spark, query, doc, **kw):
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(doc, "d")
    return m.topic_match_documents_against(query, **kw)


def answers(tms):
    return [a["text"] for t in tms for a in (t.get("answers") or [])]


# ------------------------------------------------------ direct WH words

def test_basic_matching(spark):  # ref :38
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Richard Hudson and Peter Hudson sang a duet.", "q")
    m.parse_and_register_document("A book sings an elogy", "n")
    tms = m.topic_match_documents_against("Who sings?")
    assert [t["url"] for t in tms] == ["q", "n"]
    assert answers([tms[0]]) == ["Richard Hudson", "Peter Hudson"]
    assert answers([tms[1]]) == []


def test_ignore_questions(spark):  # ref :46
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Richard Hudson and Peter Hudson sang a duet.", "q")
    m.parse_and_register_document("A book sings an elogy", "n")
    tms = m.topic_match_documents_against(
        "Who sings?", initial_question_word_behaviour="ignore")
    assert {t["url"] for t in tms} == {"q", "n"}
    assert answers(tms) == []
    # both rank equal (tied): scores identical
    assert tms[0]["score"] == tms[1]["score"]


def test_exclusive_questions(spark):  # ref :53
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("Richard and Peter sang a duet.", "q")
    m.parse_and_register_document("A book sings an elogy", "n")
    tms = m.topic_match_documents_against(
        "Who sings?", initial_question_word_behaviour="exclusive")
    assert len(tms) == 1 and tms[0]["url"] == "q"


def test_basic_matching_with_coreference(spark):  # ref :82
    tms = topic(spark, "Who came home?", "I spoke to Richard. He came home")
    assert answers(tms) == ["Richard"]


def test_basic_matching_with_coreference_and_coordination(spark):  # ref :85
    tms = topic(spark, "Who came home?",
                "I spoke to Richard Hudson and Peter Hudson. They came home")
    assert sorted(answers(tms)) == ["Peter Hudson", "Richard Hudson"]


# ------------------------------------------- governed interrogatives

def test_governed_interrogative_pronoun_matching_direct(spark):  # ref :88
    q = topic(spark, "Which politician lied?", "The politician lied")
    c = topic(spark, "A politician lies", "The politician lied")
    assert answers(q) == ["politician"]
    assert answers(c) == []
    # the question scores above its control (ref: 54 vs 34)
    assert q[0]["score"] > c[0]["score"]


def test_governed_interrogative_pronoun_matching_ontology(spark):  # ref :100
    onto = [("cat", "subClassOf", "animal"), ("dog", "subClassOf", "animal")]
    m = SparkHolmesManager(spark, ontology=onto)
    m.parse_and_register_document("The cat woke up", "d")
    q = m.topic_match_documents_against("Which animal woke up?")
    assert answers(q) == ["cat"]
    m2 = SparkHolmesManager(spark, ontology=onto)
    m2.parse_and_register_document("The cat woke up", "d")
    c = m2.topic_match_documents_against("An animal woke up")
    assert answers(c) == []
    assert q[0]["score"] > c[0]["score"]


def test_governed_interrogative_pronoun_with_coreference(spark):  # ref :112
    tms = topic(spark, "Which person came home?",
                "I spoke to Richard Hudson. He came home")
    assert answers(tms) == ["Richard Hudson"]


def test_single_word_match_with_dependent_question_word(spark):  # ref :131
    q = topic(spark, "Which man?", "The man")
    c = topic(spark, "The man?", "The man")
    assert answers(q) == ["man"]
    assert answers(c) == []
    # a governed single word scores like its control (ref: 10 vs 10)
    assert q[0]["score"] == c[0]["score"]


def test_governed_interrogative_matching_proper_noun(spark):  # ref :73
    q = topic(spark, "Which person sings?", "Richard Hudson sang a duet.")
    assert answers(q) == ["Richard Hudson"]
    c = topic(spark, "A person sings", "Richard Hudson sang a duet.")
    assert answers(c) == []


# ---------------------------------------------------------- WH adverbs

def test_where_question(spark):
    # ref test_questions where-rules (en language_specific_rules.py:
    # 1367-1413): the preposition's object answers 'where'
    tms = topic(spark, "Where did the man sing?", "The man sang in the garden.")
    assert tms and tms[0]["answers"]


def test_what_gating_rejects_persons(spark):
    # what/was requires a non-person answer (ref en rules :1327-1365)
    tms = topic(spark, "What came home?", "Richard Hudson came home.")
    assert answers(tms) == []


def test_who_gating_rejects_things(spark):
    tms = topic(spark, "Who chased the cat?", "The dog chased the cat.")
    assert answers(tms) == []
