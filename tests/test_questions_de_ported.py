"""DE initial-question parity suite, transcribed from the reference's
tests/de/test_questions_DE.py (reference line cited per case).

Mirrors the reference's _check_equals (ref :9-33):
initial_question_word_answer_score=40, relation 20, reverse-only 15,
single word 10, any-tag 5, cutoff 10, frequency thresholds 0.0.
Asserts int(score) plus the first answer's char span (None = the
question must go unanswered). Exercises the DE question machinery:
wer/wen/wem gating on person-like answers, the wo/wohin DATIVE vs
ACCUSATIVE two-way-preposition split, womit/wodurch postposition
compounds, wann over temporal preps/nouns/adverbs and wenn-clauses,
wie over mit/adverbs/indem-clauses, woher/warum over wegen and
weil/damit-clauses, and German OVS questions ('Wen sah das Gebäude?').

Round 5 added the subword question battery (ref :35-65 — WH poles
match into compound parts via intcompound, governed welch-
interrogatives answer with the compound-part char span, and the
fronted-object/nominative-'man' correction fixes the OVS parses) and
the wen positive case (ref :82 — the reference records 54 or 104 as
model-dependent; ours deterministically lands on 104).

NOT ported (documented gaps):
- the embedding-gated subword case (ref :58-63, Hund≈Katze cosines
  through a compound — needs a dach/haus-style band-engineered pair
  for katze inside Informationskatze)
- 'Das ist ein Haus' full-dict case (ref :66-69, demonstrative-subject
  copula parse)
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager


@pytest.fixture(scope="module")
def check(spark):
    def _check(query, doc, expected, answer_start, answer_end, **kw):
        m = SparkHolmesManager(spark)
        m.parse_and_register_document(doc, "d", lang="de")
        tms = m.topic_match_documents_against(
            query, lang="de", initial_question_word_answer_score=40,
            relation_score=20, reverse_only_relation_score=15,
            single_word_score=10, single_word_any_tag_score=5,
            different_match_cutoff_score=10,
            relation_matching_frequency_threshold=0.0,
            embedding_matching_frequency_threshold=0.0, **kw)
        assert tms, "no topic match"
        assert int(tms[0]["score"]) == expected
        if answer_start is None:
            assert tms[0]["answers"] == []
        else:
            a = tms[0]["answers"][0]
            assert a["relative_start_index"] == answer_start
            assert a["relative_end_index"] == answer_end
    return _check


# (ref line, query, document, score, answer_start, answer_end)
CASES = [
    (71, 'Wer schaute in die Sonne?',
     'Die Person schaute in die Sonne', 127, 0, 10),
    (74, 'Wer schaute in die Sonne?',
     'Die Sonne schaute in den Mann', 19, None, None),
    (77, 'Wer schaute in die Sonne?',
     'Das Gebäude schaute in die Sonne', 70, None, None),
    (86, 'Wen sah das Gebäude?', 'Das Gebäude sah das Gebäude',
     34, None, None),
    (89, 'Was sah das Gebäude?', 'Das Gebäude sah das Gebäude',
     104, 16, 27),
    (92, 'wem gibst du es?', 'Ich gebe es der Person', 45, 12, 22),
    (95, 'Wo wohnst du?', 'Ich wohne in einem Haus', 45, 10, 23),
    (98, 'Wo wohnst du?', 'Ich wohne im Haus', 45, 10, 17),
    (101, 'Wo wohnst du?', 'Ich wohne ins Haus', 5, None, None),
    (104, 'Wo wohnst du?', 'Ich wohne in ein Haus', 5, None, None),
    (107, 'Wohin fährst du?', 'Ich fahre in ein Haus', 45, 10, 21),
    (110, 'Wohin fährst du?', 'Ich fahre ins Haus', 45, 10, 18),
    (113, 'Wohin fährst du?', 'Ich fahre im Haus', 5, None, None),
    (116, 'Womit fährst du?', 'Ich fahre mit meinem Auto', 45, 10, 25),
    (119, 'Womit fährst du?', 'Ich fahre ohne mein Auto', 5, None, None),
    (120, 'Wann fährst du?', 'Ich fahre nächste Woche', 45, 10, 23),
    (123, 'Wann fährst du?', 'Ich fahre in zwei Wochen', 45, 10, 24),
    (126, 'Wann fährst du?', 'Ich fahre wegen des Problems', 5, None, None),
    (129, 'Wann fährst du?', 'Ich fahre morgen', 45, 10, 16),
    (132, 'Wann fährst du?', 'Ich fahre, wenn du mitkommst.', 45, 11, 28),
    (135, 'Wie fährst du?', 'Ich fahre mit dem Auto', 45, 10, 22),
    (138, 'Wie fährst du?', 'Ich fahre wegen des Problems', 5, None, None),
    (141, 'Wie fährst du?', 'Ich fahre langsam', 45, 10, 17),
    (144, 'Wie fährst du?', 'Ich fahre, indem ich per Anhalter fahre',
     45, 11, 39),
    (147, 'Wie fährst du?', 'Ich fahre, weil ich per Anhalter fahre',
     5, None, None),
    (150, 'Woher denkst Du es?', 'Ich denke es wegen der Evidenz',
     45, 13, 30),
    (153, 'Woher denkst Du es?', 'Ich denke es trotz der Evidenz',
     5, None, None),
    (156, 'Woher denkst Du es?', 'Ich denke es, weil es stimmt',
     45, 14, 28),
    (159, 'Woher denkst Du es?', 'Ich denke es, obwohl es nicht stimmt',
     5, None, None),
    (162, 'Warum machst Du es?', 'Ich mache es wegen der Evidenz',
     45, 13, 30),
    (165, 'Warum machst Du es?', 'Ich mache es trotz der Evidenz',
     5, None, None),
    (168, 'Warum machst Du es?', 'Ich mache es, weil es stimmt',
     45, 14, 28),
    (171, 'Warum machst Du es?', 'Ich mache es, weil es gut ist',
     45, 14, 29),
    (174, 'Wieso machst Du es?', 'Ich mache es, damit Du kommst',
     45, 14, 29),
    (177, 'Woher machst Du es?', 'Ich mache es, obwohl es nicht stimmt',
     5, None, None),
]


@pytest.mark.parametrize("ref_line,query,doc,expected,a_start,a_end",
                         CASES, ids=[str(c[0]) for c in CASES])
def test_question_case(check, ref_line, query, doc, expected,
                       a_start, a_end):
    check(query, doc, expected, a_start, a_end)


def test_question_word_is_not_treated_as_answer(check):  # ref :180
    check('Wohin geht der Mann?', 'Wohin geht der Mann', 73, None, None)


def test_non_initial_question_word_is_not_treated_as_answer(check):  # ref :183
    check('Wohin geht der Mann?', 'Und wohin geht der Mann', 73,
          None, None)


# subword question battery (reference :35-65) + wen positive (:82):
# round-5 additions — WH poles reach inside compounds (intcompound),
# governed welch- interrogatives answer with the compound-part span,
# and the fronted-object/nominative-man correction fixes the parses
SUBWORD_CASES = [
    (35, 'Was betrachtet man?', 'Informationsbetrachtung',
     45, 0, 11),
    (38, 'Welche Information betrachtet man?', 'Informationsbetrachtung',
     55, 0, 11),
    (41, 'Die Information betrachtet man.', 'Informationsbetrachtung',
     35, None, None),
    (44, 'Welche Information betrachtet man?',
     'Extraktionsinformationsbetrachtung', 55, 0, 22),
    (48, 'Die Information betrachtet man.',
     'Extraktionsinformationsbetrachtung', 35, None, None),
    (52, 'Welchen Löwen betrachten wir.',
     'Es gab einen Extraktionslöwen. Leute haben ihn betrachtet',
     54, 13, 29),
    (55, 'Den Löwen betrachten wir.',
     'Es gab einen Extraktionslöwen. Leute haben ihn betrachtet',
     34, None, None),
    # ref :82 records alternative_highest_score=104 for the model the
    # reference pins; our deterministic parse lands on that branch
    (82, 'Wen sah das Gebäude?', 'Das Gebäude sah die Person',
     104, 16, 26),
]


@pytest.mark.parametrize("ref_line,query,doc,expected,a_start,a_end",
                         SUBWORD_CASES,
                         ids=[f"sw{c[0]}" for c in SUBWORD_CASES])
def test_question_subword_case(check, ref_line, query, doc, expected,
                               a_start, a_end):
    check(query, doc, expected, a_start, a_end)
