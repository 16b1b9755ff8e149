"""DE topic-matching parity suite, transcribed from the reference's
tests/de/test_topic_matching_DE.py (reference line number per case).

Uses the reference's own scoring parameterization (relation 20,
reverse-only 15, single word 10, any-tag 5, cutoff 10 — ref :14-22;
unlike the EN suite the DE _check_equals keeps the DEFAULT frequency
thresholds 0.25/0.5, which all pass on these single-snippet corpora)
and asserts the reference's int(score). Exercises the DE-only logic:
compound-subword (intcompound) phraselets, Fugen-s splitting,
separable-verb conflation, genitive↔von, nominalized infinitives and
the German reverse-only parent lemmas (haben/sein/werden/machen/sagen).

NOT ported (documented gaps):
- 8 cases whose expected integers encode real de_core_news_lg cosines
  (Dach≈Haus, König≈Präsident, Königs-≈Prinz…) through
  word_embedding_match_threshold=0.42 (ref :57-100, :255-262, :345-356)
- the 4 hyphen-conjunction DICT tests (ref :414-460) asserting exact
  per-subword char spans in word_infos (the SCORE-level conjunction
  cases :203-213 ARE ported — subword borrowing is implemented)
- 'vier Ochsen und sechs Ochsen' (ref :163) — numeral POS ('vier' is
  NUM in the reference parse, a noun compound here)
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

# transcribed from reference tests/de/test_ontology.owl
from holmes_extractor_spark.fixtures import WORD_VECTORS_DE  # noqa: E402

REF_ONTOLOGY_DE = [
    ("jagd", "equivalentClass", "jagen"),
    ("komputerlinguistik", "equivalentClass", "linguistik"),
    ("komputerlinguistik", "equivalentClass", "sprachwissenschaft"),
    ("linguistik", "equivalentClass", "sprachwissenschaft"),
    ("monitor", "subClassOf", "hardware"),
    ("benötigen", "equivalentClass", "brauchen"),
]


@pytest.fixture(scope="module")
def score(spark):
    # mirrors the reference's DE _check_equals (ref :14-26): the DE
    # manager loads the DE test ontology (non-symmetric); embedding
    # matching stays off (no deterministic DE vector fixture — see
    # module docstring)
    def _score(query, doc, **kw):
        m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY_DE,
                               vectors=WORD_VECTORS_DE)
        m.parse_and_register_document(doc, "d", lang="de")
        tms = m.topic_match_documents_against(
            query, lang="de", relation_score=20,
            reverse_only_relation_score=15,
            single_word_score=10, single_word_any_tag_score=5,
            different_match_cutoff_score=10, **kw)
        return [t["score"] for t in tms]
    return _score


# (ref line, query, document, expected int score)
CASES = [
    (28, 'Eine Pflanze wächst', 'Eine Pflanze wächst', 34),
    (31, 'Ein Grünhaus steht', 'Ein Grün-Haus steht', 34),
    (34, 'Ein Gegwghg wächst', 'Ein Gegwghg wächst', 34),
    (37, 'Ein ENTITYPER singt', 'Richard Hudson singt', 34),
    (40, 'Ein ENTITYNOUN singt', 'Ein Vogel singt', 25),
    (43, 'nett', 'nett', 5),
    (46, 'netter Ort', 'nett', 5),
    (49, 'Eine beschriebene Sache', 'Eine beschriebene Sache', 34),
    (53, 'Der Esel hat ein Dach', 'Der Esel hat ein Dach', 68),
    (61, 'Der Esel hat ein Dach', 'Der Esel wird ein Dach haben', 69),
    (69, 'Der Esel hat ein Dach', 'Der Esel soll ein Dach haben', 69),
    (77, 'Der Esel macht ein Dach', 'Der Esel macht ein Dach', 68),
    (84, 'Der Esel malt ein Dach an', 'Der Esel malt ein Dach an', 82),
    (88, 'Der Esel malt ein Dach an', 'Der Esel malt eine Maus an', 34),
    (92, 'Ein Präsident ist ein Politiker',
     'Ein Präsident ist ein Politiker', 68),
    (96, 'Ein Präsident ist ein Politiker',
     'Ein Politiker ist ein Präsident', 24),
    (100, 'Ein Präsident wird ein Politiker',
     'Ein Präsident wird ein Politiker', 68),
    (108, 'Ein Esel hat ein Dach', 'Ein Esel hat ein Dach gesehen', 24),
    (116, 'Ein König mit einem Land', 'Ein Präsident mit einem Land', 29),
    (120, 'Ein König mit einem Land', 'Ein König mit einem Land', 75),
    (124, 'mit einer Idee', 'mit einer Idee', 29),
    (129, 'mit einer Extraktion', 'mit einer Informationsextraktion', 29),
    (134, 'Richard Paul Hudson kam', 'Ich sah Richard Paul Hudson', 10),
    (139, 'Hudson kam', 'Ich sah Richard Paul Hudson', 10),
    (144, 'Richard Paul kam', 'Ich sah Richard Paul Hudson', 9),
    (149, 'der müde Richard Paul Hudson', 'Ich sah Richard Paul Hudson', 10),
    (154, 'der müde Hudson', 'Ich sah Richard Paul Hudson', 10),
    (159, 'Richard Paul kam', 'Ich sah Richard Paul Hudson', 9),
    (168, 'Die Extraktion der Information', 'Informationsextraktion', 40),
    (173, 'Eine Symphonie des Mozarts', 'Mozartsymphonien', 40),
    (178, 'Informationsextraktion', 'Die Extraktion der Information', 29),
    (183, 'Mozartsymphonien', 'Eine Symphonie von Mozart', 29),
    (188, 'Informationsextraktion', 'Informationsextraktion', 10),
    (193, 'Mozartsymphonie', 'Mozartsymphonie', 10),
    (198, 'Mozartsymphonien', 'Mozartsymphonie', 20),
    (203, 'Mozart- und Beethovensymphonie', 'Mozartsymphonie', 20),
    (208, 'Mozartsymphonie', 'Mozart- und Beethovensymphonie', 19),
    (213, 'Mozart- und Mahlersymphonie', 'Mozart- und Beethovensymphonie', 19),
    (218, 'Katzenjagen', 'Ein Hund jagt eine Katze', 29),
    (223, 'Extraktion von Information und Entführung von Löwen',
     'Informationsextraktionsentführung von Löwen', 78),
    (228, 'Extraktion von Information und Löwen',
     'Informationsextraktion von Löwen', 87),
    (234, 'Komputerlinguistik', 'Linguistik', 9),
    (240, 'Theorielinguistik', 'Linguistik', 5),
    (246, 'Linguistik', 'Komputerlinguistik', 9),
    (250, 'Linguistik', 'Theorielinguistik', 10),
    (283, 'Informationextraktion', 'Informierung wird extrahiert', 29),
    (287, 'Informierung wird extrahiert', 'Informationsextraktion', 35),
    (291, 'Wohnungsverkauf', 'eine verkaufte Wohnung', 29),
    (295, 'eine verkaufte Wohnung', 'Wohnungsverkauf', 35),
]


@pytest.mark.parametrize("ref_line,query,doc,expected",
                         CASES, ids=[str(c[0]) for c in CASES])
def test_topic_case(score, ref_line, query, doc, expected):
    scores = score(query, doc)
    assert scores, f"ref :{ref_line}: no topic match"
    assert int(scores[0]) == expected, f"ref :{ref_line}"


def test_indexes(spark):  # ref :294
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Dies ist ein irrelevanter Satz. Ich glaube, dass eine Pflanze "
        "wächst.", "", lang="de")
    tms = m.topic_match_documents_against("Eine Pflanze wächst", lang="de")
    assert tms[0]["sentences_start_index"] == 6
    assert tms[0]["sentences_end_index"] == 13
    assert tms[0]["start_idx"] == 11
    assert tms[0]["end_idx"] == 12


def test_same_index_different_documents(spark):  # ref :305
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("Eine Pflanze wächst.", "1", lang="de")
    m.parse_and_register_document("Eine Pflanze wächst.", "2", lang="de")
    tms = m.topic_match_documents_against("Eine Pflanze wächst", lang="de")
    assert len(tms) == 2
    assert [t["url"] for t in tms] == ["1", "2"]
    assert all(t["start_idx"] == 1 and t["end_idx"] == 2 for t in tms)


def test_suppressed_relation_matching_picked_up_during_reverse_matching_subwords(spark):  # noqa: E501  ref :320
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Der König dankte ab. Die Königin dankte ab.", "", lang="de")
    tms = m.topic_match_documents_against(
        "Das Königabdanken", lang="de", relation_score=20,
        reverse_only_relation_score=15, single_word_score=10,
        single_word_any_tag_score=5, different_match_cutoff_score=10)
    assert int(tms[0]["score"]) == 29


def test_reverse_matching_suppressed_with_embedding_reverse_matching_parent(spark):  # noqa: E501  ref :332
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Der Prinz dankte ab. Jemand dankte ab. Jemand dankte ab.", "",
        lang="de")
    tms = m.topic_match_documents_against(
        "Das Königsabdanken", lang="de",
        word_embedding_match_threshold=0.42, relation_score=20,
        reverse_only_relation_score=15, single_word_score=10,
        single_word_any_tag_score=5, different_match_cutoff_score=10,
        relation_matching_frequency_threshold=1.0,
        embedding_matching_frequency_threshold=1.0,
        use_frequency_factor=False)
    assert int(tms[0]["score"]) == 5


def test_reverse_matching_suppressed_with_embedding_reverse_matching_child(spark):  # noqa: E501  ref :357
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Der König vom Abdanken. Das Abdanken. Das Abdanken.", "",
        lang="de")
    tms = m.topic_match_documents_against(
        "Die Abdankenprinzen", lang="de",
        word_embedding_match_threshold=0.42, relation_score=20,
        reverse_only_relation_score=15, single_word_score=10,
        single_word_any_tag_score=5, different_match_cutoff_score=10,
        relation_matching_frequency_threshold=1.0,
        embedding_matching_frequency_threshold=1.0,
        use_frequency_factor=False)
    assert int(tms[0]["score"]) == 5


def test_no_error(spark):  # ref :461
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "Ein Krankenhaus für demenzkranke Menschen", "", lang="de")
    m.topic_match_documents_against("Mein Kind ist krank", lang="de")


# (ref line, query, document, expected) — the reverse-only embedding
# battery (reference :53-124): word_embedding_match_threshold=0.42 over
# the deterministic WORD_VECTORS_DE fixture (dach≈haus 0.64,
# könig≈präsident 0.48 — band-engineered, see fixtures.py)
EMBEDDING_CASES = [
    (53, 'Der Esel hat ein Dach', 'Der Esel hat ein Dach', 68),
    (57, 'Der Esel hat ein Dach', 'Der Esel hat ein Haus', 48),
    (61, 'Der Esel hat ein Dach', 'Der Esel wird ein Dach haben', 69),
    (65, 'Der Esel hat ein Dach', 'Der Esel wird ein Haus haben', 47),
    (69, 'Der Esel hat ein Dach', 'Der Esel soll ein Dach haben', 69),
    (73, 'Der Esel hat ein Dach', 'Der Esel soll ein Haus haben', 47),
    (77, 'Der Esel macht ein Dach', 'Der Esel macht ein Dach', 68),
    (81, 'Der Esel macht ein Dach', 'Der Esel macht ein Haus', 48),
    (85, 'Der Esel malt ein Dach an', 'Der Esel malt ein Dach an', 82),
    (89, 'Der Esel malt ein Dach an', 'Der Esel malt eine Maus an', 34),
    (93, 'Ein Präsident ist ein Politiker',
     'Ein Präsident ist ein Politiker', 68),
    (97, 'Ein Präsident ist ein Politiker',
     'Ein Politiker ist ein Präsident', 24),
    (101, 'Ein Präsident wird ein Politiker',
     'Ein Präsident wird ein Politiker', 68),
    (109, 'Ein Esel hat ein Dach', 'Ein Esel hat ein Dach gesehen', 24),
    (113, 'Ein König mit einem Land', 'Ein Präsident mit einem Land', 48),
]


@pytest.mark.parametrize("ref_line,query,doc,expected",
                         EMBEDDING_CASES,
                         ids=[f"emb{c[0]}" for c in EMBEDDING_CASES])
def test_topic_embedding_case(score, ref_line, query, doc, expected):
    scores = score(query, doc, word_embedding_match_threshold=0.42)
    assert scores, f"ref :{ref_line}: no topic match"
    assert int(scores[0]) == expected, f"ref :{ref_line}"


def test_double_match(score):  # ref :165
    scores = score('vier Ochsen und sechs Ochsen', 'vier Ochsen',
                   word_embedding_match_threshold=0.42)
    assert int(scores[0]) == 34


def test_embedding_matching_with_subwords(score):  # ref :257
    scores = score('Eine Königsabdanken', 'Der Prinz dankte ab',
                   word_embedding_match_threshold=0.42)
    assert int(scores[0]) == 15


def test_embedding_matching_with_subwords_control(score):  # ref :262
    scores = score('Eine Königsabdanken', 'Der Prinz dankte ab')
    assert int(scores[0]) == 5


# ---- full-dict assertions at DEFAULT scores (reference :380-456);
# the reference's word_infos rows are [start, end, type,
# is_highest_activation, explanation]

@pytest.fixture(scope="module")
def dicts(spark):
    def _dicts(query, doc):
        m = SparkHolmesManager(spark)
        m.parse_and_register_document(doc, "", lang="de")
        return m.topic_match_documents_against(query, lang="de")
    return _dicts


def _wi(t):
    return [[w["relative_start_index"], w["relative_end_index"],
             w["type"], w["is_highest_activation"], w["explanation"]]
            for w in t["word_infos"]]


def test_disjunct_relation_mapping_within_subword_dictionaries(dicts):
    # ref :380
    t = dicts('Symphonie von Information und Entführung von Löwen',
              'Informationssymphonieentführung von Löwen')[0]
    assert t["score"] == pytest.approx(780.0)
    assert t["index_within_document"] == 2
    assert t.get("subword_index") is None
    assert _wi(t) == [
        [0, 11, 'relation', False, 'Matches INFORMATION directly.'],
        [12, 21, 'relation', False, 'Matches SYMPHONIE directly.'],
        [21, 31, 'relation', False, 'Matches ENTFÜHRUNG directly.'],
        [36, 41, 'relation', True, 'Matches LÖWE directly.']]


def test_overlapping_relation_mapping_within_subword_dictionaries(dicts):
    # ref :391
    t = dicts('Extraktion von Information und Löwen',
              'Informationsextraktion von Löwen')[0]
    assert t["score"] == pytest.approx(1023.3333333333334)
    assert _wi(t) == [
        [0, 11, 'overlapping_relation', False,
         'Matches INFORMATION directly.'],
        [12, 22, 'overlapping_relation', False,
         'Matches EXTRAKTION directly.'],
        [27, 32, 'overlapping_relation', True,
         'Matches LÖWE directly.']]


def test_subword_dictionaries_subword_is_not_peak(dicts):  # ref :402
    t = dicts('Informationsnehmen der Löwen',
              'Information und Löwen wurden genommen')[0]
    assert t["score"] == pytest.approx(987.6)
    assert t["index_within_document"] == 4
    assert _wi(t) == [
        [0, 11, 'overlapping_relation', False,
         'Matches INFORMATION directly.'],
        [16, 21, 'overlapping_relation', False,
         'Matches LÖWE directly.'],
        [29, 37, 'overlapping_relation', True,
         'Matches NEHMEN directly.']]


def test_subword_conjunction_within_dictionaries_single_word_hyphen_first_word(dicts):  # noqa: E501  ref :413
    t = dicts('Extraktion', 'Informations- und Informationsextraktion')[0]
    assert t["score"] == pytest.approx(50.0)
    assert t["index_within_document"] == 2
    assert t["subword_index"] == 1
    assert _wi(t) == [[30, 40, 'single', True,
                       'Matches EXTRAKTION directly.']]


def test_subword_conjunction_within_dictionaries_single_word_hyphen_second_word(dicts):  # noqa: E501  ref :424
    t = dicts('Information', 'Informationsextraktion und -extraktion')[0]
    assert t["score"] == pytest.approx(50.0)
    assert t["index_within_document"] == 0
    assert t["subword_index"] == 0
    assert _wi(t) == [[0, 11, 'single', True,
                       'Matches INFORMATION directly.']]


def test_subword_conjunction_within_dictionaries_relation_hyphen_first_word(dicts):  # noqa: E501  ref :435
    t = dicts('Das Abdanken eines Königs', 'Ein Königs- und Prinzenabdanken')[0]
    assert t["score"] == pytest.approx(390.6666666666667)
    assert t["index_within_document"] == 3
    assert t["subword_index"] == 1
    assert _wi(t) == [
        [4, 9, 'relation', False, 'Matches KÖNIG directly.'],
        [23, 31, 'relation', True, 'Matches ABDANKEN directly.']]


def test_subword_conjunction_within_dictionaries_relation_hyphen_second_word(dicts):  # noqa: E501  ref :446
    t = dicts('Der Prinz eines Königs', 'Ein Königsabdanken und -prinz')[0]
    assert t["score"] == pytest.approx(398.6666666666667)
    assert t["index_within_document"] == 3
    assert t["subword_index"] == 1
    assert _wi(t) == [
        [4, 9, 'relation', False, 'Matches KÖNIG directly.'],
        [24, 29, 'relation', True, 'Matches PRINZ directly.']]
