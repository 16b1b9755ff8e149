"""EN topic-matching parity suite, transcribed from the reference's
tests/en/test_topic_matching_EN.py (reference line number per case).

Uses the reference's own scoring parameterization (relation 20,
reverse-only 15, single word 10, any-tag 5, cutoff 10 — ref :18-30)
and asserts the reference's int(score): the activation model
(parent-anchored decay, upfront overlap map, ×1.5 overlap), reverse
and forward dependency-implication matching, multiword/member word
phraselets with superfluous-match suppression, coref-proximity
dominance, entity word matching, ontology penalties
0.9^(|depth|+1) and frequency factors 1-log(f-1)/log(max) reproduce
the reference's integer scores exactly on these cases.

NOT ported (documented gaps):
- 12 cases relying on real spaCy vectors through
  word_embedding_match_threshold=0.42 (car≈automobile≈vehicle,
  friend≈GPE-prototype …) — the expected integers encode those exact
  cosines, which no deterministic stand-in vector table can reproduce
  (ref :101-105, :202, :245-257, :273-289, :297, :491-521)
- 5 near-misses (off by 1-4) from the ontology-mediated derivation
  penalty asymmetry: the reference routes query 'wastage horse' →
  document 'waste horse' through ontology_reverse_derivational_dict
  (one extra 0.9 step) while the opposite direction is a plain
  derivation match (ref :714-750)
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

from tests.test_structural_matching_en_ported import REF_ONTOLOGY


@pytest.fixture(scope="module")
def score(spark):
    # mirrors the reference's _check_equals (ref :18-30): vectors come
    # off the model there / off the deterministic WORD_VECTORS fixture
    # here, with the same per-call word_embedding_match_threshold=0.42
    from holmes_extractor_spark.fixtures import WORD_VECTORS

    def _score(query, doc, **kw):
        m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                               ontology_symmetric=True,
                               vectors=WORD_VECTORS)
        m.parse_and_register_document(doc, "d")
        kw.setdefault("word_embedding_match_threshold", 0.42)
        kw.setdefault("relation_matching_frequency_threshold", 0.0)
        kw.setdefault("embedding_matching_frequency_threshold", 0.0)
        tms = m.topic_match_documents_against(
            query, relation_score=20, reverse_only_relation_score=15,
            single_word_score=10, single_word_any_tag_score=5,
            different_match_cutoff_score=10, **kw)
        return [t["score"] for t in tms]
    return _score


# (ref line, query, document, expected int score)
CASES = [
    (49, 'A plant grows', 'A plant grows', 34),
    (53, 'A plant grows', 'A plant grows. A plant', 34),
    (57, 'A plant grows', 'A plant grows. A plant and a plant', 16),
    (65, 'A plant grows', 'A plant grows. A plant and a plant. Word word word word word.', 22),
    (69, 'A plant grows', 'A plant grows. A plant grows.', 34),
    (73, 'A plant grows', 'A plant grows. A plant grows. A plant grows.', 8),
    (77, 'A plant grows', 'A plant grows. A plant grows. A plant grows. Word word word word word.', 14),
    (81, 'My friend visited gegwghg', 'Peter visited gegwghg', 34),
    (85, 'I gave Peter a dog', 'I gave Peter a present', 34),
    (89, 'A plant grows', 'I saw a plant. It was growing', 34),
    (93, 'My house visited ENTITYGPE', 'Peter visited London', 34),
    (97, 'My house visited ENTITYGPE', 'Peter visited Paris. London. Berlin.', 15),
    (109, 'My friend visited ENTITYNOUN', 'Peter visited a city', 25),
    (113, 'My friend visited ENTITYNOUN', 'Peter visited a city. Word. word.', 25),
    (118, 'I saw an pussy', 'Somebody saw a cat', 31),
    (123, 'I saw an pussy', 'Somebody saw a cat. A cat. A cat.', 14),
    (128, 'I saw an pussy', 'Somebody saw a cat. A kitten. A cat.', 31),
    (133, 'I saw an animal', 'Somebody saw a cat', 28),
    (138, 'I saw an animal', 'Somebody saw a cat. An cat. A cat.', 13),
    (143, 'I saw an animal', 'Somebody saw a cat. An kitten. A cat.', 28),
    (148, 'I saw an animal', 'Somebody saw a kitten', 26),
    (153, 'I saw an cat', 'Somebody saw an animal', 28),
    (158, 'I saw a kitten', 'Somebody saw an animal', 26),
    (163, 'A cat opens something', 'An animal takes something out', 27),
    (168, 'I saw an animal', 'Somebody saw Mimi Momo', 26),
    (173, 'I saw an animal', 'Somebody saw Mimi Momo. Mimi Momo. Mimi Momo.', 12),
    (178, 'I saw an animal', 'Somebody saw Mimi Momo. Momo. Momo.', 26),
    (183, 'I saw Mimi Momo', 'Somebody saw an animal', 26),
    (188, 'I saw an animal', 'Somebody chased a cat', 8),
    (193, 'I saw an animal', 'Somebody chased Mimi Momo', 7),
    (198, 'I saw Mimi Momo', 'Somebody chased an animal', 7),
    (231, 'nice', 'nice', 5),
    (234, 'nice place', 'nice', 5),
    (237, 'The donkey has a roof', 'The donkey has a roof', 68),
    (241, 'A friend has a roof', 'I saw a friend and I saw a roof. He had it.', 68),
    (249, 'The donkey paints a roof', 'The donkey paints a roof', 82),
    (257, 'The donkey paints a roof', 'The donkey paints a mouse', 34),
    (261, 'A president is a politician', 'A president is a politician', 68),
    (265, 'A president is a politician', 'A politician is a president', 24),
    (269, 'A donkey has a roof', 'A donkey has painted a roof', 24),
    (293, 'An ENTITYPERSON with a car', 'Richard Hudson with a lion', 14),
    (301, 'An ENTITYNOUN with a car', 'Richard Hudson with a vehicle', 5),
    (305, 'An ENTITYNOUN with a car', 'Richard Hudson with a lion', 5),
    (309, 'A car with an ENTITYNOUN', 'A vehicle with Richard Hudson', 5),
    (313, 'Richard Hudson speaks', 'Richard-Hudson speaks', 34),
    (525, 'Somebody buys a vehicle', 'Somebody buys a vehicle and a car', 34),
    (530, 'with an idea', 'with an idea', 29),
    (535, 'dog', 'a dog and a dog', 10),
    (540, 'in', 'in and in', 5),
    (545, 'a big dog', 'a big dog and a big dog', 34),
    (550, 'a big dog', 'a big and big dog', 34),
    (555, 'in Germany', 'in Germany and in Germany', 29),
    (560, 'in Germany', 'in Germany and Germany', 29),
    (565, 'Richard Paul Hudson came', 'I saw Richard Paul Hudson', 10),
    (570, 'Hudson came', 'I saw Richard Paul Hudson', 10),
    (575, 'Richard Paul came', 'I saw Richard Paul Hudson', 9),
    (580, 'Richard Paul Hudson came', 'I saw Richard Paul Hudson. He came', 34),
    (585, 'Richard Paul Hudson came', 'I saw Richard Paul Hudson. Hudson came', 39),
    (590, 'Hudson came', 'I saw Richard Paul Hudson. He came', 34),
    (595, 'the tired Richard Paul Hudson', 'I saw Richard Paul Hudson', 10),
    (600, 'the tired Hudson', 'I saw Richard Paul Hudson', 10),
    (605, 'the tired Richard Paul', 'I saw Richard Paul Hudson', 9),
    (610, 'the tired Richard Paul Hudson', 'I saw Richard Paul Hudson. He came', 10),
    (615, 'the tired Hudson came', 'I saw Richard Paul Hudson. He came', 34),
    (620, 'Richard Paul Hudson came', 'I saw Richard Paul Hudson', 10),
    (625, 'the tired Richard Paul Hudson', 'I saw Richard Paul Hudson', 10),
    (630, 'Richard Paul Hudson came', 'I saw Richard Paul Hudson', 10),
    (635, 'the tired Richard Paul Hudson', 'I saw Richard Paul Hudson', 10),
    (640, 'the mirror of Erised', 'the mirror of Erised', 39),
    (645, 'information', 'inform', 10),
    (650, 'information', 'inform. inform. inform.', 3),
    (655, 'give', 'gift', 5),
    (660, 'information', 'information', 10),
    (665, 'inform quickly', 'quick information', 29),
    (670, 'quick information', 'inform quickly', 34),
    (675, 'quick information', 'quick information', 34),
    (680, 'He decided to inform', 'He decided information', 29),
    (685, 'He decided information', 'He decided to inform', 34),
    (690, 'He decided information', 'He decided information', 34),
    (696, 'An invitation to a politician', 'He explained to a politician', 35),
    (702, 'He explained to a politician', 'An invitation to a politician', 31),
    (708, 'He used a waste horse', 'He used a wastage horse', 34),
    (732, 'A big waste horse', 'A big wastage horse', 34),
    (738, 'A big wastage horse', 'A big waste horse', 34),
    (755, 'An adopted child', 'Someone adopts a child', 34),
    (760, 'Someone adopts a child', 'An adopted child', 34),
    (765, 'Adopted and child', 'An adopted child', 14),
    (770, 'A leg is hard to stretch', 'He stretched his legs.', 34),
    (775, 'A leg is hard to fix', 'He stretched his legs.', 10),
]


@pytest.mark.parametrize("ref,query,doc,expected", CASES,
                         ids=[str(c[0]) + " " + c[1][:24] for c in CASES])
def test_topic_score(score, ref, query, doc, expected):
    scores = score(query, doc)
    assert scores, f"test_topic_matching_EN.py:{ref}: no match"
    assert int(scores[0]) == expected, f"test_topic_matching_EN.py:{ref}"


def test_no_match(score):  # ref :33
    assert score("fewfew", "A plant grows") == []


def test_no_match_stopwords(score):  # ref :41
    assert score("then", "then") == []


def test_coreference_double_match_spans(spark):
    # ref :780-815 — the closest coreferring mention wins and the
    # passage span includes the trailing word matches
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                           ontology_symmetric=True)
    m.parse_and_register_document("I saw a man. The man walked", "d")
    tms = m.topic_match_documents_against(
        "A man walks", relation_score=20, single_word_score=10,
        single_word_any_tag_score=5)
    assert int(tms[0]["score"]) == 34
    assert (tms[0]["start_idx"], tms[0]["end_idx"]) == (6, 7)


# --------------------------- frequency-gated suppression (ref :317-490)
# these drive relation_matching_frequency_threshold /
# embedding_matching_frequency_threshold explicitly — the gates always
# run off corpus frequencies even when use_frequency_factor=False
# (score deflation off, planning on; reference manager.py:736 +
# topic_matching.py:379-549)

SUPPRESSION_CASES = [
    (":317", "A dog chases a cat.",
     "A dog chases a cat. A dog sees a cat. A dog sees a cat. "
     "A person was chasing a person. A person chased a person.", 24,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (":328", "A dog chases a cat",
     "Chasing. Chasing. A dog chases a cat. A lion chases a tiger.", 82,
     dict(relation_matching_frequency_threshold=0.9,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (":340", "A dog chases a cat",
     "There was a cat. A dog chased it. A lion chases a tiger. "
     "Chasing. Chasing. ", 84,
     dict(relation_matching_frequency_threshold=0.9,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (":352", "An adopted child",
     "Someone adopts the child. The child is here. Children. Children. "
     "Children.", 34,
     dict(relation_matching_frequency_threshold=0.9,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (":365", "in Germany",
     "I was in Germany. I know Germany. Germany. Germany.", 10,
     dict(relation_matching_frequency_threshold=0.1,
          embedding_matching_frequency_threshold=0.6)),
    (":385", "in Germany",
     "I was in Germany. I know Germany. Germany. Germany.", 7,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0)),
    (":443", "tired ENTITYPERSON",
     "I was tired Richard Paul Hudson. I was a tired Richard Paul "
     "Hudson. I spoke to Richard Paul Hudson and he was tired.", 14,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (":454", "tired ENTITYPERSON",
     "I was tired Richard Paul Hudson. I was a tired Richard Paul "
     "Hudson. I spoke to Richard Paul Hudson and he was tired.", 34,
     dict(relation_matching_frequency_threshold=0.0,
          embedding_matching_frequency_threshold=0.0,
          use_frequency_factor=False)),
    (":465", "someone knows an ENTITYPERSON",
     "I knew Richard Paul Hudson. I knew Richard Paul Hudson. I knew "
     "someone and spoke to Richard Paul Hudson.", 14,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (":478", "someone knows an ENTITYPERSON",
     "I knew Richard Paul Hudson. I knew Richard Paul Hudson. I knew "
     "someone and spoke to Richard Paul Hudson.", 34,
     dict(relation_matching_frequency_threshold=0.0,
          embedding_matching_frequency_threshold=0.0,
          use_frequency_factor=False)),
]


@pytest.mark.parametrize("ref,query,doc,expected,kw", SUPPRESSION_CASES,
                         ids=[c[0] + " " + c[1][:22]
                              for c in SUPPRESSION_CASES])
def test_topic_suppression(spark, ref, query, doc, expected, kw):
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                           ontology_symmetric=True)
    m.parse_and_register_document(doc, "d")
    tms = m.topic_match_documents_against(
        query, relation_score=20, reverse_only_relation_score=15,
        single_word_score=10, single_word_any_tag_score=5,
        different_match_cutoff_score=10, **kw)
    assert tms, f"test_topic_matching_EN.py{ref}: no match"
    assert int(tms[0]["score"]) == expected, \
        f"test_topic_matching_EN.py{ref}"


# ------------------- indexes / passage spans (ref :816-905, :966-976)
# These exercise the reference's sentence expansion + char-span
# reporting through our column names: url=document_label,
# passage_text=text, start_idx=start_index, end_idx=end_index.

def _mgr(spark, *docs):
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                           ontology_symmetric=True)
    for text, label in docs:
        m.parse_and_register_document(text, label)
    return m


IRRELEVANT = (" A great deal of irrelevant text." * 15).strip()


def test_indexes(spark):  # ref :816
    m = _mgr(spark, ("This is an irrelevant sentence. I think a plant "
                     "grows.", "d"))
    tms = m.topic_match_documents_against("A plant grows")
    assert tms[0]["sentences_start_index"] == 6
    assert tms[0]["sentences_end_index"] == 11
    assert tms[0]["start_idx"] == 9
    assert tms[0]["end_idx"] == 10


def test_indexes_with_preceding_non_matched_dependent(spark):  # ref :827
    m = _mgr(spark, ("I saw a big dog.", "d"))
    tms = m.topic_match_documents_against("A big dog")
    assert tms[0]["sentences_start_index"] == 0
    assert tms[0]["sentences_end_index"] == 5
    assert tms[0]["start_idx"] == 3
    assert tms[0]["end_idx"] == 4


def test_only_one_result_per_document(spark):  # ref :849
    doc = "Peter came home." + IRRELEVANT + " Peter came home."
    m = _mgr(spark, (doc, "d"))
    assert len(m.topic_match_documents_against("Peter")) == 2
    assert len(m.topic_match_documents_against(
        "Peter", only_one_result_per_document=True)) == 1


def test_match_cutoff(spark):  # ref :867
    doc = "A cat. " + IRRELEVANT + " The dog chased the cat."
    m = _mgr(spark, (doc, "d"))
    tms = m.topic_match_documents_against("The dog chased the cat")
    # two activation peaks separated by > sideways_match_extent split
    # into separate results; the relation-bearing one wins
    assert tms[0]["start_idx"] > 90
    assert "dog chased the cat" in tms[0]["passage_text"]


def test_result_ordering_by_match_length_different_documents_2(spark):
    # ref :886
    doc = ("A dog chased a cat. " + IRRELEVANT
           + " A dog chased a cat. A cat")
    m = _mgr(spark, (doc, "d"))
    tms = m.topic_match_documents_against("The dog chased the cat")
    assert tms[0]["end_idx"] - tms[0]["start_idx"] == 6
    assert tms[1]["end_idx"] - tms[1]["start_idx"] == 3


def test_result_ordering_by_match_length_different_documents_1(spark):
    # ref :966
    m = _mgr(spark, ("A dog chased a cat.", "1"),
             ("A dog chased a cat. A cat.", "2"))
    tms = m.topic_match_documents_against("The dog chased the cat")
    assert tms[0]["end_idx"] == 7
    assert tms[1]["end_idx"] == 4


# ----------------------------- dictionaries (ref :906-965, :1043-1100)

def _wi(tm):
    """word_infos as the reference's [start, end, type, peak, expl]."""
    return [[w["relative_start_index"], w["relative_end_index"],
             w["type"], w["is_highest_activation"], w["explanation"]]
            for w in tm["word_infos"]]


def test_dictionaries(spark):  # ref :906
    doc = ("A dog chased a cat. " + IRRELEVANT
           + " A dog chased a cat. A cat. Another irrelevant sentence.")
    m = _mgr(spark, (doc, ""), ("Dogs and cats.", "animals"))
    tms = m.topic_match_documents_against(
        "The dog chased the cat", use_frequency_factor=False)
    assert [t["url"] for t in tms] == ["", "", "animals"]
    assert [t["rank"] for t in tms] == ["1=", "1=", "3"]
    t0, t1, t2 = tms
    assert t0["passage_text"] == "A dog chased a cat. A cat."
    assert int(t0["score"]) == 993
    assert _wi(t0) == [
        [2, 5, "overlapping_relation", False, "Matches DOG directly."],
        [6, 12, "overlapping_relation", False, "Matches CHASE directly."],
        [15, 18, "overlapping_relation", True, "Matches CAT directly."],
        [22, 25, "single", False, "Matches CAT directly."]]
    assert t1["passage_text"] == "A dog chased a cat."
    assert int(t1["score"]) == 993
    assert (t1["sentences_character_start_index"],
            t1["sentences_character_end_index"]) == (0, 19)
    assert _wi(t1) == [
        [2, 5, "overlapping_relation", False, "Matches DOG directly."],
        [6, 12, "overlapping_relation", False, "Matches CHASE directly."],
        [15, 18, "overlapping_relation", True, "Matches CAT directly."]]
    assert t2["passage_text"] == "Dogs and cats."
    assert int(t2["score"]) == 98
    assert (t2["sentences_character_start_index"],
            t2["sentences_character_end_index"]) == (0, 14)
    assert _wi(t2) == [
        [0, 4, "single", False, "Matches DOG directly."],
        [9, 13, "single", True, "Matches CAT directly."]]
    # tied_result_quotient=0.01 chains all three into one tie group
    tms = m.topic_match_documents_against(
        "The dog chased the cat", tied_result_quotient=0.01,
        use_frequency_factor=False)
    assert [t["rank"] for t in tms] == ["1=", "1=", "1="]


def test_dictionaries_with_multiword_in_relation_not_final(spark):
    # ref :923
    m = _mgr(spark, ("Richard Paul Hudson came home", ""))
    tms = m.topic_match_documents_against("Richard Paul Hudson was coming")
    t = tms[0]
    assert t["rank"] == "1"
    assert t["passage_text"] == "Richard Paul Hudson came home"
    assert (t["start_idx"], t["end_idx"]) == (0, 3)
    assert int(t["score"]) == 369
    assert _wi(t) == [
        [0, 19, "relation", False,
         "Matches RICHARD PAUL HUDSON directly."],
        [20, 24, "relation", True, "Matches COME directly."]]


def test_dictionaries_with_multiword_alone(spark):  # ref :934
    m = _mgr(spark, ("Richard Paul Hudson", ""))
    tms = m.topic_match_documents_against("Richard Paul Hudson")
    t = tms[0]
    assert t["passage_text"] == "Richard Paul Hudson"
    assert int(t["score"]) == 50
    assert _wi(t) == [[0, 19, "single", True,
                       "Matches RICHARD PAUL HUDSON directly."]]


def test_dictionaries_with_multiword_alone_and_entity_token(spark):
    # ref :944
    m = _mgr(spark, ("Richard Paul Hudson", ""))
    tms = m.topic_match_documents_against("ENTITYPERSON")
    t = tms[0]
    assert int(t["score"]) == 50
    assert _wi(t) == [[0, 19, "single", True,
                       "Has an entity label matching ENTITYPERSON."]]


def test_dictionaries_with_multiword_as_single_word_and_relation(spark):
    # ref :955 — 'harry' is an ontology synonym of the document
    # multiword 'harry potter'
    m = _mgr(spark, ("Can somebody give Harry Potter his present", ""))
    tms = m.topic_match_documents_against("Somebody gives a present to Harry")
    t = tms[0]
    assert int(t["score"]) == 922
    assert (t["start_idx"], t["end_idx"]) == (2, 6)
    assert _wi(t) == [
        [13, 17, "overlapping_relation", False, "Matches GIVE directly."],
        [18, 30, "overlapping_relation", False,
         "Is a synonym of HARRY in the ontology."],
        [35, 42, "overlapping_relation", True,
         "Matches PRESENT directly."]]


def test_adjective_describing_entity_multiword_dicts(spark):  # ref :1054
    m = _mgr(spark, ("A big Richard Paul Hudson", ""))
    tms = m.topic_match_documents_against("A big Richard Paul Hudson")
    t = tms[0]
    assert int(t["score"]) == 369
    assert (t["start_idx"], t["end_idx"]) == (1, 4)
    assert _wi(t) == [
        [2, 5, "relation", False, "Matches BIG directly."],
        [6, 25, "relation", True,
         "Matches RICHARD PAUL HUDSON directly."]]


def test_adjective_describing_double_multiword_dicts_1(spark):  # ref :1066
    m = _mgr(spark, ("A big Richard Pranaya Jones", ""))
    tms = m.topic_match_documents_against("A big Richard Pranaya Jones")
    t = tms[0]
    assert int(t["score"]) == 1017
    assert _wi(t) == [
        [2, 5, "overlapping_relation", False, "Matches BIG directly."],
        [6, 13, "overlapping_relation", False, "Matches RICHARD directly."],
        [14, 27, "overlapping_relation", True,
         "Matches PRANAYA JONES directly."]]


def test_adjective_describing_double_multiword_dicts_2(spark):  # ref :1078
    m = _mgr(spark, ("A big Richard Pranaya Jones", ""))
    tms = m.topic_match_documents_against("A big Pranaya Jones")
    t = tms[0]
    assert int(t["score"]) == 369
    assert _wi(t) == [
        [2, 5, "relation", False, "Matches BIG directly."],
        [14, 27, "relation", True, "Matches PRANAYA JONES directly."]]


def test_adjective_describing_double_multiword_dicts_3(spark):  # ref :1090
    m = _mgr(spark, ("A big Richard Pranaya Jones", ""))
    tms = m.topic_match_documents_against("A big Jones")
    t = tms[0]
    assert int(t["score"]) == 369
    assert _wi(t) == [
        [2, 5, "relation", False, "Matches BIG directly."],
        [22, 27, "relation", True, "Matches JONES directly."]]


# ------------------------- match cutoff score variants (ref :1101-1154)

def test_different_match_cutoff_score_low(spark):  # ref :1101
    m = _mgr(spark, ("A dog and a dog then and then and then and then "
                     "and then a dog", ""))
    assert len(m.topic_match_documents_against("A dog")) == 1


def test_different_match_cutoff_score_high(spark):  # ref :1111, :1252
    m = _mgr(spark, ("A dog then and then and then and then and then "
                     "a dog", ""))
    assert len(m.topic_match_documents_against(
        "A dog", different_match_cutoff_score=10000)) == 2


def test_different_match_cutoff_score_zero(spark):  # ref :1125
    m = _mgr(spark, ("A dog then and then and then and then and then "
                     "a dog", ""))
    assert len(m.topic_match_documents_against(
        "A dog", different_match_cutoff_score=0)) == 1


def test_different_match_cutoff_score_control(spark):  # ref :1140, :1264
    m = _mgr(spark, ("A dog then and then and then and then and then "
                     "a dog", ""))
    assert len(m.topic_match_documents_against("A dog")) == 1


# --------------------- frequency factor corpora (ref :1155-1219)

@pytest.fixture(scope="module")
def ff_mgr(spark):
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY)
    m.parse_and_register_document("I saw a dog. It was chasing a cat",
                                  "specific")
    m.parse_and_register_document("The dog chased the animal", "exact")
    m.parse_and_register_document("The cat chased the dog",
                                  "specific-reversed")
    m.parse_and_register_document("The animal chased the dog",
                                  "exact-reversed")
    return m


def test_one_worker_frequency_factor(ff_mgr):  # ref :1155 (+:1177 2-worker)
    assert ff_mgr.document_labels() == [
        "exact", "exact-reversed", "specific", "specific-reversed"]
    tms = ff_mgr.topic_match_documents_against(
        "A dog chases an animal", relation_score=30,
        reverse_only_relation_score=20, single_word_score=5,
        single_word_any_tag_score=2, different_match_cutoff_score=5,
        relation_matching_frequency_threshold=0.2)
    assert [t["url"] for t in tms] == [
        "exact", "specific", "exact-reversed", "specific-reversed"]
    assert [t["rank"] for t in tms] == ["1=", "1=", "3=", "3="]
    assert [int(t["score"]) for t in tms] == [17, 15, 8, 7]
    assert _wi(tms[0]) == [
        [4, 7, "overlapping_relation", False, "Matches DOG directly."],
        [8, 14, "overlapping_relation", False, "Matches CHASE directly."],
        [19, 25, "overlapping_relation", True,
         "Matches ANIMAL directly."]]
    assert _wi(tms[1]) == [
        [8, 11, "overlapping_relation", False, "Matches DOG directly."],
        [20, 27, "overlapping_relation", False, "Matches CHASE directly."],
        [30, 33, "overlapping_relation", True,
         "Is a child of ANIMAL in the ontology."]]
    assert _wi(tms[2]) == [
        [4, 10, "single", False, "Matches ANIMAL directly."],
        [11, 17, "relation", False, "Matches CHASE directly."],
        [22, 25, "relation", True,
         "Is a child of ANIMAL in the ontology."]]
    assert _wi(tms[3]) == [
        [4, 7, "single", False, "Is a child of ANIMAL in the ontology."],
        [8, 14, "relation", False, "Matches CHASE directly."],
        [19, 22, "relation", True,
         "Is a child of ANIMAL in the ontology."]]


def test_number_of_results(ff_mgr):  # ref :1198
    tms = ff_mgr.topic_match_documents_against(
        "A dog chases an animal", number_of_results=3,
        use_frequency_factor=True, relation_score=30,
        reverse_only_relation_score=20, single_word_score=5,
        single_word_any_tag_score=2, different_match_cutoff_score=5,
        relation_matching_frequency_threshold=0.2)
    assert [t["url"] for t in tms] == ["exact", "specific",
                                       "exact-reversed"]
    # cut to 3 results, the third loses its tie partner → plain '3'
    assert [t["rank"] for t in tms] == ["1=", "1=", "3"]


# ------------------- label filtering (ref :978-1042, :1220-1250)

def test_filtering_with_topic_matches(spark):  # ref :978 + :1220
    m = _mgr(spark, *[("The dog chased the cat", lab)
                      for lab in ("T11", "T12", "T21", "T22")])
    q = "The dog chased the cat"
    assert len(m.topic_match_documents_against(q)) == 4
    assert len(m.topic_match_documents_against(
        q, document_label_filter="T")) == 4
    assert len(m.topic_match_documents_against(
        q, document_label_filter="T1")) == 2
    assert len(m.topic_match_documents_against(
        q, document_label_filter="T22")) == 1
    assert len(m.topic_match_documents_against(
        q, document_label_filter="X")) == 0


# --------------------------- round-4b additions (refs :245-:1092)

def test_reverse_only_parent_lemma_twoway(score):  # ref :245
    assert int(score("The donkey has a roof",
                     "The donkey has a house")[0]) == 47


def test_reverse_only_parent_lemma_twoway_control(score):  # ref :253
    assert int(score("The donkey paints a roof",
                     "The donkey paints a house")[0]) == 58


def test_coreference_double_match_on_governor(spark):  # ref :792
    m = _mgr(spark, ("I saw a big man. The man walked", "d"))
    tms = m.topic_match_documents_against(
        "A big man", relation_score=20, single_word_score=10,
        single_word_any_tag_score=5)
    assert int(tms[0]["score"]) == 34
    assert tms[0]["sentences_start_index"] == 0
    assert tms[0]["sentences_end_index"] == 8
    assert (tms[0]["start_idx"], tms[0]["end_idx"]) == (3, 7)


def test_coreference_double_match_same_distance(spark):  # ref :804
    m = _mgr(spark, ("The man was big. Man walked.", "d"))
    tms = m.topic_match_documents_against(
        "A big man", relation_score=20, single_word_score=10,
        single_word_any_tag_score=5)
    assert int(tms[0]["score"]) == 34
    assert tms[0]["sentences_start_index"] == 0
    assert tms[0]["sentences_end_index"] == 7
    assert (tms[0]["start_idx"], tms[0]["end_idx"]) == (1, 5)


def test_indexes_with_subsequent_non_matched_dependent(spark):  # ref :838
    m = _mgr(spark, ("The dog I saw was big.", "d"))
    tms = m.topic_match_documents_against("A big dog")
    assert tms[0]["sentences_start_index"] == 0
    assert tms[0]["sentences_end_index"] == 6
    assert (tms[0]["start_idx"], tms[0]["end_idx"]) == (1, 5)


def test_filtering_with_topic_match_dictionaries(spark):  # ref :1010
    m = _mgr(spark, *[("The dog chased the cat", lab)
                      for lab in ("U11", "U12", "U21", "U22")])
    q = "The dog chased the cat"
    assert len(m.topic_match_documents_against(
        q, document_label_filter="U")) == 4
    assert len(m.topic_match_documents_against(
        q, document_label_filter="U2")) == 2


def test_adjective_describing_ontology_multiword_dicts(spark):  # ref :1043
    m = _mgr(spark, ("A big Unhyphenated Single Multiword", ""))
    tms = m.topic_match_documents_against("A big Unhyphenated Single Multiword")
    t = tms[0]
    assert int(t["score"]) == 369
    assert (t["start_idx"], t["end_idx"]) == (1, 4)
    assert _wi(t) == [
        [2, 5, "relation", False, "Matches BIG directly."],
        [6, 35, "relation", True,
         "Matches UNHYPHENATED SINGLE MULTIWORD directly."]]


# ---- round-5 ports: frequency-gated suppression/retry interplay ----
# (ref test_topic_matching_EN.py lines cited per case; _check_equals
# parameterization with per-case frequency thresholds / knobs)

FF_CASES = [
    # ref, query, document, expected, kwargs
    (61, 'A plant grows', 'A plant grows. A plant and a plant', 34,
     dict(use_frequency_factor=False)),
    (328, 'A dog chases a cat',
     'Chasing. Chasing. A dog chases a cat. A lion chases a tiger.', 82,
     dict(relation_matching_frequency_threshold=0.9,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (340, 'A dog chases a cat',
     'There was a cat. A dog chased it. A lion chases a tiger. '
     'Chasing. Chasing. ', 84,
     dict(relation_matching_frequency_threshold=0.9,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (352, 'An adopted child',
     'Someone adopts the child. The child is here. Children. Children. '
     'Children.', 34,
     dict(relation_matching_frequency_threshold=0.9,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (365, 'in Germany',
     'I was in Germany. I know Germany. Germany. Germany.', 10,
     dict(relation_matching_frequency_threshold=0.1,
          embedding_matching_frequency_threshold=0.6)),
    (375, 'in Germany',
     'I was in Germany. I know Germany. Germany. Germany.', 10,
     dict(relation_matching_frequency_threshold=0.1,
          embedding_matching_frequency_threshold=0.1)),
    (385, 'in Germany',
     'I was in Germany. I know Germany. Germany. Germany.', 7,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0)),
    (395, 'A car with an engine',
     'An automobile with an engine. An engine. An engine.', 29,
     dict(relation_matching_frequency_threshold=0.0,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (443, 'tired ENTITYPERSON',
     'I was tired Richard Paul Hudson. I was a tired Richard Paul '
     'Hudson. I spoke to Richard Paul Hudson and he was tired.', 14,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (454, 'tired ENTITYPERSON',
     'I was tired Richard Paul Hudson. I was a tired Richard Paul '
     'Hudson. I spoke to Richard Paul Hudson and he was tired.', 34,
     dict(use_frequency_factor=False)),
    (465, 'someone knows an ENTITYPERSON',
     'I knew Richard Paul Hudson. I knew Richard Paul Hudson. I knew '
     'someone and spoke to Richard Paul Hudson.', 14,
     dict(relation_matching_frequency_threshold=1.0,
          embedding_matching_frequency_threshold=1.0,
          use_frequency_factor=False)),
    (478, 'someone knows an ENTITYPERSON',
     'I knew Richard Paul Hudson. I knew Richard Paul Hudson. I knew '
     'someone and spoke to Richard Paul Hudson.', 34,
     dict(use_frequency_factor=False)),
    # embedding controls (word_embedding_match_threshold=1.0 disables
    # the vector path entirely -> fully deterministic)
    (496, 'A car with an engine',
     'I saw an automobile. I saw it with an engine', 29,
     dict(word_embedding_match_threshold=1.0)),
    (501, 'A car with an engine',
     'I saw a car. I saw it with an engine', 73,
     dict(word_embedding_match_threshold=1.0)),
    (511, 'An engine with a car',
     'I saw an automobile. I saw the engine with it', 14,
     dict(word_embedding_match_threshold=1.0)),
    (516, 'An engine with a car',
     'I saw a car. I saw the engine with it', 76,
     dict(word_embedding_match_threshold=1.0)),
    (281, 'A car with an engine', 'An automobile with an engine', 29,
     dict(word_embedding_match_threshold=1.0)),
    (285, 'A car with an engine', 'A car with an engine', 75,
     dict(word_embedding_match_threshold=1.0)),
    (521, 'A company is bought', 'A company is bought and purchased', 34,
     dict()),
    # ontology-mediated derived multiwords (plain ontology matching,
    # no vectors)
    (720, 'He used a waste horse', 'He used gymnastics equipment', 26,
     dict()),
    (726, 'He used gymnastics equipment', 'He used a waste horse', 26,
     dict()),
    (744, 'A big waste horse', 'A big gymnastics equipment', 26,
     dict()),
    (750, 'A big gymnastics equipment', 'A big waste horse', 26,
     dict()),
]


@pytest.mark.parametrize("ref,query,doc,expected,kw", FF_CASES,
                         ids=[str(c[0]) + " " + c[1][:24] for c in FF_CASES])
def test_topic_score_ff(score, ref, query, doc, expected, kw):
    scores = score(query, doc, **kw)
    assert scores, f"test_topic_matching_EN.py:{ref}: no match"
    assert int(scores[0]) == expected, f"test_topic_matching_EN.py:{ref}"


def test_embedding_matching_root_overall_similarity_too_low(score):
    # ref :206: embedding_matching_frequency_threshold=1.0 suppresses
    # every embedding retry -> king/queen never match
    assert score("Somebody viewed a queen", "I saw a king.",
                 embedding_matching_frequency_threshold=1.0,
                 use_frequency_factor=False) == []


def test_embedding_matching_root_word_only(score):  # ref :219
    assert score("queen", "king",
                 embedding_matching_frequency_threshold=1.0,
                 use_frequency_factor=False) == []


def test_multithreading_filtering_with_topic_match_dictionaries(spark):
    # ref :1220 (the reference runs 2 workers; distribution is the
    # engine's concern here -- the semantics under test is the label
    # filter over identical docs)
    m = _mgr(spark, *[("The dog chased the cat", lab)
                      for lab in ("T11", "T12", "T21", "T22")])
    q = "The dog chased the cat"
    assert len(m.topic_match_documents_against(q)) == 4
    assert len(m.topic_match_documents_against(
        q, document_label_filter="T")) == 4
    assert len(m.topic_match_documents_against(
        q, document_label_filter="T1")) == 2
    assert len(m.topic_match_documents_against(
        q, document_label_filter="T22")) == 1
    assert len(m.topic_match_documents_against(
        q, document_label_filter="X")) == 0


def test_different_match_cutoff_score_high_2(spark):  # ref :1252
    m = _mgr(spark, ("A dog then and then and then and then and then "
                     "a dog", ""))
    assert len(m.topic_match_documents_against(
        "A dog", different_match_cutoff_score=10000)) == 2


def test_different_match_cutoff_score_control_2(spark):  # ref :1264
    m = _mgr(spark, ("A dog then and then and then and then and then "
                     "a dog", ""))
    assert len(m.topic_match_documents_against("A dog")) == 1


def test_two_workers_frequency_factor_control(spark):  # ref :1177
    # the reference asserts the full result-dict list across a
    # 2-worker manager; worker count is a distribution detail -- the
    # semantics under test are the cross-document frequency factors,
    # tie ranks and word_infos, asserted here to 6 dp. NOTE: this
    # reference test builds its own manager whose ontology is loaded
    # WITHOUT symmetric_matching (ref :1178-1179), unlike the
    # module-level holmes_manager_coref
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                           ontology_symmetric=False)
    for text, label in [("I saw a dog. It was chasing a cat", "specific"),
                        ("The dog chased the animal", "exact"),
                        ("The cat chased the dog", "specific-reversed"),
                        ("The animal chased the dog", "exact-reversed")]:
        m.parse_and_register_document(text, label)
    assert m.document_labels() == ["exact", "exact-reversed", "specific",
                                   "specific-reversed"]
    tms = m.topic_match_documents_against(
        "A dog chases an animal", relation_score=30,
        reverse_only_relation_score=20, single_word_score=5,
        single_word_any_tag_score=2, different_match_cutoff_score=5,
        relation_matching_frequency_threshold=0.2)
    got = [(t["url"], t["rank"], round(t["score"], 6)) for t in tms]
    assert got == [
        ("exact", "1=", 17.654017),
        ("specific", "1=", 15.963707),
        ("exact-reversed", "3=", 8.083873),
        ("specific-reversed", "3=", 7.731064)]
    assert _wi(tms[0]) == [
        [4, 7, "overlapping_relation", False, "Matches DOG directly."],
        [8, 14, "overlapping_relation", False, "Matches CHASE directly."],
        [19, 25, "overlapping_relation", True, "Matches ANIMAL directly."]]
    assert _wi(tms[3]) == [
        [4, 7, "single", False, "Is a child of ANIMAL in the ontology."],
        [8, 14, "relation", False, "Matches CHASE directly."],
        [19, 22, "relation", True, "Is a child of ANIMAL in the ontology."]]
