"""Error-surface parity suite, transcribed from the reference's
tests/common/test_errors.py (cited per case).

NOT ported (documented gaps, each multiprocessing- or
serialization-format-specific):
- test_number_of_workers_out_of_range (ref :28): no worker pool —
  parallelism is Spark's
- test_language_not_supported (ref :33): model loading is spaCy-
  specific; our analogue (SUPPORTED_MODELS guard on bulk register) is
  covered below via WrongModelDeserializationError
- test_wrong_model/version_deserialization_error_supervised_models
  (ref :149, :161, :174): supervised-model pickles are not a
  serialization surface here (models live in the SparkSession)
- test_ontology_shared_between_managers (ref :246): the reference
  mutates a shared Ontology object across worker processes; our
  ontology is an immutable list of triples copied into each manager
"""

from __future__ import annotations

import pytest

from holmes_extractor_spark import PARSER_VERSION
from holmes_extractor_spark.errors import (
    DocumentTooBigError, DuplicateDocumentError,
    EmbeddingThresholdLessThanRelationThresholdError,
    FewerThanTwoClassificationsError, NoDocumentError, NoSearchPhraseError,
    SearchPhraseContainsConjunctionError,
    SearchPhraseContainsCoreferringPronounError,
    SearchPhraseContainsMultipleClausesError,
    SearchPhraseContainsNegationError, SearchPhraseWithoutMatchableWordsError,
    WrongModelDeserializationError, WrongVersionDeserializationError)
from holmes_extractor_spark.manager import SparkHolmesManager


def test_overall_similarity_threshold_out_of_range(spark):  # ref :18
    with pytest.raises(ValueError):
        SparkHolmesManager(spark, overall_similarity_threshold=1.2)


def test_embedding_root_matching_without_embeddings(spark):  # ref :23
    with pytest.raises(ValueError):
        SparkHolmesManager(spark, overall_similarity_threshold=1.0,
                           embedding_based_matching_on_root_words=True)


def test_search_phrase_contains_conjunction(spark):  # ref :37
    with pytest.raises(SearchPhraseContainsConjunctionError):
        SparkHolmesManager(spark).register_search_phrase(
            "A dog and a lion chase a cat")


def test_search_phrase_contains_negation(spark):  # ref :43
    with pytest.raises(SearchPhraseContainsNegationError):
        SparkHolmesManager(spark).register_search_phrase(
            "A dog does not chase a cat")


def test_search_phrase_pronoun_coref_switched_off(spark):  # ref :49
    # does NOT raise when coreference resolution is off
    SparkHolmesManager(
        spark, perform_coreference_resolution=False
    ).register_search_phrase("A dog has a cat chasing it")


def test_search_phrase_contains_coreferring_pronoun(spark):  # ref :54
    with pytest.raises(SearchPhraseContainsCoreferringPronounError):
        SparkHolmesManager(spark).register_search_phrase(
            "A dog has a cat chasing it")


def test_search_phrase_contains_only_generic_pronoun(spark):  # ref :60
    with pytest.raises(SearchPhraseWithoutMatchableWordsError):
        SparkHolmesManager(spark).register_search_phrase("Somebody")


def test_search_phrase_contains_only_interrogative_pronoun(spark):  # :65
    with pytest.raises(SearchPhraseWithoutMatchableWordsError):
        SparkHolmesManager(spark).register_search_phrase("Who")


def test_search_phrase_contains_only_grammatical_word(spark):  # ref :70
    with pytest.raises(SearchPhraseWithoutMatchableWordsError):
        SparkHolmesManager(spark).register_search_phrase("the")


def test_search_phrase_contains_two_normal_clauses(spark):  # ref :75
    with pytest.raises(SearchPhraseContainsMultipleClausesError):
        SparkHolmesManager(spark).register_search_phrase(
            "The dog chased the cat. The cat chased the dog.")


def test_search_phrase_contains_two_entity_clauses(spark):  # ref :81
    with pytest.raises(SearchPhraseContainsMultipleClausesError):
        SparkHolmesManager(spark).register_search_phrase(
            "An ENTITYPERSON. An ENTITYPERSON")


def test_search_phrase_normal_and_entity_clause(spark):  # ref :87
    with pytest.raises(SearchPhraseContainsMultipleClausesError):
        SparkHolmesManager(spark).register_search_phrase(
            "The dog chased the cat. An ENTITYPERSON")


def test_duplicate_document_parse_and_register(spark):  # ref :93
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("A", "A")
    with pytest.raises(DuplicateDocumentError):
        m.parse_and_register_document("A", "A")


def test_duplicate_document_register_serialized_documents(spark):  # :107
    from pyspark.sql import functions as F
    m = SparkHolmesManager(spark)
    dup = (spark.range(2)
           .select(F.lit("same").alias("url"), F.lit("en").alias("lang"),
                   F.lit(PARSER_VERSION).alias("parser_version")))
    with pytest.raises(DuplicateDocumentError):
        m.register_serialized_documents(dup)


def test_no_search_phrase_error(spark):  # ref :115
    m = SparkHolmesManager(spark)
    with pytest.raises(NoSearchPhraseError):
        m.match(document_text="Try this")


def test_no_document_error_structural_match(spark):  # ref :120
    m = SparkHolmesManager(spark)
    with pytest.raises(NoDocumentError):
        m.match(search_phrase_text="Try this")


def test_no_document_error_topic_match(spark):  # ref :125
    m = SparkHolmesManager(spark)
    with pytest.raises(NoDocumentError):
        m.topic_match_documents_against("Try this")


def test_wrong_model_deserialization_error_documents(spark):  # ref :130
    from pyspark.sql import functions as F
    m = SparkHolmesManager(spark)
    bad = (spark.range(3)
           .select(F.concat(F.lit("u"), F.col("id")).alias("url"),
                   F.lit("fr").alias("lang"),
                   F.lit(PARSER_VERSION).alias("parser_version")))
    with pytest.raises(WrongModelDeserializationError):
        m.register_serialized_documents(bad)


def test_wrong_version_deserialization_error_documents(spark):  # ref :139
    from pyspark.sql import functions as F
    m = SparkHolmesManager(spark)
    bad = (spark.range(3)
           .select(F.concat(F.lit("u"), F.col("id")).alias("url"),
                   F.lit("en").alias("lang"),
                   F.lit("v0-obsolete").alias("parser_version")))
    with pytest.raises(WrongVersionDeserializationError):
        m.register_serialized_documents(bad)


def test_document_too_big(spark):  # reference parsing.py:953-963
    m = SparkHolmesManager(spark)
    with pytest.raises(DocumentTooBigError):
        m.parse_and_register_document("x" * 1_000_001, "d")


def test_fewer_than_two_classifications_error(spark):  # ref :187
    from holmes_extractor_spark.query.classification import train_classifier
    pages = spark.createDataFrame(
        [("d0", "A dog chases a cat.", "en"),
         ("d1", "A cat chases a dog.", "en")],
        "url string, text string, lang string")
    labels = spark.createDataFrame(
        [("d0", "animals"), ("d1", "animals")],
        "url string, classification string")
    with pytest.raises(FewerThanTwoClassificationsError):
        train_classifier(pages, labels, min_occurrences=1)


@pytest.fixture(scope="module")
def one_doc_mgr(spark):
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("a", "d")
    return m


def test_embedding_threshold_too_high(one_doc_mgr):  # ref :211
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", relation_matching_frequency_threshold=0.75,
            embedding_matching_frequency_threshold=1.5)


def test_embedding_threshold_too_low(one_doc_mgr):  # ref :218
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", relation_matching_frequency_threshold=0.75,
            embedding_matching_frequency_threshold=-1.5)


def test_relation_threshold_too_high(one_doc_mgr):  # ref :225
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", relation_matching_frequency_threshold=1.75,
            embedding_matching_frequency_threshold=0.5)


def test_relation_threshold_too_low(one_doc_mgr):  # ref :232
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", relation_matching_frequency_threshold=-0.75,
            embedding_matching_frequency_threshold=-0.5)


def test_embedding_threshold_less_than_relation_threshold(one_doc_mgr):
    # ref :239
    with pytest.raises(EmbeddingThresholdLessThanRelationThresholdError):
        one_doc_mgr.topic_match_documents_against(
            "b", relation_matching_frequency_threshold=0.75,
            embedding_matching_frequency_threshold=0.5)


def test_word_embedding_match_threshold_out_of_range(one_doc_mgr):  # :246
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", word_embedding_match_threshold=1.2)


def test_initial_question_word_embedding_threshold_range(one_doc_mgr):
    # ref :253
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", initial_question_word_embedding_match_threshold=-1.2)


def test_unrecognized_initial_question_word_behaviour(one_doc_mgr):  # :260
    with pytest.raises(ValueError):
        one_doc_mgr.topic_match_documents_against(
            "b", initial_question_word_behaviour="r")


def test_match_with_adhoc_document_text(spark):
    """match(document_text=...) matches the ad-hoc text INSTEAD of the
    registered corpus (reference manager.py:583-585)."""
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("A horse sleeps.", "other")
    m.register_search_phrase("A dog chases a cat")
    res = m.match(document_text="The dog chased the cat.")
    assert len(res) == 1
    assert res[0]["document"] == ""
    assert m.match() == []
