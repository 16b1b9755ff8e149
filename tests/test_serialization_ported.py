"""Serialization parity, transcribed from the reference's
tests/common/test_serialization.py (reference line cited per test).

The reference serializes single documents to bytes; our scale path
serializes the parsed corpus DataFrame to parquet
(`serialize_documents`) and re-registers it O(1)-driver
(`register_serialized_documents`) — each reference scenario maps onto
that surface.
"""

import pyspark.sql.functions as F
import pytest

from holmes_extractor_spark.manager import SparkHolmesManager


def _roundtrip(spark, tmp_path, m):
    path = str(tmp_path / "corpus")
    m.serialize_documents(path)
    m2 = SparkHolmesManager(spark)
    m2.register_serialized_documents(spark.read.parquet(path))
    return m2


def test_matching_after_serialization(spark, tmp_path):  # ref :13
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("The cat was chased by the dog", "pets")
    m.register_search_phrase("A dog chases a cat")
    m2 = _roundtrip(spark, tmp_path, m)
    m2.register_search_phrase("A dog chases a cat")
    assert len(m2.match()) == 1


def test_matching_with_reserialized_document(spark, tmp_path):  # ref :20
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("The cat was chased by the dog", "pets")
    m2 = _roundtrip(spark, tmp_path, m)
    m3 = _roundtrip(spark, tmp_path / "2", m2)
    m3.register_search_phrase("A dog chases a cat")
    assert len(m3.match()) == 1


def test_serialization_with_coreference(spark, tmp_path):  # ref :40
    m = SparkHolmesManager(spark)
    m.parse_and_register_document(
        "I saw a cat. It was chased by the dog", "pets")
    m2 = _roundtrip(spark, tmp_path, m)
    m2.register_search_phrase("A dog chases a cat")
    assert len(m2.match()) == 1


def test_matching_with_both_documents(spark, tmp_path):  # ref :50
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("The cat was chased by the dog", "pets")
    path = str(tmp_path / "corpus")
    m.serialize_documents(path)
    # re-register the same serialized corpus under a NEW label beside
    # the original (reference registers the bytes as 'pets2')
    again = (spark.read.parquet(path)
             .withColumn("url", F.concat(F.col("url"), F.lit("2"))))
    m.register_serialized_documents(again)
    m.register_search_phrase("A dog chases a cat")
    assert len(m.match()) == 2


def test_subwords_survive_serialization(spark, tmp_path):  # ref :88
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("Bundesoberbehörde.", "bo", lang="de")
    m2 = _roundtrip(spark, tmp_path, m)
    row = (m2.docs().filter(F.col("url") == "bo")
           .select(F.explode("tokens").alias("t")).collect()[0])
    sw = row["t"]["subwords"]
    assert [(s["text"], s["lemma"]) for s in sw] == [
        ("bundes", "bund"), ("oberbehörde", "oberbehörde")]


def test_derived_lemma_survives_serialization(spark, tmp_path):  # ref :107
    m = SparkHolmesManager(spark)
    m.parse_and_register_document("A lot of information.", "information")
    m2 = _roundtrip(spark, tmp_path, m)
    toks = (m2.docs().filter(F.col("url") == "information")
            .select(F.explode("tokens").alias("t"))
            .select("t.text", "t.derived_lemma").collect())
    by_text = {r["text"]: r["derived_lemma"] for r in toks}
    assert by_text["information"] == "inform"
