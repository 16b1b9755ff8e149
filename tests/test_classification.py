"""Supervised classification tests — modeled on the reference's
end-to-end train/classify suites
(reference tests/en/test_supervised_topic_classification_EN.py)."""

import pytest

from holmes_extractor_spark.query.classification import classify, train_classifier

ANIMAL = [
    "The dog chased the cat.",
    "The cat was chased by the dog.",
    "No dog chased any cat.",
    "A plant grows.",
    "The dog chased the cat. A plant grows.",
    "Three dogs chased a cat.",
]
FINANCE = [
    "Somebody gives a file to an employee.",
    "The man decided to open an account.",
    "Somebody gives a file to an employee. The man decided to open an account.",
    "The man decided to open an account. Somebody gives a file to an employee.",
    "The rich man decided to open an account.",
    "Somebody gives a file to an employee. The man was poor.",
]


@pytest.fixture(scope="module")
def model_and_data(spark):
    rows = [(f"a{i}", t, "en", "animals") for i, t in enumerate(ANIMAL)]
    rows += [(f"f{i}", t, "en", "finance") for i, t in enumerate(FINANCE)]
    pages = spark.createDataFrame(
        [(u, t, lg) for (u, t, lg, _) in rows], "url string, text string, lang string")
    labels = spark.createDataFrame(
        [(u, c) for (u, _, _, c) in rows], "url string, classification string")
    model = train_classifier(pages, labels, min_occurrences=2)
    return model


def test_classify_held_out(spark, model_and_data):
    test_pages = spark.createDataFrame([
        ("t_animal", "The dog of the man chased the cat.", "en"),
        ("t_finance", "The man decided to open an account. Somebody gives a file to an employee.", "en"),
    ], "url string, text string, lang string")
    preds = {r["url"]: r["predicted_classification"]
             for r in classify(model_and_data, test_pages).collect()}
    assert preds["t_animal"] == "animals"
    assert preds["t_finance"] == "finance"


def test_training_fit(spark, model_and_data):
    train_pages = spark.createDataFrame(
        [(f"a{i}", t, "en") for i, t in enumerate(ANIMAL)]
        + [(f"f{i}", t, "en") for i, t in enumerate(FINANCE)],
        "url string, text string, lang string")
    preds = classify(model_and_data, train_pages).collect()
    acc = sum((r["url"].startswith("a")) == (r["predicted_classification"] == "animals")
              for r in preds) / len(preds)
    assert acc >= 0.9
