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


def test_fewer_than_two_classifications(spark):
    # reference errors.py FewerThanTwoClassificationsError
    from holmes_extractor_spark.errors import FewerThanTwoClassificationsError
    pages = spark.createDataFrame(
        [("u1", "The dog chased the cat.", "en")],
        "url string, text string, lang string")
    labels = spark.createDataFrame([("u1", "animals")],
                                   "url string, classification string")
    with pytest.raises(FewerThanTwoClassificationsError):
        train_classifier(pages, labels, min_occurrences=1)


def test_cv_feature_filter(spark):
    # discriminative features (all occurrences in one class) survive the
    # coefficient-of-variation filter; features spread evenly across
    # classes are dropped (reference classification.py:682-742)
    from pyspark.sql import Row
    from holmes_extractor_spark.query.classification import select_features
    feats = spark.createDataFrame([
        Row(url="a1", classification="A", features=["x", "shared"]),
        Row(url="a2", classification="A", features=["x", "shared"]),
        Row(url="b1", classification="B", features=["y", "shared"]),
        Row(url="b2", classification="B", features=["y", "shared"]),
    ])
    keep = {r["f"] for r in select_features(feats, min_occurrences=2,
                                            cv_threshold=1.0).collect()}
    assert "x" in keep and "y" in keep
    assert "shared" not in keep


def test_overlap_combined_labels(spark):
    # two relations sharing a document token produce a combined 'a/b'
    # feature (reference classification.py:39-174)
    from holmes_extractor_spark.pipeline.parse_stage import parse_pages
    from holmes_extractor_spark.query.classification import phraselet_features
    pages = spark.createDataFrame(
        [("u1", "The dog chased the cat.", "en")],
        "url string, text string, lang string")
    feats = phraselet_features(parse_pages(pages)).collect()[0]["features"]
    assert ("predicate-actor: chase-dog/predicate-patient: chase-cat"
            in feats)


def test_hypernym_ancestor_features(spark):
    # training mode generalizes poles to their most general ontology
    # ancestor (reference classification.py:384-397: 'A dog progresses'
    # → predicate-actor: progress-animal)
    from holmes_extractor_spark.pipeline.parse_stage import parse_pages
    from holmes_extractor_spark.query.classification import phraselet_features
    pages = spark.createDataFrame(
        [("u1", "The dog chased the cat.", "en")],
        "url string, text string, lang string")
    feats = phraselet_features(parse_pages(pages),
                               replace_with_hypernym_ancestors=True,
                               overlap_combined=False).collect()[0]["features"]
    assert "predicate-actor: chase-animal" in feats
    assert "word: animal" in feats
