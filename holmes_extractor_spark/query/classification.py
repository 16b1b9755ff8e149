"""Supervised document classification — the reference's
``SupervisedTopicTrainingBasis`` / ``SupervisedTopicModelTrainer``
(reference: classification.py) re-expressed on Spark ML.

The reference extracts phraselet features from every training document
(classification.py:384-397), counts label×class frequencies with an
occurrence floor (minimum_occurrences=4, classification.py:682-742),
builds per-document sparse occurrence vectors (:176-237) and trains a
thinc MLP (:239-287). Here:

- features        = the SAME phraselet labels our pipeline already
                    extracts (relation edges + single words) — one
                    array<string> column per document;
- vocabulary+vec  = Spark ML CountVectorizer (minDF = occurrence floor);
- model           = Spark ML multinomial LogisticRegression (a linear
                    softmax head — deterministic, distributed; the
                    reference's MLP is a non-deterministic superset).

Everything runs as one Pipeline; inference is a pure DataFrame
transform.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import CountVectorizer, IndexToString, StringIndexer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.parse_stage import extract_edges, extract_words, parse_pages


def phraselet_features(docs: DataFrame) -> DataFrame:
    """(url, features: array<string>) — every relation + single-word
    phraselet label of the document (the reference's feature space,
    classification.py:39-174)."""
    e = extract_edges(docs).select("url", F.col("label").alias("f"))
    w = extract_words(docs).select("url", F.col("label").alias("f"))
    return (e.unionByName(w)
            .groupBy("url").agg(F.collect_list("f").alias("features")))


def train_classifier(pages: DataFrame, labels: DataFrame,
                     min_occurrences: int = 2, seed: int = 42) -> PipelineModel:
    """pages(url,text,lang) + labels(url, classification) → fitted
    PipelineModel. minDF mirrors the reference's minimum_occurrences
    feature floor (classification.py:682-742)."""
    docs = parse_pages(pages)
    feats = phraselet_features(docs).join(labels, "url")
    pipeline = Pipeline(stages=[
        StringIndexer(inputCol="classification", outputCol="cls_idx",
                      stringOrderType="alphabetAsc"),
        CountVectorizer(inputCol="features", outputCol="fvec",
                        minDF=float(min_occurrences)),
        LogisticRegression(featuresCol="fvec", labelCol="cls_idx",
                           maxIter=64, regParam=0.01, family="multinomial"),
    ])
    model = pipeline.fit(feats)
    # attach an inverse label map for inference output
    labels_arr = model.stages[0].labelsArray[0]
    model.stages.append(IndexToString(inputCol="prediction",
                                      outputCol="predicted_classification",
                                      labels=list(labels_arr)))
    return model


def classify(model: PipelineModel, pages: DataFrame) -> DataFrame:
    """(url, predicted_classification, probability) for new pages —
    the reference's SupervisedTopicClassifier.parse_and_classify
    (classification.py:941-971) as a distributed transform."""
    docs = parse_pages(pages)
    feats = phraselet_features(docs)
    out = model.transform(feats)
    return out.select("url", "predicted_classification",
                      F.col("probability").alias("class_probabilities"))
