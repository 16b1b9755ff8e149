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
- model           = Spark ML MultilayerPerceptronClassifier with the
                    reference's topology (ReLU hidden layers + softmax
                    head, classification.py:239-287) and the
                    reference's default hidden-layer sizing — three
                    layers interpolating feature-count → class-count
                    (classification.py:609-621).

Inference is a pure DataFrame transform over the assembled
PipelineModel.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.ml.classification import MultilayerPerceptronClassifier
from pyspark.ml.feature import (CountVectorizer, CountVectorizerModel,
                                IndexToString, StringIndexer)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import FewerThanTwoClassificationsError
from ..pipeline.parse_stage import extract_edges, extract_words, parse_pages


def phraselet_features(docs: DataFrame,
                       replace_with_hypernym_ancestors: bool = False,
                       overlap_combined: bool = True,
                       ontology: list[tuple] | None = None) -> DataFrame:
    """(url, features: array<string>) — every relation + single-word
    phraselet label of the document (the reference's feature space,
    classification.py:39-174).

    ``replace_with_hypernym_ancestors`` generalizes each pole to its
    most general ontology ancestor (the reference's training mode,
    classification.py:384-397). ``overlap_combined`` adds combined
    'a/b' labels when two relation matches share a document token
    (classification.py:39-174 overlap_memory_size handling) — the
    ≈3-word-n-gram features."""
    e = extract_edges(docs)
    w = extract_words(docs)
    if replace_with_hypernym_ancestors:
        from ..pipeline.linking import hypernym_ancestors
        anc = hypernym_ancestors(ontology) if ontology is not None \
            else hypernym_ancestors()
        amap = F.create_map(*[F.lit(x) for kv in anc.items() for x in kv])
        pred_g = F.coalesce(amap[F.col("pred")], F.col("pred"))
        childv = F.when(F.col("template").isin("predicate-actor", "verb-nom"),
                        F.col("subj")).otherwise(F.col("obj"))
        child_g = F.coalesce(amap[childv], childv)
        e = e.withColumn("label", F.concat(F.col("template"), F.lit(": "),
                                           pred_g, F.lit("-"), child_g))
        w = w.withColumn("label", F.concat(
            F.lit("word: "), F.coalesce(amap[F.col("word")], F.col("word"))))
    feats = (e.select("url", F.col("label").alias("f"))
             .unionByName(w.select("url", F.col("label").alias("f"))))
    if overlap_combined:
        # relation pairs sharing a document token → combined label
        # 'min/max' (order-normalized), one per distinct pair
        pos = e.select(
            "url", "label",
            F.explode(F.array("parent_idx", "child_idx")).alias("pos")).distinct()
        combined = (
            pos.alias("x").join(pos.alias("y"),
                                (F.col("x.url") == F.col("y.url"))
                                & (F.col("x.pos") == F.col("y.pos"))
                                & (F.col("x.label") < F.col("y.label")))
            # one combined feature per shared-token INSTANCE — repeated
            # relation pairs in one document count once per repetition
            # (reference one_hot=False counts, tests/en/
            # test_supervised_topic_classification_EN.py:168-224)
            .select(F.col("x.url").alias("url"), F.col("x.pos").alias("pos"),
                    F.concat(F.col("x.label"), F.lit("/"),
                             F.col("y.label")).alias("f"))
            .distinct()
            .drop("pos")
        )
        feats = feats.unionByName(combined)
    return feats.groupBy("url").agg(F.collect_list("f").alias("features"))


def labels_to_classification_frequencies(
        pages: DataFrame, labels: DataFrame, one_hot: bool = True,
        ontology: list[tuple] | None = None) -> DataFrame:
    """(label, classification, freq) — the reference's
    ``labels_to_classification_frequencies`` dict as a DataFrame
    (SupervisedTopicTrainingBasis.prepare, classification.py:682-742):
    every phraselet feature of every training document, poles
    generalized to their most general hypernym ancestor when an
    ontology is loaded (classification.py:384-397), combined 'a/b'
    labels for relation matches sharing a document token, counted per
    classification. ``one_hot=True`` (the reference default) caps each
    label at one count per document; ``one_hot=False`` counts every
    occurrence ("A dog chases a cat" under the test ontology gives
    'word: animal' → 2, reference
    tests/en/test_supervised_topic_classification_EN.py:46-58)."""
    docs = parse_pages(pages)
    feats = phraselet_features(
        docs, replace_with_hypernym_ancestors=ontology is not None,
        ontology=ontology)
    per_doc = (feats.select("url", F.explode("features").alias("f"))
               .groupBy("url", "f").agg(F.count("*").alias("n")))
    if one_hot:
        per_doc = per_doc.withColumn("n", F.least(F.col("n"), F.lit(1)))
    return (per_doc.join(labels, "url")
            .groupBy(F.col("f").alias("label"), "classification")
            .agg(F.sum("n").cast("long").alias("freq")))


def select_features(feats: DataFrame, min_occurrences: int = 2,
                    cv_threshold: float = 1.0) -> DataFrame:
    """Feature filter mirroring the reference (classification.py:
    682-742): keep a phraselet label iff (a) it occurs ≥
    ``min_occurrences`` times in at least one class and (b) the
    coefficient of variation of its per-class counts ≥ ``cv_threshold``
    (discriminative features only). Returns (f) keep-list."""
    counts = (feats.select("classification", F.explode("features").alias("f"))
              .groupBy("f", "classification").agg(F.count("*").alias("n")))
    n_classes = feats.select("classification").distinct().count()
    stats = (counts.groupBy("f")
             .agg(F.max("n").alias("max_n"),
                  (F.sum("n") / n_classes).alias("mean_n"),
                  # population stddev over ALL classes incl. absent-class
                  # zeros: E[x²] − mean²  with zeros contributing 0
                  F.sqrt(F.sum(F.col("n") * F.col("n")) / n_classes
                         - F.pow(F.sum("n") / n_classes, 2)).alias("std_n")))
    return (stats.filter((F.col("max_n") >= min_occurrences)
                         & (F.col("std_n") / F.col("mean_n") >= cv_threshold)
                         | (F.lit(n_classes) == 1))
            .select("f"))


def train_classifier(pages: DataFrame, labels: DataFrame,
                     min_occurrences: int = 2, cv_threshold: float = 0.0,
                     replace_with_hypernym_ancestors: bool = False,
                     hidden_layer_sizes: list[int] | None = None,
                     max_iter: int = 200, seed: int = 42) -> PipelineModel:
    """pages(url,text,lang) + labels(url, classification) → fitted
    PipelineModel. minDF mirrors the reference's minimum_occurrences
    feature floor; cv_threshold > 0 additionally applies the
    coefficient-of-variation filter (classification.py:682-742).

    ``hidden_layer_sizes`` defaults to the reference's topology
    (classification.py:609-621): three hidden layers linearly
    interpolating from the feature count down toward the class count.
    """
    docs = parse_pages(pages)
    feats = phraselet_features(
        docs, replace_with_hypernym_ancestors=replace_with_hypernym_ancestors
    ).join(labels, "url")
    if cv_threshold > 0.0:
        keep = select_features(feats, min_occurrences, cv_threshold)
        keep_set = {r["f"] for r in keep.collect()}  # broadcast-sized
        feats = feats.withColumn(
            "features",
            F.filter("features", lambda f: f.isin(*keep_set)
                     if keep_set else F.lit(False)))
    feats = feats.cache()
    indexer = StringIndexer(inputCol="classification", outputCol="cls_idx",
                            stringOrderType="alphabetAsc").fit(feats)
    # deterministic feature order: CountVectorizer breaks frequency
    # ties arbitrarily (partition-order-dependent), which permutes the
    # MLP's seeded init run-to-run; re-fix the vocabulary alphabetically
    fitted = CountVectorizer(inputCol="features", outputCol="fvec",
                             minDF=float(min_occurrences)).fit(feats)
    vectorizer = CountVectorizerModel.from_vocabulary(
        sorted(fitted.vocabulary), inputCol="features", outputCol="fvec")
    n_feat = len(vectorizer.vocabulary)
    n_cls = len(indexer.labelsArray[0])
    if n_cls < 2:
        raise FewerThanTwoClassificationsError(
            f"only {n_cls} classification(s) in the training data")
    if not hidden_layer_sizes:
        # reference classification.py:609-621
        start = n_feat
        step = (n_cls - n_feat) / 3
        hidden_layer_sizes = [start, int(start + step), int(start + 2 * step)]
    mlp = MultilayerPerceptronClassifier(
        featuresCol="fvec", labelCol="cls_idx",
        layers=[n_feat, *hidden_layer_sizes, n_cls],
        maxIter=max_iter, seed=seed)
    mlp_model = mlp.fit(vectorizer.transform(indexer.transform(feats)))
    return PipelineModel(stages=[
        indexer, vectorizer, mlp_model,
        IndexToString(inputCol="prediction",
                      outputCol="predicted_classification",
                      labels=list(indexer.labelsArray[0]))])


def classify(model: PipelineModel, pages: DataFrame) -> DataFrame:
    """(url, predicted_classification, probability) for new pages —
    the reference's SupervisedTopicClassifier.parse_and_classify
    (classification.py:941-971) as a distributed transform."""
    docs = parse_pages(pages)
    feats = phraselet_features(docs)
    out = model.transform(feats)
    return out.select("url", "predicted_classification",
                      F.col("probability").alias("class_probabilities"))
