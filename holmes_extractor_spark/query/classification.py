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


def ontology_multiwords(ontology: list[tuple] | None) -> frozenset[str] | None:
    """Multiword entries of a loaded ontology, for parse-time indexing
    (reference word_matching/ontology.py:180-210)."""
    if ontology is None:
        return None
    words = {w for (s, _r, o) in ontology for w in (s, o) if " " in w}
    return frozenset(words) or None


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


def matched_feature_counts(docs: DataFrame,
                           ontology: list[tuple] | None = None,
                           coref: bool = True,
                           phraselets: tuple[DataFrame, DataFrame] | None = None,
                           match_all_words: bool = False,
                           ) -> DataFrame:
    """(url, f, n) — phraselet features MATCHED BACK against the
    corpus, the reference's prepare() semantics
    (SupervisedTopicTrainingBasis.prepare matches the training-derived
    phraselets against the training documents via structural matching,
    classification.py:416-470 + 682-742). Two consequences equality
    counting misses:

    - a phraselet pole SUBSUMES document words through the ontology
      ('word: animal' produced from a dog-document also matches the
      'horse' tokens of other documents);
    - a pole generalized to one most-general ancestor still matches
      documents whose tokens sit under a DIFFERENT branch ('word:
      gymnastics equipment' from 'wastage horse' matches plain 'horse'
      tokens — reference
      tests/en/test_supervised_topic_classification_EN.py:226-247).

    Matching is a broadcast join against the (tiny) ontology closure —
    the corpus side is never shuffled on a scale axis."""
    e = extract_edges(docs)
    if not coref:
        # a perform_coreference_resolution=False manager (reference
        # tests' no_coref_holmes_manager) never matches through
        # mention-exchange variants
        e = e.filter(~F.col("mention"))
    # tag-checked (noun) words only: the reference's supervised-
    # classification stop tags exclude verb/function words from word
    # phraselets (classification.py:391-393) — its :249 trainer
    # vocabulary has 'word: lead' but never 'word: chasing'.
    # match_all_words=True lifts the tag check (every token becomes a
    # word phraselet — reference :359 adds 'word: on'/'word: mimi')
    w = extract_words(docs)
    if not match_all_words:
        w = w.filter(~F.col("any_tag"))
    childv = F.when(F.col("template").isin("predicate-actor", "verb-nom"),
                    F.col("subj")).otherwise(F.col("obj"))
    if ontology is not None:
        from ..pipeline.linking import hypernym_ancestors, ontology_closure_local
        anc = hypernym_ancestors(ontology)
        amap = F.create_map(*[F.lit(x) for kv in anc.items() for x in kv])
        pred_g = F.coalesce(amap[F.col("pred")], F.col("pred"))
        child_g = F.coalesce(amap[childv], childv)
        word_g = F.coalesce(amap[F.col("word")], F.col("word"))
        closure = [(q, m) for (q, m, d, _ind) in ontology_closure_local(ontology)
                   if d >= 0]
    else:
        pred_g, child_g, word_g = F.col("pred"), childv, F.col("word")
        closure = []

    # phraselet vocabularies (hypernym-generalized production,
    # reference classification.py:384-397): mention variants and
    # reverse-only templates are never produced as classification
    # phraselets (include_reverse_only=False, classification.py:390).
    # ``phraselets`` overrides production with an already-trained
    # vocabulary — the inference path (parse_and_classify matches the
    # MODEL's phraselets against the new document,
    # classification.py:941-971)
    if phraselets is not None:
        wp, rp = phraselets
    else:
        rp = (e.filter(~F.col("mention") & ~F.col("reverse_only"))
              .select(F.col("template").alias("p_template"),
                      pred_g.alias("p_pred"), child_g.alias("p_child"))
              .distinct())
        wp = w.select(word_g.alias("p_word")).distinct()

    spark = docs.sparkSession
    # per-pole candidate expansion: each document word expands to
    # itself + every ontology word subsuming it (broadcast join against
    # the tiny closure, identity via coalesce for out-of-ontology
    # words) — the corpus side is only ever equality-joined on its own
    # keys, never broadcast
    if closure:
        cdf = F.broadcast(
            spark.createDataFrame(closure, "q string, m string"))
    else:
        cdf = F.broadcast(spark.createDataFrame([], "q string, m string"))

    def expand(df: DataFrame, col: str, out: str) -> DataFrame:
        c = cdf.withColumnRenamed("m", f"_{out}_m").withColumnRenamed(
            "q", f"_{out}_q")
        return (df.join(c, F.col(col) == F.col(f"_{out}_m"), "left")
                .withColumn(out, F.coalesce(f"_{out}_q", col))
                .drop(f"_{out}_m", f"_{out}_q"))

    # single-word matches: one per matched document token occurrence.
    # A multiword token also exposes its HEAD word as a candidate when
    # an ontology is loaded (reference word_matching/ontology.py —
    # candidates include the token's own lemma besides the multiword
    # span, so 'word: animal' matches the 'horse' head of 'wastage
    # horse' even though sports#wastage_horse is not under animal)
    w_cand = w
    if closure:
        heads = (w.filter(F.col("word").contains(" "))
                 .withColumn("word",
                             F.element_at(F.split("word", " "), -1)))
        w_cand = w.unionByName(heads)
    wm = (expand(w_cand, "word", "wq")
          .join(wp, F.col("wq") == F.col("p_word"))
          .select("url", F.concat(F.lit("word: "), "p_word").alias("f"),
                  "idx", "subword_idx")
          .distinct())
    # relation matches: one per matched edge instance
    em = (expand(expand(e.withColumn("childw", childv), "pred", "pq"),
                 "childw", "cq")
          .join(rp, (F.col("template") == F.col("p_template"))
                & (F.col("pq") == F.col("p_pred"))
                & (F.col("cq") == F.col("p_child")))
          .select("url",
                  F.concat("p_template", F.lit(": "), "p_pred",
                           F.lit("-"), "p_child").alias("f"),
                  "parent_idx", "child_idx")
          .distinct())
    # combined 'a/b' labels: relation matches sharing a document token
    # (reference classification.py:39-174 overlap handling) — one per
    # shared-token INSTANCE
    pos = (em.select(
        "url", "f",
        F.explode(F.array("parent_idx", "child_idx")).alias("pos"))
        .distinct())
    combined = (
        pos.alias("x").join(pos.alias("y"),
                            (F.col("x.url") == F.col("y.url"))
                            & (F.col("x.pos") == F.col("y.pos"))
                            & (F.col("x.f") < F.col("y.f")))
        .select(F.col("x.url").alias("url"),
                F.concat(F.col("x.f"), F.lit("/"), F.col("y.f")).alias("f"),
                F.col("x.pos").alias("pos"))
        .distinct())
    counts = (
        wm.select("url", "f")
        .unionByName(em.select("url", "f"))
        .unionByName(combined.select("url", "f"))
        .groupBy("url", "f").agg(F.count("*").alias("n")))
    return counts


def labels_to_classification_frequencies(
        pages: DataFrame, labels: DataFrame, one_hot: bool = True,
        ontology: list[tuple] | None = None, coref: bool = True) -> DataFrame:
    """(label, classification, freq) — the reference's
    ``labels_to_classification_frequencies`` dict as a DataFrame
    (SupervisedTopicTrainingBasis.prepare, classification.py:682-742):
    every phraselet of every training document (poles generalized to
    their most general hypernym ancestor when an ontology is loaded,
    classification.py:384-397) matched back against the training
    corpus via ontology subsumption, combined 'a/b' labels for
    relation matches sharing a document token, counted per
    classification. ``one_hot=True`` (the reference default) caps each
    label at one count per document; ``one_hot=False`` counts every
    match ("A dog chases a cat" under the test ontology gives
    'word: animal' → 2, reference
    tests/en/test_supervised_topic_classification_EN.py:46-58)."""
    docs = parse_pages(pages, ontology_multiwords=ontology_multiwords(ontology))
    per_doc = matched_feature_counts(docs, ontology, coref=coref)
    if one_hot:
        per_doc = per_doc.withColumn("n", F.least(F.col("n"), F.lit(1)))
    return (per_doc.join(labels, "url")
            .groupBy(F.col("f").alias("label"), "classification")
            .agg(F.sum("n").cast("long").alias("freq")))


def select_feature_labels(freq: DataFrame, n_classes: int,
                          min_occurrences: int = 4,
                          cv_threshold: float = 1.0) -> DataFrame:
    """The reference trainer's filter() over a
    labels_to_classification_frequencies frame (classification.py:
    682-742): keep a label iff (a) at least one class counts ≥
    ``min_occurrences`` and (b) the coefficient of variation of its
    per-class counts — zero-extended to ``n_classes`` explicit
    training classes (classification.py:708-721) — is ≥
    ``cv_threshold``. Returns a (label) keep-list DataFrame."""
    stats = (freq.groupBy("label")
             .agg(F.max("freq").alias("max_n"),
                  (F.sum("freq") / n_classes).alias("mean_n"),
                  F.sqrt(F.sum(F.col("freq") * F.col("freq")) / n_classes
                         - F.pow(F.sum("freq") / n_classes, 2))
                  .alias("std_n")))
    return (stats.filter((F.col("max_n") >= min_occurrences)
                         & (F.col("std_n") / F.col("mean_n")
                            >= cv_threshold))
            .select("label"))


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


# ===================================================================
# Reference-shaped training-basis surface
# (SupervisedTopicTrainingBasis / SupervisedTopicModelTrainer /
# SupervisedTopicClassifier — reference classification.py:289-971).
# The distributed scale path above (train_classifier/classify) serves
# corpus-sized training; this surface serves the reference's exact
# API including the CLASSIFICATION ontology (multi-label implication)
# and model serialization. Feature extraction and phraselet match-back
# stay Spark jobs; only the (docs × features)-sized training loop runs
# on the driver, like the reference's thinc loop.
# ===================================================================

import json as _json

from collections import OrderedDict

from ..errors import DuplicateDocumentError


def _classification_implications(
        classification_ontology: list[tuple],
        registered: list[str]) -> dict[str, list[str]]:
    """label → sorted implied (more general / synonymous) labels,
    restricted to registered classification labels (reference
    prepare(), classification.py:416-470: a document's explicit label
    also asserts every registered label that subsumes it)."""
    from ..pipeline.linking import ontology_closure_local
    closure = ontology_closure_local(classification_ontology)
    by_lower = {}
    for lbl in registered:
        by_lower.setdefault(lbl.lower(), lbl)
    out: dict[str, list[str]] = {}
    for lbl in registered:
        implied = {by_lower[q] for (q, m, d, _i) in closure
                   if m == lbl.lower() and q != lbl.lower()
                   and q in by_lower}
        implied.discard(lbl)
        if implied:
            out[lbl] = sorted(implied)
    return out


def _relu(x):
    import numpy as np
    return np.maximum(x, 0.0)


def _sigmoid(x):
    import numpy as np
    return 1.0 / (1.0 + np.exp(-x))


class _MLP:
    """Deterministic numpy MLP with the reference's topology — ReLU
    hidden layers, sigmoid multi-label head, Adam (reference
    get_thinc_model + train loop, classification.py:239-287,
    :609-680)."""

    def __init__(self, sizes: list[int], seed: int = 42):
        import numpy as np
        rng = np.random.default_rng(seed)
        self.sizes = sizes
        self.W = [rng.normal(0.0, (2.0 / max(1, a)) ** 0.5, (a, b))
                  for a, b in zip(sizes[:-1], sizes[1:])]
        self.b = [np.zeros(b) for b in sizes[1:]]

    def forward(self, X, keep=False):
        acts = [X]
        h = X
        for i, (W, b) in enumerate(zip(self.W, self.b)):
            z = h @ W + b
            h = _sigmoid(z) if i == len(self.W) - 1 else _relu(z)
            acts.append(h)
        return acts if keep else h

    def train(self, X, Y, max_epochs: int = 1000,
              learning_rate: float = 0.0001,
              convergence_threshold: float = 0.0001) -> None:
        import numpy as np
        mW = [np.zeros_like(w) for w in self.W]
        vW = [np.zeros_like(w) for w in self.W]
        mb = [np.zeros_like(b) for b in self.b]
        vb = [np.zeros_like(b) for b in self.b]
        beta1, beta2, eps = 0.9, 0.999, 1e-8
        prev_loss = None
        for t in range(1, max_epochs + 1):
            acts = self.forward(X, keep=True)
            out = acts[-1]
            loss = float(np.mean(
                -(Y * np.log(out + 1e-12)
                  + (1 - Y) * np.log(1 - out + 1e-12))))
            delta = (out - Y) / len(X)
            for i in range(len(self.W) - 1, -1, -1):
                gW = acts[i].T @ delta
                gb = delta.sum(axis=0)
                if i > 0:
                    delta = (delta @ self.W[i].T) * (acts[i] > 0)
                mW[i] = beta1 * mW[i] + (1 - beta1) * gW
                vW[i] = beta2 * vW[i] + (1 - beta2) * gW * gW
                mb[i] = beta1 * mb[i] + (1 - beta1) * gb
                vb[i] = beta2 * vb[i] + (1 - beta2) * gb * gb
                lr_t = learning_rate * (1 - beta2 ** t) ** 0.5 / (1 - beta1 ** t)
                self.W[i] -= lr_t * mW[i] / (np.sqrt(vW[i]) + eps)
                self.b[i] -= lr_t * mb[i] / (np.sqrt(vb[i]) + eps)
            if prev_loss is not None and \
                    abs(prev_loss - loss) < convergence_threshold:
                break
            prev_loss = loss


class SupervisedTopicClassifier:
    """Reference SupervisedTopicClassifier (classification.py:905-971):
    matches the trained phraselets against a new document (ontology
    subsumption via the structural ontology) and runs the trained net
    over the occurrence vector."""

    def __init__(self, spark, model: dict):
        self.spark = spark
        self.model = model
        self._net = _MLP(model["sizes"])
        import numpy as np
        self._net.W = [np.array(w) for w in model["W"]]
        self._net.b = [np.array(b) for b in model["b"]]

    @property
    def sorted_label_dict(self) -> dict[str, int]:
        return {lbl: i for i, lbl in enumerate(self.model["sorted_labels"])}

    def _occurrences(self, pages) -> dict[str, dict[str, int]]:
        wp = self.spark.createDataFrame(
            [(w,) for w in self.model["word_phraselets"]],
            "p_word string")
        rp = self.spark.createDataFrame(
            [tuple(r) for r in self.model["rel_phraselets"]],
            "p_template string, p_pred string, p_child string")
        onto = self.model["ontology"]
        onto = [tuple(t) for t in onto] if onto is not None else None
        docs = parse_pages(pages, ontology_multiwords=ontology_multiwords(onto))
        rows = matched_feature_counts(
            docs, onto, phraselets=(wp, rp),
            match_all_words=self.model["match_all_words"]).collect()
        out: dict[str, dict[str, int]] = {}
        for r in rows:
            out.setdefault(r["url"], {})[r["f"]] = r["n"]
        return out

    def parse_and_classify(self, text: str,
                           lang: str = "en") -> OrderedDict | None:
        pages = self.spark.createDataFrame([("q", text, lang)],
                                           "url string, text string, lang string")
        occ = self._occurrences(pages).get("q", {})
        import numpy as np
        vec = np.zeros(len(self.model["sorted_labels"]))
        idx = self.sorted_label_dict
        for f, n in occ.items():
            if f in idx:
                vec[idx[f]] = min(n, 1) if self.model["one_hot"] else n
        if not vec.any():
            return None  # reference returns None for featureless input
        scores = self._net.forward(vec[None, :])[0]
        order = sorted(range(len(scores)), key=lambda i: -scores[i])
        return OrderedDict(
            (self.model["classifications"][i], float(scores[i]))
            for i in order)

    def serialize_model(self) -> str:
        return _json.dumps(self.model)


def deserialize_supervised_topic_classifier(
        spark, serialized: str) -> SupervisedTopicClassifier:
    """Reference Manager.deserialize_supervised_topic_classifier
    (manager.py) — rebuilds the classifier from its serialized JSON."""
    return SupervisedTopicClassifier(spark, _json.loads(serialized))


class SupervisedTopicModelTrainer:
    """Reference SupervisedTopicModelTrainer (classification.py:
    538-680): filters the prepared frequencies, rebuilds occurrence
    vectors by matching the surviving phraselets, and trains the net."""

    def __init__(self, basis, minimum_occurrences: int,
                 cv_threshold: float, max_epochs: int,
                 learning_rate: float, convergence_threshold: float,
                 hidden_layer_sizes: list[int] | None, seed: int):
        import numpy as np
        from ..errors import NoPhraseletsAfterFilteringError
        self.basis = basis
        freq = basis.labels_to_classification_frequencies
        n_classes = len(set(basis._doc_classifications.values()))
        kept = []
        for lbl, counts in freq.items():
            if max(counts.values()) < minimum_occurrences:
                continue
            vals = (list(counts.values()) + [0] * n_classes)[:n_classes]
            mean = sum(vals) / n_classes
            std = (sum(v * v for v in vals) / n_classes - mean * mean) ** 0.5
            if mean and std / mean >= cv_threshold:
                kept.append(lbl)
        if not kept:
            raise NoPhraseletsAfterFilteringError(
                f"minimum_occurrences: {minimum_occurrences}; "
                f"cv_threshold: {cv_threshold}")
        self.sorted_label_dict = {lbl: i for i, lbl in enumerate(sorted(kept))}
        # the phraselets underlying the surviving (possibly combined)
        # labels (reference filter() keeps the split PhraseletInfos)
        self.phraselet_infos = sorted(
            {p for lbl in kept for p in lbl.split("/")})
        word_ps = sorted(p[len("word: "):] for p in self.phraselet_infos
                         if p.startswith("word: "))
        rel_ps = sorted(
            (p.split(": ", 1)[0], p.split(": ", 1)[1].rsplit("-", 1)[0],
             p.split(": ", 1)[1].rsplit("-", 1)[1])
            for p in self.phraselet_infos if not p.startswith("word: "))
        # occurrence vectors: the kept phraselets matched back against
        # the training corpus (reference get_occurrence_dicts)
        wp = basis.spark.createDataFrame(
            [(w,) for w in word_ps], "p_word string")
        rp = basis.spark.createDataFrame(
            rel_ps, "p_template string, p_pred string, p_child string")
        rows = matched_feature_counts(
            basis._docs(), basis.ontology, phraselets=(wp, rp),
            match_all_words=basis.match_all_words).collect()
        per_doc: dict[str, dict[int, int]] = {}
        for r in rows:
            if r["f"] in self.sorted_label_dict:
                n = min(r["n"], 1) if basis.one_hot else r["n"]
                per_doc.setdefault(r["url"], {})[
                    self.sorted_label_dict[r["f"]]] = n
        self.occurrence_dicts = [per_doc.get(lbl, {})
                                 for lbl in basis._doc_order]
        cls = basis.classifications
        self.output_matrix = np.zeros((len(basis._doc_order), len(cls)))
        for i, lbl in enumerate(basis._doc_order):
            c = basis._doc_classifications[lbl]
            for cc in [c] + basis.classification_implication_dict.get(c, []):
                if cc in cls:
                    self.output_matrix[i][cls.index(cc)] = 1.0
        if hidden_layer_sizes is None or not hidden_layer_sizes:
            # reference classification.py:609-621
            start = len(self.sorted_label_dict)
            step = (len(cls) - start) / 3
            hidden_layer_sizes = [start, int(start + step),
                                  int(start + 2 * step)]
        self._hidden_layer_sizes = hidden_layer_sizes
        X = np.zeros((len(basis._doc_order), len(self.sorted_label_dict)))
        for i, occ in enumerate(self.occurrence_dicts):
            for j, n in occ.items():
                X[i][j] = n
        self._net = _MLP([len(self.sorted_label_dict),
                          *hidden_layer_sizes, len(cls)], seed=seed)
        self._net.train(X, self.output_matrix, max_epochs=max_epochs,
                        learning_rate=learning_rate,
                        convergence_threshold=convergence_threshold)

    def classifier(self) -> SupervisedTopicClassifier:
        model = {
            "sorted_labels": sorted(self.sorted_label_dict,
                                    key=self.sorted_label_dict.get),
            "classifications": self.basis.classifications,
            "sizes": self._net.sizes,
            "W": [w.tolist() for w in self._net.W],
            "b": [b.tolist() for b in self._net.b],
            "word_phraselets": [p[len("word: "):]
                                for p in self.phraselet_infos
                                if p.startswith("word: ")],
            "rel_phraselets": [
                [p.split(": ", 1)[0],
                 p.split(": ", 1)[1].rsplit("-", 1)[0],
                 p.split(": ", 1)[1].rsplit("-", 1)[1]]
                for p in self.phraselet_infos
                if not p.startswith("word: ")],
            "ontology": self.basis.ontology,
            "one_hot": self.basis.one_hot,
            "match_all_words": self.basis.match_all_words,
        }
        return SupervisedTopicClassifier(self.basis.spark, model)


class SupervisedTopicTrainingBasis:
    """Reference SupervisedTopicTrainingBasis (classification.py:
    289-536). ``ontology`` drives structural/phraselet matching;
    ``classification_ontology`` drives label implication (multi-label
    training targets)."""

    def __init__(self, spark, ontology: list[tuple] | None = None,
                 classification_ontology: list[tuple] | None = None,
                 one_hot: bool = True, match_all_words: bool = False):
        self.spark = spark
        self.ontology = ontology
        self.classification_ontology = classification_ontology
        self.one_hot = one_hot
        self.match_all_words = match_all_words
        self._texts: dict[str, tuple[str, str]] = {}
        self._doc_order: list[str] = []
        self._doc_classifications: dict[str, str] = {}
        self.additional_classification_labels: set[str] = set()
        self.labels_to_classification_frequencies: dict | None = None
        self.classification_implication_dict: dict[str, list[str]] = {}
        self.classifications: list[str] = []

    def parse_and_register_training_document(
            self, text: str, classification: str,
            label: str | None = None, lang: str = "en") -> None:
        if self.labels_to_classification_frequencies is not None:
            raise RuntimeError("register after prepare()")
        if label is None:
            label = f"doc_{len(self._doc_order)}"
        if label in self._texts:
            raise DuplicateDocumentError(label)
        self._texts[label] = (text, lang)
        self._doc_order.append(label)
        self._doc_classifications[label] = classification

    def register_additional_classification_label(self, label: str) -> None:
        if self.labels_to_classification_frequencies is not None:
            raise RuntimeError("register after prepare()")
        co = self.classification_ontology or []
        words = {w.lower() for (s, _r, o) in co for w in (s, o)}
        if label.lower() in words:
            self.additional_classification_labels.add(label)

    def _docs(self):
        pages = self.spark.createDataFrame(
            [(lbl, *self._texts[lbl]) for lbl in self._doc_order],
            "url string, text string, lang string")
        return parse_pages(
            pages, ontology_multiwords=ontology_multiwords(self.ontology))

    def prepare(self) -> None:
        rows = matched_feature_counts(
            self._docs(), self.ontology,
            match_all_words=self.match_all_words).collect()
        freq: dict[str, dict[str, int]] = {}
        for r in rows:
            c = self._doc_classifications[r["url"]]
            n = min(r["n"], 1) if self.one_hot else r["n"]
            d = freq.setdefault(r["f"], {})
            d[c] = d.get(c, 0) + n
        self.labels_to_classification_frequencies = freq
        explicit = list(dict.fromkeys(
            self._doc_classifications[lbl] for lbl in self._doc_order))
        registered = explicit + sorted(
            self.additional_classification_labels - set(explicit))
        if self.classification_ontology is not None:
            self.classification_implication_dict = \
                _classification_implications(
                    self.classification_ontology, registered)
        # a label belongs to the output space iff a training document
        # asserts it — explicitly or through implication ('hound' is
        # implied by dog/puppy documents; a registered-but-never-
        # implied 'parrot' is NOT trained, reference :260-276)
        implied = {x for e in explicit
                   for x in self.classification_implication_dict.get(e, [])}
        self.classifications = sorted(set(explicit) | implied)

    def train(self, minimum_occurrences: int = 4,
              cv_threshold: float = 1.0, max_epochs: int = 1000,
              learning_rate: float = 0.0001,
              convergence_threshold: float = 0.0001, batch_size: int = 5,
              hidden_layer_sizes: list[int] | None = None,
              seed: int = 42) -> SupervisedTopicModelTrainer:
        if self.labels_to_classification_frequencies is None:
            raise RuntimeError("prepare() must be called before train()")
        if len(set(self._doc_classifications.values())) < 2:
            raise FewerThanTwoClassificationsError(
                "fewer than two training classifications")
        return SupervisedTopicModelTrainer(
            self, minimum_occurrences, cv_threshold, max_epochs,
            learning_rate, convergence_threshold, hidden_layer_sizes,
            seed)
