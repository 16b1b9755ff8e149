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


# ---------------- labels_to_classification_frequencies parity
# (reference tests/en/test_supervised_topic_classification_EN.py,
# cited per test). Label strings use OUR derived-lemma rendering
# ('chase' where the reference's derivational dict displays 'chasing').

from tests.test_structural_matching_en_ported import REF_ONTOLOGY

from holmes_extractor_spark.query.classification import (
    labels_to_classification_frequencies)


def _freq(spark, docs_with_classes, one_hot=True, ontology=REF_ONTOLOGY,
          coref=True):
    pages = spark.createDataFrame(
        [(f"d{i}", t, "en") for i, (t, _) in enumerate(docs_with_classes)],
        "url string, text string, lang string")
    labels = spark.createDataFrame(
        [(f"d{i}", c) for i, (_, c) in enumerate(docs_with_classes)],
        "url string, classification string")
    rows = labels_to_classification_frequencies(
        pages, labels, one_hot=one_hot, ontology=ontology,
        coref=coref).collect()
    out: dict[str, dict[str, int]] = {}
    for r in rows:
        out.setdefault(r["label"], {})[r["classification"]] = r["freq"]
    return out


def test_frequencies_direct_matching(spark):  # ref :31
    freq = _freq(spark, [("A lion chases a tiger", "animals"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["predicate-actor: chase-lion"] == {"animals": 1}
    assert freq["predicate-patient: chase-tiger"] == {"animals": 1}
    assert freq["predicate-actor: chase-lion/"
                "predicate-patient: chase-tiger"] == {"animals": 1}
    assert freq["word: lion"] == {"animals": 1}
    assert freq["word: tiger"] == {"animals": 1}


def test_frequencies_ontology_matching(spark):  # ref :46
    freq = _freq(spark, [("A dog chases a cat", "animals"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["predicate-actor: chase-animal"] == {"animals": 1}
    assert freq["predicate-patient: chase-animal"] == {"animals": 1}
    assert freq["predicate-actor: chase-animal/"
                "predicate-patient: chase-animal"] == {"animals": 1}
    assert freq["word: animal"] == {"animals": 2}


def test_linked_matching_common_dependent(spark):  # ref :72
    freq = _freq(spark, [("A lion eats and consumes a tiger", "animals"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["predicate-actor: consume-lion"] == {"animals": 1}
    assert freq["predicate-actor: eat-lion"] == {"animals": 1}
    assert freq["predicate-patient: consume-tiger"] == {"animals": 1}
    assert freq["predicate-actor: consume-lion/"
                "predicate-actor: eat-lion"] == {"animals": 1}
    assert freq["word: lion"] == {"animals": 1}
    assert freq["word: tiger"] == {"animals": 1}


def test_linked_matching_common_dependent_control(spark):  # ref :94
    freq = _freq(spark, [("A lion eats and a lion consumes", "animals"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["predicate-actor: consume-lion"] == {"animals": 1}
    assert freq["predicate-actor: eat-lion"] == {"animals": 1}
    assert ("predicate-actor: consume-lion/"
            "predicate-actor: eat-lion") not in freq
    assert freq["word: lion"] == {"animals": 2}


def test_linked_matching_stepped_lower_first(spark):  # ref :109
    freq = _freq(spark, [("A big lion eats", "animals"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["governor-adjective: lion-big"] == {"animals": 1}
    assert freq["predicate-actor: eat-lion"] == {"animals": 1}
    assert freq["governor-adjective: lion-big/"
                "predicate-actor: eat-lion"] == {"animals": 1}
    assert freq["word: lion"] == {"animals": 1}


def test_linked_matching_stepped_lower_second(spark):  # ref :123
    freq = _freq(spark, [("Something eats a big lion", "animals"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["governor-adjective: lion-big"] == {"animals": 1}
    assert freq["predicate-patient: eat-lion"] == {"animals": 1}
    assert freq["governor-adjective: lion-big/"
                "predicate-patient: eat-lion"] == {"animals": 1}
    assert freq["word: lion"] == {"animals": 1}


def test_repeating_relation_through_coreference(spark):  # ref :156
    freq = _freq(spark, [("The building was used last year. "
                          "It is used this year", "test"),
                         ("fast", "dummy")], ontology=None)
    assert ("predicate-patient: use-building/"
            "predicate-patient: use-building") not in freq


def test_one_hot(spark):  # ref :168
    docs = [("A dog chases a cat. A dog chases a cat", "animals"),
            ("A dog chases a cat. A dog chases a cat", "animals"),
            ("A dog chases a cat. A dog chases a cat", "animals2"),
            ("A dog chases a cat. A dog chases a cat", "animals2")]
    freq1 = _freq(spark, docs, one_hot=False)
    freq2 = _freq(spark, docs, one_hot=True)
    pair = ("predicate-actor: chase-animal/"
            "predicate-patient: chase-animal")
    assert freq1[pair] == {"animals": 4, "animals2": 4}
    assert freq1["predicate-actor: chase-animal"] == {"animals": 4,
                                                      "animals2": 4}
    assert freq1["word: animal"] == {"animals": 8, "animals2": 8}
    assert freq2[pair] == {"animals": 2, "animals2": 2}
    assert freq2["predicate-actor: chase-animal"] == {"animals": 2,
                                                      "animals2": 2}
    assert freq2["word: animal"] == {"animals": 2, "animals2": 2}


def test_frequencies_ontology_multiword_matching(spark):  # ref :60
    # the ontology-defined multiword 'wastage horse' is recognized at
    # parse time and its hypernym-replaced pole renders as the loaded
    # ontology class 'gymnastics equipment'
    freq = _freq(spark, [("A gymnast jumps over a wastage horse", "gym"),
                         ("fast", "dummy")], one_hot=False)
    assert freq["predicate-actor: jump-gymnast"] == {"gym": 1}
    assert freq["word: gymnast"] == {"gym": 1}
    assert freq["word: gymnastics equipment"] == {"gym": 1}


def test_linked_matching_stepped_control(spark):  # ref :139
    # no_coref manager in the reference: no matching through
    # coreference mentions, so the adjective relation (lion#1) and the
    # eat relation (lion#2) never share a token → no combined label
    freq = _freq(spark, [("There is a big lion and the lion eats",
                          "animals"), ("fast", "dummy")],
                 one_hot=False, coref=False)
    assert freq["governor-adjective: lion-big"] == {"animals": 1}
    assert freq["predicate-actor: eat-lion"] == {"animals": 1}
    assert ("governor-adjective: lion-big/"
            "predicate-actor: eat-lion") not in freq
    assert freq["word: lion"] == {"animals": 2}


def test_multiple_document_classes(spark):  # ref :226
    # phraselets matched back across documents via ontology
    # subsumption: 'word: gymnastics equipment' (produced from the
    # wastage-horse document) matches the plain 'horse' tokens of the
    # animal documents too
    freq = _freq(spark, [
        ("A dog chases a cat", "animals"),
        ("A cat chases a dog", "animals"),
        ("A cat chases a horse", "animals"),
        ("A cat chases a horse", "animals"),
        ("A gymnast jumps over a horse", "gym"),
        ("A gymnast jumps over a wastage horse", "gym"),
    ], one_hot=False)
    assert freq["predicate-actor: chase-animal"] == {"animals": 4}
    assert freq["predicate-actor: jump-gymnast"] == {"gym": 2}
    assert freq["predicate-patient: chase-animal"] == {"animals": 4}
    assert freq["predicate-actor: chase-animal/"
                "predicate-patient: chase-animal"] == {"animals": 4}
    assert freq["word: animal"] == {"animals": 8, "gym": 2}
    assert freq["word: gymnast"] == {"gym": 2}
    assert freq["word: gymnastics equipment"] == {"animals": 2, "gym": 2}


def test_filtering(spark):  # ref :476
    # the trainer's minimum_occurrences + cv filter over the prepared
    # frequencies; phraselet_infos = the single phraselets underlying
    # the surviving (possibly combined) feature labels
    from holmes_extractor_spark.query.classification import (
        labels_to_classification_frequencies, select_feature_labels)
    docs = [
        ("A dog chases a cat", "animals"),
        ("A cat chases a dog", "animals"),
        ("A cat chases a horse", "animals"),
        ("A cat chases a horse", "animals"),
        ("A gymnast jumps over a horse", "gym"),
        ("A gymnast jumps over a wastage horse", "gym"),
    ]
    pages = spark.createDataFrame(
        [(f"d{i}", t, "en") for i, (t, _) in enumerate(docs)],
        "url string, text string, lang string")
    labels = spark.createDataFrame(
        [(f"d{i}", c) for i, (_, c) in enumerate(docs)],
        "url string, classification string")
    freq = labels_to_classification_frequencies(
        pages, labels, one_hot=True, ontology=REF_ONTOLOGY)
    kept1 = sorted(r["label"] for r in select_feature_labels(
        freq, n_classes=2, min_occurrences=4, cv_threshold=0.0).collect())
    assert kept1 == [
        "predicate-actor: chase-animal",
        "predicate-actor: chase-animal/predicate-patient: chase-animal",
        "predicate-patient: chase-animal",
        "word: animal",
    ]
    infos1 = {p for lbl in kept1 for p in lbl.split("/")}
    assert infos1 == {"predicate-actor: chase-animal",
                      "predicate-patient: chase-animal", "word: animal"}
    kept2 = sorted(r["label"] for r in select_feature_labels(
        freq, n_classes=2, min_occurrences=4, cv_threshold=1.0).collect())
    assert kept2 == [
        "predicate-actor: chase-animal",
        "predicate-actor: chase-animal/predicate-patient: chase-animal",
        "predicate-patient: chase-animal",
    ]
    infos2 = {p for lbl in kept2 for p in lbl.split("/")}
    assert infos2 == {"predicate-actor: chase-animal",
                      "predicate-patient: chase-animal"}


# ---------------- whole-scenario parity (classification ontology,
# multi-label implication, trainer internals, serialize round-trip) —
# reference tests/en/test_supervised_topic_classification_EN.py:249-474.
# The reference's test ontology distinguishes a 'sports#horse' class
# from 'animals#horse'; REF_ONTOLOGY models this with '~sense' node-id
# suffixes (pipeline/linking.py _node_label), so 'wastage horse'
# generalizes to 'gymnastics equipment' — not 'animal' — exactly as in
# the reference (test_multiple_document_classes above asserts it).

from holmes_extractor_spark.query.classification import (
    SupervisedTopicTrainingBasis, deserialize_supervised_topic_classifier)


def _converged_classifier(sttb, **train_kw):
    """The reference retrains up to 20× — 'With so little training
    data, the NN does not consistently learn correctly' (ref :277-303).
    Deterministic analogue: step the seed instead of relying on global
    RNG state."""
    stc = None
    for seed in range(42, 62):
        trainer = sttb.train(seed=seed, **train_kw)
        stc = trainer.classifier()
        if (next(iter(stc.parse_and_classify("You are a robot.")))
                == "computers"
                and next(iter(stc.parse_and_classify("You are a cat.")))
                == "animal"):
            break
    return stc


def _whole_scenario_basis(spark, match_all_words=False):
    sttb = SupervisedTopicTrainingBasis(
        spark, ontology=REF_ONTOLOGY, classification_ontology=REF_ONTOLOGY,
        one_hot=False, match_all_words=match_all_words)
    sttb.parse_and_register_training_document("A puppy", "puppy", "d0")
    sttb.parse_and_register_training_document("A pussy", "cat", "d1")
    sttb.parse_and_register_training_document("A dog on a lead", "dog", "d2")
    sttb.parse_and_register_training_document("Mimi Momo", "Mimi Momo", "d3")
    sttb.parse_and_register_training_document("An animal", "animal", "d4")
    sttb.parse_and_register_training_document("A computer", "computers", "d5")
    sttb.parse_and_register_training_document("A robot", "computers", "d6")
    sttb.register_additional_classification_label("parrot")
    sttb.register_additional_classification_label("hound")
    sttb.prepare()
    return sttb


def test_whole_scenario_with_classification_ontology(spark):  # ref :249
    sttb = _whole_scenario_basis(spark)
    # implication through the classification ontology: ancestors AND
    # synonyms restricted to registered labels (hound ≡ dog; 'pussy'
    # is a synonym too but not a registered label). Our ontology keeps
    # 'cat creature'/'pussy' as unregistered synonyms like the ref.
    assert sttb.classification_implication_dict == {
        "Mimi Momo": ["animal", "cat"],
        "dog": ["animal", "hound"],
        "puppy": ["animal", "dog", "hound"],
        "cat": ["animal"],
        "hound": ["animal", "dog"],
    }
    # 'parrot' is registered but never implied → not trained
    assert sttb.classifications == [
        "Mimi Momo", "animal", "cat", "computers", "dog", "hound", "puppy"]
    trainer = sttb.train(minimum_occurrences=0, cv_threshold=0,
                         max_epochs=1000, learning_rate=0.0001,
                         convergence_threshold=0)
    assert list(trainer.sorted_label_dict.keys()) == [
        "prepgovernor-noun: animal-lead", "word: animal",
        "word: computer", "word: lead", "word: robot"]
    assert trainer.occurrence_dicts == [
        {1: 1}, {1: 1}, {1: 1, 0: 1, 3: 1}, {1: 1}, {1: 1}, {2: 1}, {4: 1}]
    assert trainer.output_matrix.tolist() == [
        [0.0, 1.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        [0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 1.0, 1.0, 0.0],
        [1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
    ]
    assert trainer._hidden_layer_sizes == [5, 5, 6]
    stc = _converged_classifier(sttb, minimum_occurrences=0,
                                cv_threshold=0, max_epochs=1000,
                                learning_rate=0.0001,
                                convergence_threshold=0)
    assert next(iter(stc.parse_and_classify("You are a robot."))) \
        == "computers"
    # ontology matching at inference: 'cat' ⊂ animal → word: animal
    assert next(iter(stc.parse_and_classify("You are a cat."))) == "animal"
    assert stc.parse_and_classify(
        "My name is Charles and I like sewing.") is None
    blob = stc.serialize_model()
    stc2 = deserialize_supervised_topic_classifier(spark, blob)
    assert stc2.model["sorted_labels"] == [
        "prepgovernor-noun: animal-lead", "word: animal",
        "word: computer", "word: lead", "word: robot"]
    assert next(iter(stc2.parse_and_classify("You are a robot."))) \
        == "computers"
    assert next(iter(stc2.parse_and_classify("You are a cat."))) == "animal"
    assert stc2.parse_and_classify(
        "My name is Charles and I like sewing.") is None


def test_whole_scenario_with_ontology_and_match_all_words(spark):  # ref :359
    sttb = _whole_scenario_basis(spark, match_all_words=True)
    assert sttb.classification_implication_dict == {
        "Mimi Momo": ["animal", "cat"],
        "dog": ["animal", "hound"],
        "puppy": ["animal", "dog", "hound"],
        "cat": ["animal"],
        "hound": ["animal", "dog"],
    }
    assert sttb.classifications == [
        "Mimi Momo", "animal", "cat", "computers", "dog", "hound", "puppy"]
    trainer = sttb.train(minimum_occurrences=0, cv_threshold=0,
                         max_epochs=1000, learning_rate=0.0001,
                         convergence_threshold=0)
    # match_all_words lifts the tag check: 'on' and the multiword's
    # member tokens 'mimi'/'momo' become word phraselets too
    assert list(trainer.sorted_label_dict.keys()) == [
        "prepgovernor-noun: animal-lead", "word: animal",
        "word: computer", "word: lead", "word: mimi", "word: momo",
        "word: on", "word: robot"]
    assert trainer.occurrence_dicts == [
        {1: 1}, {1: 1}, {0: 1, 1: 1, 3: 1, 6: 1}, {1: 1, 4: 1, 5: 1},
        {1: 1}, {2: 1}, {7: 1}]
    assert trainer._hidden_layer_sizes == [8, 7, 7]
    stc = _converged_classifier(sttb, minimum_occurrences=0,
                                cv_threshold=0, max_epochs=1000,
                                learning_rate=0.0001,
                                convergence_threshold=0)
    assert next(iter(stc.parse_and_classify("You are a robot."))) \
        == "computers"
    assert next(iter(stc.parse_and_classify("You are a cat."))) == "animal"
    assert stc.parse_and_classify(
        "My name is Charles and I like sewing.") is None


def test_held_out_accuracy_floor(spark):
    """End-to-end accuracy floor on a deterministic synthetic corpus
    (VERDICT r4 #7): the reference reports 96.9-98.7% on BBC/20NG
    (reference README.md:1201-1207); this stand-in asserts >=0.9 on a
    held-out third of a 36-document two-class corpus built from fixed
    templates (no RNG — the split is positional, so the test is
    fully reproducible)."""
    animal_tpl = [
        "The {a} chased the {b}.", "A {a} was chased by a {b}.",
        "Three {a}s chased a {b}.", "No {a} chased any {b}.",
        "The {a} chased the {b} and the {b} chased the {a}.",
        "A {a} hunted a {b}.",
    ]
    finance_tpl = [
        "The man decided to open an {x}.",
        "Somebody gives a {y} to an employee.",
        "The rich man decided to open an {x}.",
        "Somebody gives a {y} to an employee. The man was poor.",
        "The man decided to open an {x}. Somebody gives a {y}.",
        "An employee opened an {x}.",
    ]
    animals = [("dog", "cat"), ("cat", "mouse"), ("lion", "dog")]
    finances = [("account", "file"), ("account", "document"),
                ("account", "file")]
    rows = []
    for i, tpl in enumerate(animal_tpl):
        for j, (a, b) in enumerate(animals):
            rows.append((f"a{i}_{j}", tpl.format(a=a, b=b), "animals"))
    for i, tpl in enumerate(finance_tpl):
        for j, (x, y) in enumerate(finances):
            rows.append((f"f{i}_{j}", tpl.format(x=x, y=y), "finance"))
    train = [r for k, r in enumerate(rows) if k % 3 != 0]
    test = [r for k, r in enumerate(rows) if k % 3 == 0]
    pages = spark.createDataFrame([(u, t, "en") for (u, t, _) in train],
                                  "url string, text string, lang string")
    labels = spark.createDataFrame([(u, c) for (u, _, c) in train],
                                   "url string, classification string")
    model = train_classifier(pages, labels, min_occurrences=2)
    test_pages = spark.createDataFrame([(u, t, "en") for (u, t, _) in test],
                                       "url string, text string, lang string")
    preds = {r["url"]: r["predicted_classification"]
             for r in classify(model, test_pages).collect()}
    want = {u: c for (u, _, c) in test}
    acc = sum(preds.get(u) == c for u, c in want.items()) / len(want)
    assert acc >= 0.9, f"held-out accuracy {acc:.2f} < 0.9 ({preds})"
