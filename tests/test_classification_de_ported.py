"""DE supervised-classification parity, transcribed from the
reference's tests/de/test_supervised_topic_classification_DE.py
(reference line cited per test).  Asserts the
labels_to_classification_frequencies table — label strings are the
reference's own renderings (derived-lemma display: jagd-löw,
fressen-löw, intcompound: löw-information …).

NOT ported: test_whole_scenario/one_hot (ref :456-461 — covered by
the EN whole-scenario ports over the shared pipeline),
hidden-layer-size plumbing (ref :462-489 — exercised by
tests/test_classification.py's MLP tests) and test_filtering
(ref :490 — ported for EN at test_classification.py::test_filtering).
"""

import pytest

from holmes_extractor_spark.query.classification import (
    labels_to_classification_frequencies)


@pytest.fixture(scope="module")
def freq_de(spark):
    def _freq(docs, one_hot=False):
        pages = spark.createDataFrame(
            [(f"d{i}", t, "de") for i, (t, _) in enumerate(docs)],
            "url string, text string, lang string")
        labels = spark.createDataFrame(
            [(f"d{i}", c) for i, (_, c) in enumerate(docs)],
            "url string, classification string")
        rows = labels_to_classification_frequencies(
            pages, labels, one_hot=one_hot, ontology=None,
            coref=True).collect()
        out: dict[str, dict[str, int]] = {}
        for r in rows:
            out.setdefault(r["label"], {})[r["classification"]] = r["freq"]
        return out
    return _freq


def test_frequencies_direct_matching(freq_de):  # ref :14
    f = freq_de([("Ein Löwe jagt einen Tiger", "Tiere"),
                 ("schnell", "Dummy")])
    assert f["verb-nom: jagd-löw"] == {"Tiere": 1}
    assert f["verb-acc: jagd-tiger"] == {"Tiere": 1}
    assert f["verb-acc: jagd-tiger/verb-nom: jagd-löw"] == {"Tiere": 1}
    assert f["word: löw"] == {"Tiere": 1}
    assert f["word: tiger"] == {"Tiere": 1}


def test_linked_matching_common_dependent(freq_de):  # ref :26
    # the reference's labels keep spaCy's unresolved isst/frisst
    # surface forms; our deterministic lemmatizer resolves them, so the
    # SAME structure renders as essen/fressen
    f = freq_de([("Ein Löwe isst und frisst einen Tiger", "Tiere"),
                 ("schnell", "Dummy")])
    assert f["verb-nom: essen-löw"] == {"Tiere": 1}
    assert f["verb-nom: fressen-löw"] == {"Tiere": 1}
    assert f["verb-acc: fressen-tiger"] == {"Tiere": 1}
    assert f["verb-acc: fressen-tiger/verb-nom: fressen-löw"] == {"Tiere": 1}
    assert f["verb-nom: essen-löw/verb-nom: fressen-löw"] == {"Tiere": 1}
    assert f["word: löw"] == {"Tiere": 1}
    assert f["word: tiger"] == {"Tiere": 1}


def test_linked_matching_common_dependent_control(freq_de):  # ref :45
    f = freq_de([("Ein Löwe isst und dann frisst ein Löwe", "Tiere"),
                 ("schnell", "Dummy")])
    assert f["verb-nom: essen-löw"] == {"Tiere": 1}
    assert f["verb-nom: fressen-löw"] == {"Tiere": 1}
    assert "verb-nom: essen-löw/verb-nom: fressen-löw" not in f
    assert f["word: löw"] == {"Tiere": 2}


def test_linked_matching_stepped_lower_first(freq_de):  # ref :59
    f = freq_de([("Ein großer Löwe isst", "Tiere"),
                 ("schnell", "Dummy")])
    assert f["verb-nom: essen-löw"] == {"Tiere": 1}
    assert f["noun-dependent: löw-groß"] == {"Tiere": 1}
    assert f["noun-dependent: löw-groß/verb-nom: essen-löw"] == {"Tiere": 1}
    assert f["word: löw"] == {"Tiere": 1}


def test_linked_matching_stepped_lower_second(freq_de):  # ref :72
    f = freq_de([("Etwas isst einen großen Löwen", "Tiere"),
                 ("schnell", "Dummy")])
    assert f["verb-acc: essen-löw"] == {"Tiere": 1}
    assert f["noun-dependent: löw-groß"] == {"Tiere": 1}
    assert f["noun-dependent: löw-groß/verb-acc: essen-löw"] == {"Tiere": 1}
    assert f["word: löw"] == {"Tiere": 1}


def test_linked_matching_stepped_control(freq_de):  # ref :87
    f = freq_de([("Man sieht einen großen Löwen und dann isst ein Löwe",
                  "Tiere"), ("schnell", "Dummy")])
    assert f["verb-nom: essen-löw"] == {"Tiere": 1}
    assert f["noun-dependent: löw-groß"] == {"Tiere": 1}
    assert "noun-dependent: löw-groß/verb-nom: essen-löw" not in f
    assert f["word: löw"] == {"Tiere": 2}


def test_frequencies_direct_matching_with_subwords(freq_de):  # ref :102
    f = freq_de([("Ein Informationslöwe jagt einen Informationstiger",
                  "Tiere"), ("schnell", "Dummy")])
    assert f["verb-nom: jagd-löw"] == {"Tiere": 1}
    assert f["verb-acc: jagd-tiger"] == {"Tiere": 1}
    assert f["verb-acc: jagd-tiger/verb-nom: jagd-löw"] == {"Tiere": 1}
    assert ("word: informationslöwe" in f or "word: informationslöw" in f)
    assert f["word: informationstiger"] == {"Tiere": 1}
    assert f["intcompound: löw-information"] == {"Tiere": 1}
    assert f["intcompound: tiger-information"] == {"Tiere": 1}
    assert f["intcompound: löw-information/verb-nom: jagd-löw"] \
        == {"Tiere": 1}
    assert f["intcompound: tiger-information/verb-acc: jagd-tiger"] \
        == {"Tiere": 1}


def test_frequencies_subwords_and_conjunction_of_verb(freq_de):  # ref :135
    f = freq_de([("Ein Informationslöwe jagt und trägt einen "
                  "Informationstiger", "Tiere"), ("schnell", "Dummy")])
    assert f["verb-nom: jagd-löw"] == {"Tiere": 1}
    assert f["verb-nom: tragen-löw"] == {"Tiere": 1}
    assert f["verb-acc: tragen-tiger"] == {"Tiere": 1}
    assert f["verb-acc: tragen-tiger/verb-nom: tragen-löw"] == {"Tiere": 1}
    assert f["intcompound: löw-information"] == {"Tiere": 1}
    assert f["intcompound: tiger-information"] == {"Tiere": 1}
    assert f["intcompound: löw-information/verb-nom: jagd-löw"] \
        == {"Tiere": 1}
    assert f["intcompound: löw-information/verb-nom: tragen-löw"] \
        == {"Tiere": 1}
    assert f["intcompound: tiger-information/verb-acc: tragen-tiger"] \
        == {"Tiere": 1}


def test_frequencies_front_subword_conjunction(freq_de):  # ref :166
    f = freq_de([("Ein Informationsextraktionsmaßnahmen- und Raketenlöwe "
                  "fressen", "Tiere"), ("schnell", "Dummy")])
    assert f["intcompound: extraktion-information"] == {"Tiere": 1}
    assert f["intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-maßnahm"] == {"Tiere": 1}
    assert f["intcompound: löw-raket"] == {"Tiere": 1}
    assert f["verb-nom: fressen-löw"] == {"Tiere": 1}
    assert ("word: raketenlöwe" in f or "word: raketenlöw" in f)
    assert f["intcompound: extraktion-information/"
             "intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-maßnahm/"
             "intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-raket/verb-nom: fressen-löw"] == {"Tiere": 1}


def test_frequencies_back_subword_conjunction(freq_de):  # ref :196
    f = freq_de([("Ein Informationsextraktionsmaßnahmen und -raketenlöwe "
                  "fressen", "Tiere"), ("schnell", "Dummy")])
    assert f["intcompound: extraktion-information"] == {"Tiere": 1}
    assert f["intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: raket-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-raket"] == {"Tiere": 1}
    assert f["intcompound: löw-raket/intcompound: raket-extraktion"] \
        == {"Tiere": 1}
    assert f["verb-nom: fressen-löw"] == {"Tiere": 1}
    assert f["verb-nom: fressen-maßnahm"] == {"Tiere": 1}
    assert f["word: informationsextraktionsmaßnahmen"] == {"Tiere": 1}
    assert f["intcompound: extraktion-information/"
             "intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-raket/verb-nom: fressen-löw"] == {"Tiere": 1}
    assert f["intcompound: maßnahm-extraktion/verb-nom: fressen-maßnahm"] \
        == {"Tiere": 1}
    assert f["verb-nom: fressen-löw/verb-nom: fressen-maßnahm"] \
        == {"Tiere": 1}


def test_frequencies_front_and_back_subword_conjunction(freq_de):
    # ref :231
    f = freq_de([("Ein Informationsextraktionsmaßnahmen- und -raketenlöwe "
                  "fressen", "Tiere"), ("schnell", "Dummy")])
    assert f["intcompound: extraktion-information"] == {"Tiere": 1}
    assert f["intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: raket-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-maßnahm"] == {"Tiere": 1}
    assert f["intcompound: löw-raket"] == {"Tiere": 1}
    assert f["intcompound: löw-raket/intcompound: raket-extraktion"] \
        == {"Tiere": 1}
    assert f["intcompound: löw-maßnahm/intcompound: maßnahm-extraktion"] \
        == {"Tiere": 1}
    assert f["verb-nom: fressen-löw"] == {"Tiere": 1}
    assert f["intcompound: extraktion-information/"
             "intcompound: maßnahm-extraktion"] == {"Tiere": 1}
    assert f["intcompound: löw-raket/verb-nom: fressen-löw"] == {"Tiere": 1}
