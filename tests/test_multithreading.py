"""Concurrent-query stability — the spirit of the reference's
tests/common/test_multithreading.py: N threads issuing structural
match, topic match and classification traffic against ONE manager on
one SparkSession, asserting every thread sees the same results as a
serial run. Spark's scheduler is thread-safe; the manager's state
(docs/postings DataFrames, compiled phrases) is read-only during
queries, so concurrent traffic must neither crash nor cross-talk."""

from __future__ import annotations

import threading

import pytest

from holmes_extractor_spark.manager import SparkHolmesManager

from tests.test_structural_matching_en_ported import REF_ONTOLOGY


@pytest.fixture(scope="module")
def mgr(spark):
    m = SparkHolmesManager(spark, ontology=REF_ONTOLOGY,
                           ontology_symmetric=True)
    m.register_search_phrase("A dog chases a cat")
    m.register_search_phrase("An ENTITYPERSON comes home")
    m.parse_and_register_document("The dog chased the cat.", "d1")
    m.parse_and_register_document("I saw a cat. A dog was chasing it.", "d2")
    m.parse_and_register_document("Richard Hudson came home.", "d3")
    m.parse_and_register_document("A plant grows quickly.", "d4")
    return m


def _match_key(ms):
    return sorted((m["search_phrase_label"], m["document"],
                   m["index_within_document"]) for m in ms)


def _topic_key(tms):
    return [(t["url"], t["rank"], round(t["score"], 6)) for t in tms]


def test_ten_thread_mixed_traffic(mgr):
    serial_match = _match_key(mgr.match())
    serial_topic = _topic_key(
        mgr.topic_match_documents_against("A dog chases a cat"))
    serial_q = _topic_key(mgr.topic_match_documents_against("Who came home?"))

    results: dict[int, tuple] = {}
    errors: list[BaseException] = []

    def work(i: int) -> None:
        try:
            if i % 3 == 0:
                results[i] = ("match", _match_key(mgr.match()))
            elif i % 3 == 1:
                results[i] = ("topic", _topic_key(
                    mgr.topic_match_documents_against("A dog chases a cat")))
            else:
                results[i] = ("q", _topic_key(
                    mgr.topic_match_documents_against("Who came home?")))
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert len(results) == 10
    for i, (kind, got) in results.items():
        want = {"match": serial_match, "topic": serial_topic,
                "q": serial_q}[kind]
        assert got == want, f"thread {i} ({kind}) diverged"
