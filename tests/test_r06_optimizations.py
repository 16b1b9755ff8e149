"""Round-6 optimization equivalence tests: each r6 rewrite that changed
an operator's internals is pinned against the semantics it replaced.

- driver-side induced components (build_entities) vs the distributed
  min-label propagation it replaced
- _round_half_up vs Catalyst Round (the dict-vector embedding scan
  computes penalties in Python now)
- fused-parse explodes vs the separate Python extraction passes they
  replaced
- window-count df-cap (ngram) vs the aggregate+join cap it replaced
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_induced_components_match_distributed(spark):
    """The driver-side induced components (r6 build_entities path) must
    label exactly like the distributed min-label propagation, including
    the both-endpoints-present restriction."""
    from holmes_extractor_spark.pipeline.canonicalize import (
        _induced_components, connected_components)
    pair_rows = [("b", "a"), ("c", "b"), ("e", "d"), ("f", "g"),
                 ("x", "y"), ("y", "z"), ("p", "q")]
    # 'd' and 'q' absent from the corpus: (e,d) and (p,q) must not merge;
    # 'z' present only via the chain through 'y'
    nodes_list = ["a", "b", "c", "e", "f", "g", "x", "y", "z", "lone"]
    present = set(nodes_list)
    label = _induced_components(pair_rows, present)
    expected_local = {w: label.get(w, w) for w in nodes_list}

    nodes = spark.createDataFrame([(w,) for w in nodes_list], "word string")
    pairs = spark.createDataFrame(pair_rows, "a string, b string")
    dist = {r["word"]: r["canonical"]
            for r in connected_components(nodes, pairs).collect()}
    assert dist == expected_local
    # spot semantics: chains merge to min label, absent endpoints block
    assert expected_local["c"] == "a"
    assert expected_local["e"] == "e"      # d absent → no merge
    assert expected_local["z"] == "x"
    assert expected_local["lone"] == "lone"


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up (used by the local dict-vector embedding scan)
    must reproduce Catalyst Round(double, 8) bit-for-bit."""
    from holmes_extractor_spark.query.topic import _round_half_up
    vals = [0.123456785, 0.123456784999, 0.999999995, 1.0 / 3.0,
            0.85321478999, 2.0 ** -30, 0.56789012345, 0.0001234567849,
            0.93999999995, 0.6163 ** 0.5, 0.5323 ** 0.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    spark_rounded = [r["r"] for r in
                     df.select(F.round("x", 8).alias("r")).collect()]
    local = [_round_half_up(v, 8) for v in vals]
    assert local == spark_rounded


def test_fused_parse_matches_separate_passes(spark):
    """edges/words derived from the fused parse's nested columns must
    equal the separate Python extraction passes they replaced (r6),
    in plain AND question mode."""
    from holmes_extractor_spark.pipeline.parse_stage import (
        edges_from_docs_full, extract_edges, extract_edges_q,
        extract_words, parse_pages, parse_pages_full,
        words_from_docs_full)
    pages = spark.createDataFrame(
        [("u1", "en", "The dog chased the cat. Who opened the door?"),
         ("u2", "en", "Richard Paul Hudson came home."),
         ("u3", "de", "Die Frau gab dem Mann das Buch."),
         ("u4", "de", "Die Polizeiinformationsbroschüre ist interessant.")],
        "url string, lang string, text string")
    docs = parse_pages(pages)
    full = parse_pages_full(pages)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(edges_from_docs_full(full)) == rows(extract_edges(docs))
    assert rows(edges_from_docs_full(full, q=True)) == rows(extract_edges_q(docs))
    assert rows(words_from_docs_full(full)) == rows(extract_words(docs))


def test_ngram_window_cap_matches_aggregate_cap(spark):
    """The r6 window-count df-cap must keep exactly the shingle rows
    the former aggregate+join cap kept (tiny cap forces real drops)."""
    from holmes_extractor_spark.ops.dedup import _shingles
    docs = spark.createDataFrame(
        [(0, "one two three four five"),
         (1, "one two three four five"),
         (2, "one two three four five"),
         (3, "completely different text here now"),
         (4, "one two three something else entirely")],
        "doc_id long, text string")
    sh_all = _shingles(docs)
    cap = 2
    from pyspark.sql import Window
    wsh = Window.partitionBy("shingle")
    new = (sh_all.withColumn("_df", F.count("*").over(wsh))
           .filter(F.col("_df") <= cap).drop("_df"))
    rare = (sh_all.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= cap).select("shingle"))
    old = sh_all.join(rare, "shingle").select("doc_id", "shingle")
    assert (sorted(tuple(r) for r in new.select("doc_id", "shingle").collect())
            == sorted(tuple(r) for r in old.collect()))
    # the cap actually dropped something in this fixture
    assert new.count() < sh_all.count()
