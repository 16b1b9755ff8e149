"""Scale-safety tests for the dedup ladder: collision-resistant token
hashing and hot-shingle (boilerplate) candidate capping."""

import pytest

from holmes_extractor_spark.ops import P_MOD, token_val_spark
from holmes_extractor_spark.ops.dedup import ngram_jaccard_pairs


def _py_token_val(tok: str) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * 131 + ord(ch)) % P_MOD
    return acc


def test_token_hash_distinguishes_same_shape_tokens(spark):
    # the round-1 hash was ascii(first)*31+len: cat == car == cow.
    # The char-fold hash must separate them.
    words = ["cat", "car", "cow", "can", "cap", "dog", "dot", "don"]
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["h"] for r in
           df.select("w", token_val_spark(F.col("w")).alias("h")).collect()}
    assert len(set(got.values())) == len(words)
    for w in words:
        assert got[w] == _py_token_val(w)


def test_token_hash_duckdb_mirror():
    import duckdb
    from holmes_extractor_spark.ops import token_val_sql
    words = ["cat", "car", "chase", "polizeiinformation", "a"]
    for w in words:
        (h,) = duckdb.sql(
            f"select {token_val_sql(repr(w))}").fetchone()
        assert h == _py_token_val(w), w


def test_hot_shingle_capped(spark):
    # 40 docs sharing ONE boilerplate sentence plus unique tails: with
    # the df cap at 10, the boilerplate shingles are excluded from
    # blocking, so no candidate pairs arise (the unique tails share
    # nothing) — without the cap this would be 40*39/2 = 780 pairs.
    boiler = "all rights reserved contact us for details"
    rows = [(i, f"{boiler} unique tail number {i} content {i * 7919}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=10)
    assert pairs.count() == 0
    # sanity: with a loose cap the boilerplate-only pairs DO appear
    loose = ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_df=1000)
    assert loose.count() > 0


def test_connected_components_long_chain(spark):
    # a 40-node chain (diameter 39) — the one-hop variant with 6 rounds
    # would split this into multiple clusters; pointer doubling must
    # produce ONE component labeled by the minimum
    from pyspark.sql import functions as F
    from holmes_extractor_spark.pipeline.canonicalize import connected_components
    n = 40
    nodes = spark.createDataFrame([(f"w{i:03d}",) for i in range(n)], "word string")
    pairs = spark.createDataFrame(
        [(f"w{i:03d}", f"w{i+1:03d}") for i in range(n - 1)], "a string, b string")
    comp = connected_components(nodes, pairs)
    canon = {r["word"]: r["canonical"] for r in comp.collect()}
    assert set(canon.values()) == {"w000"}
