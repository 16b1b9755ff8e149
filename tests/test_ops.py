"""Training-data ops vs their DuckDB SQL mirrors at sf0.001."""

import pandas as pd
import pytest

from holmes_extractor_spark.ops import dedup, multimodal, similarity
from holmes_extractor_spark.ops import text_analysis as ta


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        elif df[c].dtype.kind in "bui":
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def check(sdf, ddb, sql):
    got, exp = _norm(sdf.toPandas()), _norm(ddb.execute(sql).df())
    assert got.shape == exp.shape
    pd.testing.assert_frame_equal(got, exp)


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_token_counts(documents, ddb):
    check(ta.token_counts(documents), ddb, ta.token_counts_sql())


def test_lang_id(documents, ddb):
    check(ta.lang_id(documents), ddb, ta.lang_id_sql())


def test_lang_id_accuracy_on_real_text(spark):
    # the testdata documents are language-agnostic word salad, so
    # accuracy is asserted on planted natural-language rows instead
    rows = [
        (1, "the cat and the dog sat in the house and it was warm", "en"),
        (2, "der hund und die katze sind nicht in der wohnung", "de"),
        (3, "le chat est dans la maison et les chiens sont pour toi", "fr"),
        (4, "el perro y el gato es una historia para los niños", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["pred_lang"] for r in ta.lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_fingerprints(documents, ddb):
    check(ta.fingerprints(documents), ddb, ta.fingerprints_sql())


def test_simhash(documents, ddb):
    check(ta.simhash(documents), ddb, ta.simhash_sql())


def test_exact_dedup_finds_planted(spark, ddb):
    rows = [(1, "the same text"), (2, "the same text"), (3, "unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_dedup(df).collect()
    assert len(out) == 1 and out[0]["keeper_doc_id"] == 1 and out[0]["n_copies"] == 2


def test_jaccard(documents, ddb):
    check(dedup.ngram_jaccard_pairs(documents, 0.5), ddb, dedup.ngram_jaccard_sql(0.5))


def test_minhash(documents, ddb):
    check(dedup.minhash_lsh_pairs(documents, 0.5), ddb, dedup.minhash_lsh_sql(0.5))


def test_minhash_band_bucket_capped(spark):
    # degenerate-bucket guard: mass-duplicated docs share every band
    # bucket; with the cap below the group size the O(n²) band join is
    # skipped (mirrors embedding_neardup's MAX_BUCKET_SIZE)
    rows = [(i, "a b c d e f g h") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(df, 0.5).count()
    capped = dedup.minhash_lsh_pairs(df, 0.5, max_bucket_size=7).count()
    assert uncapped == 28  # 8 choose 2
    assert capped == 0


def test_minhash_cap_sql_mirror(documents, ddb):
    check(dedup.minhash_lsh_pairs(documents, 0.5, max_bucket_size=3),
          ddb, dedup.minhash_lsh_sql(0.5, max_bucket_size=3))


def test_minhash_identical_docs_agree(spark):
    rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["agree"]
           for r in dedup.minhash_lsh_pairs(df, 0.5).collect()}
    assert out.get((1, 2)) == 1.0 and (1, 3) not in out


def test_ann_brute_force(embeddings, ddb):
    check(similarity.brute_force_topk(embeddings), ddb, similarity.brute_force_topk_sql())


def test_ann_lsh(embeddings, ddb):
    check(similarity.lsh_topk(embeddings), ddb, similarity.lsh_topk_sql())


def test_lsh_recall_vs_brute_force(embeddings):
    bf = {(r["query_id"], r["neighbor_id"])
          for r in similarity.brute_force_topk(embeddings, 5, 5).collect()}
    ann = {(r["query_id"], r["neighbor_id"])
           for r in similarity.lsh_topk(embeddings, 5, 5).collect()}
    # LSH with 6 planes on random vectors: expect meaningful recall
    assert len(ann & bf) / len(bf) >= 0.2


def test_embedding_neardup_bucket_cap(spark):
    # dense-bucket guard: identical vectors all share every table's
    # bucket; with the cap below the group size the O(n²) candidate
    # join is skipped entirely (mirrors the shingle df cap)
    dim = 8
    same = [1.0] * dim
    rows = [(i, same) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = similarity.embedding_neardup(df, 0.95, dim=dim).count()
    capped = similarity.embedding_neardup(df, 0.95, dim=dim,
                                          max_bucket_size=5).count()
    assert uncapped == 15  # 6 choose 2
    assert capped == 0


def test_embedding_neardup_cap_sql_mirror(embeddings, ddb):
    # both sides drop the same buckets, so parity holds under the cap
    check(similarity.embedding_neardup(embeddings, 0.9, max_bucket_size=12),
          ddb, similarity.embedding_neardup_sql(0.9, max_bucket_size=12))


def test_blob_metadata(documents, ddb):
    blobs = multimodal.documents_as_blobs(documents)
    got = multimodal.blob_metadata(blobs).select("doc_id", "n_bytes", "magic")
    check(got, ddb, multimodal.blob_metadata_sql())


def test_blob_features_deterministic(documents):
    blobs = multimodal.documents_as_blobs(documents.limit(20))
    f1 = multimodal.extract_features(blobs).toPandas().sort_values("doc_id")
    f2 = multimodal.extract_features(blobs).toPandas().sort_values("doc_id")
    assert f1["features"].map(tuple).tolist() == f2["features"].map(tuple).tolist()
    assert all(len(f) == 8 for f in f1["features"])


def test_decode_stub_gated(documents):
    blobs = multimodal.documents_as_blobs(documents)
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        multimodal.decode_media(blobs)


def test_frame_sample_shape(documents):
    blobs = multimodal.documents_as_blobs(documents.limit(5))
    frames = multimodal.frame_sample(blobs).collect()
    assert all(len(r["frame"]) <= 64 for r in frames)
    assert {r["frame_idx"] for r in frames} <= {0, 1, 2, 3}
