"""Similarity search over an embedding column (`array<float>`).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Query side broadcast; dot products as JVM-side ``zip_with`` +
  ``aggregate`` (no Python, no UDF).
- ``lsh_topk``: random-hyperplane LSH variant — the scale path. Bucket
  assignment is a deterministic integer-arithmetic signature, so
  candidates co-locate in one shuffle on (bucket); at 100 TB the
  brute-force cross join is impossible while the bucket join touches
  only same-signature pairs.
- ``embedding_neardup``: near-duplicate pairs (cosine ≥ τ) within LSH
  buckets — the embedding tier of the dedup ladder.

Hyperplanes are pseudo-planes derived from index arithmetic
(component j of plane p = ((j*37 + p*101) mod 19) - 9) so the DuckDB
oracle can reproduce bucketing exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_TABLES = 4   # independent LSH tables (union of candidates)
N_PLANES = 4   # hyperplanes per table → 16 buckets per table
_PLANE = lambda p, j: ((j * 37 + p * 101) % 19) - 9  # noqa: E731


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6)


def _cosine_normed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with precomputed per-vector norms. Value-identical to
    `_cosine` (same sqrt(dot(v,v)) arithmetic, evaluated once per
    vector instead of once per candidate pair) — the DuckDB oracles
    keep the inline form and still hash-match."""
    return F.round(_dot(a, b) / (na * nb), 6)


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact top-k neighbors by cosine for the first `n_queries`
    vectors. (query_id, neighbor_id, cosine, rank). Norms are a
    per-vector column computed before the join — the pair expression is
    one dot product, not three."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v")) \
        .withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine_normed(F.col("qv"), F.col("v"),
                       F.col("qn"), F.col("n")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def brute_force_topk_sql(n_queries: int = 5, k: int = 5) -> str:
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM emb q JOIN emb e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _bucket(v: Column, table: int, dim: int) -> Column:
    """LSH signature for one table: bit p = sign(v · plane_{table,p})."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(float(_PLANE(table * N_PLANES + p, j)))
                          for j in range(dim)])
        dot = _dot(v, plane)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_lsh_bucket(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """One row per (vec, table): (vec_id, v, table, bucket). Multi-table
    LSH — candidates are unioned across tables, the standard recall
    lever for random-hyperplane LSH."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v")) \
        .withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    tables = F.explode(F.array(*[
        F.struct(F.lit(t).alias("table"),
                 _bucket(F.col("v"), t, dim).alias("bucket"))
        for t in range(N_TABLES)])).alias("tb")
    return emb.select("vec_id", "v", "n", tables).select(
        "vec_id", "v", "n", F.col("tb.table").alias("table"),
        F.col("tb.bucket").alias("bucket"))


def lsh_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any table's
    bucket with the query. One shuffle on (table, bucket); recall vs
    brute force is the standard multi-table LSH tradeoff."""
    emb = with_lsh_bucket(embeddings, dim)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"), "table", "bucket")
    pairs = (emb.join(F.broadcast(q), ["table", "bucket"])
             .filter(F.col("vec_id") != F.col("query_id")))
    # one query_id-keyed exchange serves both the cross-table dedup and
    # the rank window (hash(query_id) satisfies the dedup's clustering
    # on the superset key — guide §2.4)
    scored = (pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine_normed(F.col("qv"), F.col("v"),
                       F.col("qn"), F.col("n")).alias("cosine"))
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _bucket_sql(v: str, table: int, dim: int = 64) -> str:
    terms = []
    for p in range(N_PLANES):
        plane = "[" + ",".join(
            str(float(_PLANE(table * N_PLANES + p, j))) for j in range(dim)) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({v}, {plane}) > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _be_cte(dim: int = 64) -> str:
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, {_bucket_sql('v', t, dim)} AS bucket FROM emb"
        for t in range(N_TABLES))
    return f"""
emb AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
be AS ({per_table})"""


def lsh_topk_sql(n_queries: int = 5, k: int = 5, dim: int = 64) -> str:
    return f"""
WITH {_be_cte(dim)},
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM be q JOIN be e ON e.tbl = q.tbl AND e.bucket = q.bucket AND e.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


MAX_BUCKET_SIZE = 10_000


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.95,
                      dim: int = 64,
                      max_bucket_size: int = MAX_BUCKET_SIZE) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), candidates
    blocked by (table, bucket), deduped across tables.

    Dense buckets are dropped before the self-join (the analogue of the
    shingle document-frequency cap in ngram_jaccard_pairs): at corpus
    scale one degenerate bucket — zero vectors, clusters of identical
    boilerplate embeddings — would otherwise create O(n²) candidate
    pairs in a single task. Bounds the join at max_bucket_size²/2 pairs
    per bucket; a dropped bucket's members can still pair in their
    other N_TABLES-1 buckets."""
    emb = with_lsh_bucket(embeddings, dim)
    # dense-bucket cap as a window count over the same (table, bucket)
    # partitioning the self-join needs: one exchange serves the cap and
    # both join sides (same pattern as minhash_lsh_pairs /
    # ngram_jaccard_pairs — guide §2.4), replacing the former
    # aggregate + broadcast join-back
    wb = Window.partitionBy("table", "bucket")
    emb = (emb.withColumn("_n", F.count("*").over(wb))
           .filter(F.col("_n") <= max_bucket_size).drop("_n"))
    pairs = (
        emb.alias("x").join(emb.alias("y"),
                            (F.col("x.table") == F.col("y.table"))
                            & (F.col("x.bucket") == F.col("y.bucket"))
                            & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"),
                _cosine_normed(F.col("x.v"), F.col("y.v"),
                               F.col("x.n"), F.col("y.n")).alias("cosine"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return pairs.filter(F.col("cosine") >= threshold).select("vec_a", "vec_b", "cosine")


def embedding_neardup_sql(threshold: float = 0.95, dim: int = 64,
                          max_bucket_size: int = MAX_BUCKET_SIZE) -> str:
    return f"""
WITH {_be_cte(dim)},
ok AS (
  SELECT tbl, bucket FROM be GROUP BY tbl, bucket
  HAVING count(*) <= {max_bucket_size}
),
bec AS (SELECT be.* FROM be JOIN ok USING (tbl, bucket))
SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine
FROM bec x JOIN bec y ON y.tbl = x.tbl AND y.bucket = x.bucket AND x.vec_id < y.vec_id
WHERE round(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) >= {threshold}
ORDER BY vec_a, vec_b
"""
