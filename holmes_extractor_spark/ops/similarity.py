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

N_PLANES = 6
_PLANE = lambda p, j: ((j * 37 + p * 101) % 19) - 9  # noqa: E731


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6)


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact top-k neighbors by cosine for the first `n_queries`
    vectors. (query_id, neighbor_id, cosine, rank)."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("cosine"))
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


def _bucket(v: Column, dim: int) -> Column:
    """LSH signature: bit p = sign(v · plane_p) as integer bucket."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(float(_PLANE(p, j))) for j in range(dim)])
        dot = _dot(v, plane)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_lsh_bucket(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    return embeddings.select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("bucket", _bucket(F.col("v"), dim))


def lsh_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. One shuffle on (bucket); quality vs brute force is the
    standard LSH recall tradeoff."""
    emb = with_lsh_bucket(embeddings, dim)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket")
    pairs = emb.join(F.broadcast(q), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "bucket",
        _cosine(F.col("qv"), F.col("v")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "bucket", "cosine", "rank"))


def _bucket_sql(v: str, dim: int = 64) -> str:
    terms = []
    for p in range(N_PLANES):
        plane = "[" + ",".join(str(float(_PLANE(p, j))) for j in range(dim)) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({v}, {plane}) > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def lsh_topk_sql(n_queries: int = 5, k: int = 5, dim: int = 64) -> str:
    b = _bucket_sql("v", dim)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
be AS (SELECT vec_id, v, {b} AS bucket FROM emb),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.bucket,
         round(list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
  FROM be q JOIN be e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, bucket, cosine, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.95, dim: int = 64) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), candidates
    blocked by LSH bucket."""
    emb = with_lsh_bucket(embeddings, dim)
    pairs = (
        emb.alias("x").join(emb.alias("y"),
                            (F.col("x.bucket") == F.col("y.bucket"))
                            & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"),
                _cosine(F.col("x.v"), F.col("y.v")).alias("cosine"))
    )
    return pairs.filter(F.col("cosine") >= threshold).select("vec_a", "vec_b", "cosine")


def embedding_neardup_sql(threshold: float = 0.95, dim: int = 64) -> str:
    b = _bucket_sql("v", dim)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
be AS (SELECT vec_id, v, {b} AS bucket FROM emb)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine
FROM be x JOIN be y ON y.bucket = x.bucket AND x.vec_id < y.vec_id
WHERE round(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) >= {threshold}
ORDER BY vec_a, vec_b
"""
