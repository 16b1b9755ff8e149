"""Deduplication operators over the `documents` table.

Four tiers, cheapest-first (the standard web-corpus dedup ladder):

1. exact        — hash groupBy on the full text (one shuffle).
2. n-gram Jaccard — word-3-gram shingles, candidate pairs via a shared-
                  shingle equi-join (blocking), exact Jaccard verify.
3. MinHash LSH  — k-perm minhash signatures, banded bucket join,
                  signature-agreement estimate. Scales to corpora where
                  the shingle join is too dense: candidate generation
                  touches only (band, bucket) groups.
4. SimHash      — see text_analysis.simhash (Hamming-ball lookup).

All hashing uses the shared deterministic token_val/rolling-hash so
DuckDB oracles verify values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..nlp.tokenizer import tokenize_spark, tokenize_sql
from . import P_MOD, token_val_spark, token_val_sql

# ------------------------------------------------------------- exact

def exact_dedup(documents: DataFrame) -> DataFrame:
    """Duplicate groups by exact text: keeper = min doc_id.

    Groups on sha2(text) rather than the raw text so the shuffle moves
    32-byte keys instead of full document payloads — at 100 TB the
    difference is the whole corpus' bytes going over the wire."""
    return (
        documents.groupBy(F.sha2(F.col("text"), 256).alias("text_sha"))
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keeper_doc_id", "n_copies")
    )


def exact_dedup_sql() -> str:
    return """
SELECT min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY sha256(text) HAVING count(*) > 1
ORDER BY keeper_doc_id
"""


# ----------------------------------------------------- shingle common

SHINGLE_K = 3


def _shingles(documents: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct word-3-gram rolling hashes, computed
    as a pure array transform (no join, stays in codegen)."""
    toks = tokenize_spark(F.lower(F.col("text")))
    tvs = F.transform(toks, lambda t: token_val_spark(t))
    base = documents.select("doc_id", tvs.alias("tvs"))
    n = F.size(F.col("tvs"))

    def sh(i):
        a = F.element_at(F.col("tvs"), i + 1)
        b = F.element_at(F.col("tvs"), i + 2)
        c = F.element_at(F.col("tvs"), i + 3)
        return (((a * 131 + b) % P_MOD) * 131 + c) % P_MOD

    shingle_arr = F.when(
        n >= SHINGLE_K,
        F.transform(F.sequence(F.lit(0), n - SHINGLE_K), sh)
    ).otherwise(F.array().cast("array<long>"))
    return (base.select("doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle")))


def _shingles_cte() -> str:
    toks = tokenize_sql("lower(text)")
    tv = token_val_sql("t")
    return f"""
tv AS (
  SELECT doc_id, list_transform({toks}, t -> {tv}::BIGINT) AS tvs
  FROM documents
),
shingles AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(tvs) >= {SHINGLE_K} THEN
      [(((tvs[i + 1] * 131 + tvs[i + 2]) % {P_MOD}) * 131 + tvs[i + 3]) % {P_MOD}
       for i in range(len(tvs) - {SHINGLE_K - 1})]
    ELSE [] END)) AS shingle
  FROM tv
)"""


# ----------------------------------------------------- n-gram Jaccard

# shingles shared by more documents than this are dropped from
# candidate generation (boilerplate blocking-key cap): one navbar
# shingle shared by 10^6 docs would otherwise create 10^12 candidate
# pairs. Exact Jaccard is still computed over ALL shingles of the
# surviving candidate pairs, so only pairs whose ONLY common shingles
# are boilerplate are missed — the standard blocking trade-off.
MAX_SHINGLE_DF = 1000


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.5,
                        max_shingle_df: int = MAX_SHINGLE_DF) -> DataFrame:
    """Near-dup pairs with Jaccard ≥ threshold over the df-capped
    word-3-gram shingle sets. Shared-shingle equi-join (each shingle a
    blocking key) — never a cross join; hot (boilerplate) shingles are
    excluded from BOTH the join and the similarity, which (a) caps the
    candidate fan-out at max_shingle_df²/2 pairs per shingle and (b)
    makes the measure boilerplate-discounted: two docs are near-dups
    because they share RARE content, not a navbar."""
    from pyspark.sql import Window
    sh_all = _shingles(documents)
    # df cap as a window count over the shingle partitioning the
    # self-join needs anyway: ONE exchange of the shingle rows serves
    # the cap filter and both join sides (ReuseExchange), replacing the
    # former df-aggregate + join-back + cache (guide §2.4)
    wsh = Window.partitionBy("shingle")
    sh = (sh_all.withColumn("_df", F.count("*").over(wsh))
          .filter(F.col("_df") <= max_shingle_df).drop("_df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("x").join(sh.alias("y"),
                           (F.col("x.shingle") == F.col("y.shingle"))
                           & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter").cast("double")
                                       / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_sql(threshold: float = 0.5,
                      max_shingle_df: int = MAX_SHINGLE_DF) -> str:
    return f"""
WITH {_shingles_cte()},
rare_sh AS (
  SELECT s.* FROM shingles s JOIN (
    SELECT shingle FROM shingles GROUP BY shingle
    HAVING count(*) <= {max_shingle_df}
  ) r USING (shingle)
),
sizes AS (SELECT doc_id, count(*) AS n FROM rare_sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM rare_sh x JOIN rare_sh y
    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter::DOUBLE / (sa.n + sb.n - inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter::DOUBLE / (sa.n + sb.n - inter), 4) >= {threshold}
ORDER BY doc_a, doc_b
"""


# -------------------------------------------------------- MinHash LSH

N_PERM = 8
BANDS = 4  # rows per band = N_PERM // BANDS = 2
_AS = [2 * i + 3 for i in range(N_PERM)]   # odd multipliers
_BS = [97 * i + 11 for i in range(N_PERM)]


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>) minhash over shingles with k=8
    deterministic affine permutations h_i(s) = (a_i*s + b_i) mod P."""
    sh = _shingles(documents)
    aggs = [
        F.min((F.col("shingle") * _AS[i] + _BS[i]) % P_MOD).alias(f"m{i}")
        for i in range(N_PERM)
    ]
    return (sh.groupBy("doc_id").agg(*aggs)
            .select("doc_id", F.array(*[F.col(f"m{i}") for i in range(N_PERM)]).alias("sig")))


MAX_BAND_BUCKET = 10_000


def minhash_lsh_pairs(documents: DataFrame, min_agree: float = 0.5,
                      max_bucket_size: int = MAX_BAND_BUCKET) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket,
    scored by signature agreement fraction ≥ min_agree.

    At 100 TB the band join is the only shuffle and its key space
    (band, bucket-hash) is uniform by construction for distinct
    content — but mass-duplicated boilerplate all shares a band
    signature, making one degenerate bucket O(n²) pairs in a single
    task. Buckets larger than max_bucket_size are dropped before the
    self-join (the same cap as `embedding_neardup`); members of a
    dropped bucket still pair through their other BANDS-1 buckets."""
    from pyspark.sql import Window
    sig = minhash_signatures(documents)
    rows_per_band = N_PERM // BANDS
    # carry the (64-byte) signature through the band explode: the
    # agreement fraction is then computable directly on the joined
    # pair rows — no cache, no join back to the signature table, and
    # the whole operator is ONE shuffle of the band rows (the window's
    # (band, bucket) hash partitioning is exactly the self-join key, so
    # AQE/ReuseExchange share it) plus the final pair distinct
    bands = (sig.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("_", *[F.col("sig")[b * rows_per_band + r].cast("string")
                                        for r in range(rows_per_band)]).alias("bucket"))
            for b in range(BANDS)])).alias("bb"))
        .select("doc_id", "sig", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket")))
    # degenerate-bucket cap as a window count over the same partitioning
    # the join needs — one shuffle serves both
    wb = Window.partitionBy("band", "bucket")
    bands = (bands.withColumn("_n", F.count("*").over(wb))
             .filter(F.col("_n") <= max_bucket_size).drop("_n"))
    pairs = (
        bands.alias("x").join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
                F.col("x.sig").alias("sig_a"), F.col("y.sig").alias("sig_b"))
    )
    agree = pairs.withColumn("agree", F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                        lambda x: x)).cast("double") / N_PERM, 4))
    # agree is a pure function of the pair, so distinct on the full
    # output row dedups multi-band collisions exactly
    return (agree.filter(F.col("agree") >= min_agree)
            .select("doc_a", "doc_b", "agree").distinct())


def duplicate_clusters(documents: DataFrame, min_agree: float = 0.5) -> DataFrame:
    """Group near-duplicate docs into clusters: connected components
    over the MinHash-LSH pair graph (min-doc_id label propagation —
    the same CC machinery as entity canonicalization). Returns
    (cluster_id, members, size) for clusters of size ≥ 2: the keeper
    is cluster_id, the rest are droppable duplicates."""
    from ..pipeline.canonicalize import connected_components
    pairs = (minhash_lsh_pairs(documents, min_agree)
             .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")))
    nodes = (pairs.select(F.col("a").alias("word"))
             .unionByName(pairs.select(F.col("b").alias("word"))).distinct())
    comp = connected_components(nodes, pairs)
    return (comp.groupBy(F.col("canonical").alias("cluster_id"))
            .agg(F.sort_array(F.collect_list("word")).alias("members"),
                 F.count("*").alias("size"))
            .filter(F.col("size") >= 2)
            .select(F.col("cluster_id").cast("long").alias("cluster_id"),
                    F.concat_ws(",", F.transform("members", lambda m: m.cast("string"))).alias("members"),
                    F.col("size").cast("long").alias("size")))


def duplicate_clusters_sql(min_agree: float = 0.5,
                           max_bucket_size: int = MAX_BAND_BUCKET) -> str:
    """Recursive-CTE mirror: min-label connected components over the
    same pair graph."""
    rows_per_band = N_PERM // BANDS
    mins = ",\n         ".join(
        f"min((shingle * {_AS[i]} + {_BS[i]}) % {P_MOD}) AS m{i}"
        for i in range(N_PERM))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, ".format(b=b)
        + "||'_'||".join(f"CAST(m{b * rows_per_band + r} AS VARCHAR)"
                         for r in range(rows_per_band))
        + " AS bucket FROM sig"
        for b in range(BANDS))
    agree_expr = "(" + " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(N_PERM)
    ) + f")::DOUBLE / {N_PERM}"
    return f"""
WITH RECURSIVE {_shingles_cte()},
sig AS (
  SELECT doc_id,
         {mins}
  FROM shingles GROUP BY doc_id
),
bands0 AS ({band_rows}),
okb AS (
  SELECT band, bucket FROM bands0 GROUP BY band, bucket
  HAVING count(*) <= {max_bucket_size}
),
bands AS (SELECT bands0.* FROM bands0 JOIN okb USING (band, bucket)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
pairs AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b
  WHERE round({agree_expr}, 4) >= {min_agree}
),
nodes AS (SELECT a AS w FROM pairs UNION SELECT b FROM pairs),
pairs2 AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach(w, r) AS (
  SELECT w, w FROM nodes
  UNION
  SELECT reach.w, p.b FROM reach JOIN pairs2 p ON p.a = reach.r
),
comp AS (SELECT w, min(r) AS cluster_id FROM reach GROUP BY w)
SELECT cluster_id,
       string_agg(CAST(w AS VARCHAR), ',' ORDER BY w) AS members,
       count(*) AS size
FROM comp GROUP BY cluster_id HAVING count(*) >= 2
ORDER BY cluster_id
"""


def minhash_lsh_sql(min_agree: float = 0.5,
                    max_bucket_size: int = MAX_BAND_BUCKET) -> str:
    rows_per_band = N_PERM // BANDS
    mins = ",\n         ".join(
        f"min((shingle * {_AS[i]} + {_BS[i]}) % {P_MOD}) AS m{i}"
        for i in range(N_PERM))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, ".format(b=b)
        + "||'_'||".join(f"CAST(m{b * rows_per_band + r} AS VARCHAR)"
                         for r in range(rows_per_band))
        + " AS bucket FROM sig"
        for b in range(BANDS))
    agree_expr = "(" + " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(N_PERM)
    ) + f")::DOUBLE / {N_PERM}"
    return f"""
WITH {_shingles_cte()},
sig AS (
  SELECT doc_id,
         {mins}
  FROM shingles GROUP BY doc_id
),
bands0 AS ({band_rows}),
okb AS (
  SELECT band, bucket FROM bands0 GROUP BY band, bucket
  HAVING count(*) <= {max_bucket_size}
),
bands AS (SELECT bands0.* FROM bands0 JOIN okb USING (band, bucket)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, round({agree_expr}, 4) AS agree
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
WHERE round({agree_expr}, 4) >= {min_agree}
ORDER BY doc_a, doc_b
"""
