"""Graph materialize + per-partition lineage manifests + metrics —
the north rule's checkpoint-resume and observability requirements.

Tables are written as partitioned parquet (the local stand-in for
Iceberg — same layout, partition columns, and snapshot-style manifest;
on a real cluster the writes go through the Iceberg catalog and the
manifest fields map to Iceberg snapshot ids). Every stage writes:

- the data, partitioned by ``bucket`` (salted hash of url) so host-level
  skew never concentrates in one file/partition;
- ``_manifest.json``: stage name, input fingerprint, row count, bucket
  row counts (skew visibility), wall seconds — enough to decide on
  restart whether the stage can be skipped (checkpoint-resume);
- a row in the ``metrics`` table (docs/sec, triples/sec, skew ratio),
  FIXTURES.md §5e.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 32


def _with_bucket(df: DataFrame, col: str = "url") -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int"))


def write_stage(df: DataFrame, path: str, stage: str, run_id: str,
                input_fingerprint: str, bucket_col: str = "url") -> dict:
    """Write a stage table with lineage manifest; returns the manifest.

    Resume contract: if ``_manifest.json`` exists with the same
    ``input_fingerprint``, the caller skips recompute (see
    ``read_or_compute``)."""
    t0 = time.time()
    out = _with_bucket(df, bucket_col)
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    counts = written.groupBy("bucket").count().collect()
    per_bucket = {int(r["bucket"]): int(r["count"]) for r in counts}
    total = sum(per_bucket.values())
    secs = time.time() - t0
    mx = max(per_bucket.values()) if per_bucket else 0
    avg = total / len(per_bucket) if per_bucket else 0
    manifest = {
        "stage": stage,
        "run_id": run_id,
        "input_fingerprint": input_fingerprint,
        "rows": total,
        "bucket_rows": per_bucket,
        "seconds": round(secs, 3),
        "rows_per_sec": round(total / secs, 2) if secs > 0 else None,
        "skew_ratio": round(mx / avg, 4) if avg else None,
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_or_compute(spark: SparkSession, path: str, stage: str, run_id: str,
                    input_fingerprint: str, compute, bucket_col: str = "url") -> tuple[DataFrame, dict]:
    """Checkpoint-resume: reuse the stage table if its manifest matches
    the input fingerprint, else recompute + rewrite. ``compute`` is a
    thunk returning the stage DataFrame."""
    mpath = os.path.join(path, "_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        if m.get("input_fingerprint") == input_fingerprint:
            m["resumed"] = True
            return spark.read.parquet(path), m
    df = compute()
    m = write_stage(df, path, stage, run_id, input_fingerprint, bucket_col)
    m["resumed"] = False
    return spark.read.parquet(path), m


def metrics_rows(spark: SparkSession, manifests: list[dict]) -> DataFrame:
    rows = [
        (m["run_id"], m["stage"], -1, m["rows"], m["seconds"],
         m.get("rows_per_sec"), m.get("skew_ratio"))
        for m in manifests
    ]
    return spark.createDataFrame(
        rows,
        "run_id string, stage string, partition_id int, rows long, "
        "seconds double, rows_per_sec double, skew_ratio double")


def run_pipeline(spark: SparkSession, sf_dir: str, warehouse: str,
                 run_id: str = "run0", n_pages: int | None = None) -> dict:
    """Full KG-construction job: pages → docs → postings/edges/words →
    linking → canonicalization → graph tables, each stage checkpointed.

    Returns {'tables': {name: DataFrame}, 'manifests': [...]}.
    """
    from ..fixtures import build_pages
    from .canonicalize import attach_entity_ids, build_entities
    from .ingest import clean_pages
    from .linking import link_edges, ontology_closure
    from .parse_stage import extract_edges, extract_words, parse_pages
    from .postings import build_postings, corpus_frequencies

    fp = f"{sf_dir}|{n_pages}|v1"
    manifests = []

    pages = clean_pages(build_pages(spark, sf_dir, n_pages))
    docs, m = read_or_compute(
        spark, f"{warehouse}/docs", "parse", run_id, fp,
        lambda: parse_pages(pages.repartition(spark.sparkContext.defaultParallelism, "url")))
    manifests.append(m)

    postings, m = read_or_compute(
        spark, f"{warehouse}/postings", "postings", run_id, fp,
        lambda: build_postings(docs))
    manifests.append(m)

    edges_raw, m = read_or_compute(
        spark, f"{warehouse}/edges_raw", "edges", run_id, fp,
        lambda: extract_edges(docs))
    manifests.append(m)

    words, m = read_or_compute(
        spark, f"{warehouse}/words", "words", run_id, fp,
        lambda: extract_words(docs))
    manifests.append(m)

    closure = ontology_closure(spark)
    linked = link_edges(edges_raw, closure)
    entities = build_entities(linked, closure)
    graph_edges, m = read_or_compute(
        spark, f"{warehouse}/graph_edges", "graph", run_id, fp,
        lambda: attach_entity_ids(linked, entities))
    manifests.append(m)

    predicates = (
        edges_raw.groupBy("template", "pred")
        .agg(F.count("*").alias("n_instances"))
        .withColumn("pred_id", F.xxhash64("template", "pred"))
    )
    mdf = metrics_rows(spark, manifests)
    mdf.write.mode("append").parquet(f"{warehouse}/metrics")
    return {
        "tables": {
            "docs": docs, "postings": postings, "edges": edges_raw,
            "words": words, "entities": entities,
            "graph_edges": graph_edges, "predicates": predicates,
        },
        "manifests": manifests,
    }
