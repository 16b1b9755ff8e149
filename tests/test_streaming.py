"""Structured Streaming tests (availableNow triggers → deterministic)."""

import pytest
from pyspark.sql import functions as F

from holmes_extractor_spark.fixtures import build_pages
from holmes_extractor_spark.streaming import parse_pages_stream, windowed_event_counts


def test_streaming_parse_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "pages_src")
    build_pages(spark, sf_dir, n_pages=40).write.parquet(src)
    q = parse_pages_stream(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 40
    assert out.select("url").distinct().count() == 40
    # incremental append: new files processed without reprocessing old
    build_pages(spark, sf_dir, n_pages=50).filter(
        F.col("page_id") >= 40).write.mode("append").parquet(src)
    q2 = parse_pages_stream(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 50


def test_windowed_event_counts(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = (spark.readStream.schema(events.schema).parquet(src))
    agg = windowed_event_counts(stream, window="10 minutes", watermark="30 minutes")
    q = (agg.writeStream.format("memory").queryName("wincounts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from wincounts")
    batch = (events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
             .agg(F.count("*").alias("n")))
    # append mode emits only watermark-closed windows; all-but-last
    # windows must match the batch result exactly
    got_map = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    batch_map = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got_map
    for k, v in got_map.items():
        assert batch_map[k] == v
