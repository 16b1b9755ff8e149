"""Streaming stages.

- ``parse_pages_stream``: file-source stream of pages parquet →
  the same mapInPandas parse stage (stateless narrow map — identical
  code path as batch, so correctness transfers) → sink.
- ``windowed_event_counts``: watermarked tumbling-window counts over
  the events table (late data dropped past the watermark).

Run with ``trigger(availableNow=True)`` in tests: processes the backlog
then stops — deterministic and CI-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.parse_stage import parse_pages


def parse_pages_stream(spark: SparkSession, source_dir: str,
                       checkpoint_dir: str, out_dir: str):
    """Incrementally parse a growing directory of pages parquet files.
    Returns the started StreamingQuery (availableNow trigger)."""
    pages_schema = ("url string, warc_ts timestamp, html binary, "
                    "text string, lang string")
    stream = (
        spark.readStream.schema(pages_schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    docs = parse_pages(stream)
    return (
        docs.writeStream
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events_stream: DataFrame,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data — the canonical streaming aggregation shape."""
    return (
        events_stream
        # parquet timestamps may load as TIMESTAMP_NTZ; watermarks
        # require instant-typed event time
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "total_value")
    )
