"""Ingest stage: deterministic text extraction from `html`.

North-rule invariant: byte-identical extracted text per url vs the
`text` column. Extraction is a pure Spark column expression (JVM-side,
whole-stage-codegen) — strip tags, collapse the wrapper — NOT a Python
UDF, so it costs nothing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_text(html_col: Column) -> Column:
    """UTF-8 decode + tag strip. For the corpus's deterministic
    ``<html><body><p>…</p></body></html>`` wrapper this reproduces the
    original text byte-for-byte."""
    return F.regexp_replace(F.decode(html_col, "UTF-8"), "<[^>]+>", "")


def clean_pages(pages: DataFrame) -> DataFrame:
    """`pages_clean`: fill `text` from `html` when null, flag the
    byte-identity invariant, drop rows with neither."""
    extracted = extract_text(F.col("html"))
    return (
        pages
        .withColumn("extracted_text", extracted)
        .withColumn("text", F.coalesce(F.col("text"), F.col("extracted_text")))
        .withColumn("text_identical", F.col("extracted_text") == F.col("text"))
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        # reference rejects docs > 1,000,000 chars
        # (DocumentTooBigError, reference parsing.py:953-963)
        .filter(F.length("text") <= 1_000_000)
    )
