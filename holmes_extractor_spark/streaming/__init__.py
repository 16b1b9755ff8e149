"""Structured Streaming ingestion.

The reference is batch-only (SURVEY.md §2: no watermarks/windows/
state anywhere in it); streaming here covers the web-scale ingestion
path: a pages stream parsed incrementally and an events stream with
watermarked tumbling-window aggregation — the two patterns a continuous
crawl feed needs.
"""

from .ingest_stream import parse_pages_stream, windowed_event_counts

__all__ = ["parse_pages_stream", "windowed_event_counts"]
