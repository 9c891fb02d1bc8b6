"""Structured Streaming ingest (SURVEY.md §2.9)."""

from .ingest_stream import stream_ingest_events  # noqa: F401
