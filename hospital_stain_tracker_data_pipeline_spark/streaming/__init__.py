"""Structured Streaming ingest (SURVEY.md §2.9)."""

from .ingest_stream import (  # noqa: F401
    stream_ann_ingest,
    stream_audio_dedup_ingest,
    stream_bloom_membership,
    stream_cms_frequencies,
    stream_hll_cardinality,
    stream_image_dedup_ingest,
    stream_ingest_events,
    stream_pdf_ingest,
    stream_quality_gate,
    stream_rank_quantiles,
    stream_video_dedup_ingest,
    stream_warc_ingest,
)
