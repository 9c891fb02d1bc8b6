"""Streaming plan entry: run the availableNow ingest over the events
fixture and return the loaded clean table (rows-only driver check —
streaming isn't SQL-expressible for the DuckDB oracle)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..streaming.ingest_stream import stream_ingest_events


def q_stream_events_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 op-stream-ingest/replay/obs: one availableNow pass over the
    events parquet → validate → natural-key upsert → read back."""
    work = tempfile.mkdtemp(prefix="stream_ingest_")
    # the file source wants a directory; stage the fixture via symlink
    input_dir = os.path.join(work, "incoming")
    os.makedirs(input_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(input_dir, "events.parquet"),
    )
    res = stream_ingest_events(spark, input_dir, work)
    return spark.read.parquet(res.table_path).select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "event_date"
    )


def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window + watermark over the events stream
    (availableNow). Complete-mode memory sink → every window emitted →
    the result equals the batch per-day rollup, so it gets a full
    DuckDB oracle despite being a streaming plan."""
    from ..streaming.ingest_stream import stream_windowed_event_counts

    work = tempfile.mkdtemp(prefix="stream_window_")
    input_dir = os.path.join(work, "incoming")
    os.makedirs(input_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(input_dir, "events.parquet"),
    )
    return stream_windowed_event_counts(spark, input_dir).orderBy(
        "window_day", "event_type"
    )


SQL_STREAM_WINDOWED_COUNTS = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_day, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_day, event_type
"""


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user gap sessionization. Cross-batch state semantics → rows-only
    driver check; the batch-equivalence test lives in
    tests/test_streaming.py."""
    work = tempfile.mkdtemp(prefix="stream_sess_")
    input_dir = os.path.join(work, "incoming")
    os.makedirs(input_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(input_dir, "events.parquet"),
    )
    from ..streaming.ingest_stream import stream_sessionize_events

    return stream_sessionize_events(spark, input_dir).orderBy(
        "user_id", "session_id"
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the fixture is staged TWICE (every
    event redelivered), ``dropDuplicatesWithinWatermark`` on event_id
    collapses the redelivery in-stream. Deliveries are byte-identical,
    so the surviving row is value-deterministic and the result gets a
    full DuckDB oracle: each event exactly once."""
    from ..streaming.ingest_stream import stream_dedup_events

    work = tempfile.mkdtemp(prefix="stream_dedup_")
    input_dir = os.path.join(work, "incoming")
    os.makedirs(input_dir)
    for copy in ("a", "b"):
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(input_dir, f"events_{copy}.parquet"),
        )
    return stream_dedup_events(spark, input_dir).orderBy("event_id")


SQL_STREAM_DEDUP = """
SELECT event_id, user_id, event_type, value
FROM events ORDER BY event_id
"""
