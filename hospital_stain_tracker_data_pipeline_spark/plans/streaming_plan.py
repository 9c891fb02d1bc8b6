"""Streaming plan entries: run availableNow streaming pipelines over
the events fixture. Each produces a DETERMINISTIC batch-equivalent
result, so every entry carries a full DuckDB oracle — timestamps are
reduced to floored epoch seconds / formatted strings for cross-engine
comparability (the ``sort_limit``/``stream_dedup`` trick)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..streaming.ingest_stream import stream_ingest_events

# Exact integer epoch-seconds — shared with the relational oracles
# (see the rationale at relational.TSEC_EXPR).
from .relational import TSEC_EXPR as _TSEC


def q_stream_events_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 op-stream-ingest/replay/obs: one availableNow pass over the
    events parquet → validate → natural-key upsert → read back. The
    merged table is deterministic (validation is a pure filter, event
    ids are the merge key), so it gets a full DuckDB oracle; ts is
    emitted as floored epoch seconds and event_date formatted, making
    every output column cross-engine hashable."""
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="stream_ingest_")
    # the file source wants a directory; stage the fixture via symlink
    input_dir = os.path.join(work, "incoming")
    os.makedirs(input_dir)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(input_dir, "events.parquet"),
    )
    res = stream_ingest_events(spark, input_dir, work)
    return (
        spark.read.parquet(res.table_path)
        .select(
            "event_id",
            F.col("ts").cast("long").alias("tsec"),
            "user_id",
            "event_type",
            "value",
            "props",
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        )
        .orderBy("event_id")
    )


# The QUALIFY encodes the natural-key merge itself (last-writer-wins on
# version_col=ts, per LakeTable.upsert) instead of assuming event_ids
# are unique in the fixture — a redelivered/updated event_id must
# resolve to the newest write on both engines.
SQL_STREAM_EVENTS_INGEST = f"""
SELECT event_id,
       {_TSEC.format(c="ts")} AS tsec,
       user_id, event_type, value, props,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_date
FROM events
WHERE event_id IS NOT NULL AND event_type IS NOT NULL
  AND value IS NOT NULL AND value >= 0
QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) = 1
ORDER BY event_id
"""


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
    per-user gap sessionization. The fixture arrives as one batch, so
    every session (including the open tail) is emitted exactly once —
    the output equals batch sessionization at per-session granularity
    and gets the session-gap SQL oracle below (the batch-equivalence
    test in tests/test_streaming.py pins the same identity)."""
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


# Same session-gap construction as relational.SQL_SESSIONIZE, kept at
# per-session granularity. The streaming sessionizer numbers sessions
# from 0 per user; the running-sum form numbers from 1 → the -1 below.
# CASTs guard DuckDB's HUGEINT widening of SUM (typed-hash parity).
# ts IS NOT NULL mirrors the operator's explicit null-ts drop — a null
# event time carries no position in a gap sessionization.
SQL_STREAM_SESSIONIZE = f"""
WITH base AS (
  SELECT user_id, event_id, {_TSEC.format(c="ts")} AS tsec, ts
  FROM events
  WHERE ts IS NOT NULL
), gaps AS (
  SELECT user_id, ts, event_id, tsec,
         CASE WHEN tsec - LAG(tsec) OVER w > 1800
                OR LAG(tsec) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, tsec,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id - 1 AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(tsec) - MIN(tsec) AS duration_s
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


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
