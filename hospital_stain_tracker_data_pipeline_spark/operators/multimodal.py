"""Multimodal column operators (SURVEY.md Phase 4): image/audio/video
as opaque ``binary`` payloads + typed metadata structs, processed with
Arrow-batched ``mapInPandas`` UDFs.

The decode step is STUBBED (the container has no image/audio libs) —
``decode_image_batch`` raises NotImplementedError unless
``fake_decode=True``, which produces a deterministic fake (payload-hash
seeded dimensions) so the Spark-side plumbing — schema, batch shape,
partitioning — is real and tested end-to-end.

Scale notes: payloads travel Arrow-batched (no per-row pickling); the
metadata columns let filters (mime, size) prune BEFORE the expensive
decode; keep payload columns out of shuffles by extracting features
early and dropping the binary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def to_media_table(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    source: str,
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Wrap any column as an opaque media payload with typed metadata —
    the ingestion shape for image/audio/video bytes."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(source).alias("source"),
        ).alias("meta"),
    )


def decode_image_batch(pdf: pd.DataFrame, fake_decode: bool) -> pd.DataFrame:
    """Per-Arrow-batch image decode. Real decode needs PIL/cv2 — absent
    in this environment, hence the deterministic fake (dimensions seeded
    from the payload hash) behind the flag."""
    if not fake_decode:
        raise NotImplementedError(
            "image decode requires PIL/cv2, not available in this environment; "
            "pass fake_decode=True for the deterministic test fake"
        )
    out = []
    for media_id, payload, mime in zip(
        pdf["media_id"], pdf["payload"], pdf["mime"]
    ):
        raw = bytes(payload) if payload is not None else b""
        digest = hashlib.sha256(raw).hexdigest()
        seed = int(digest[:8], 16)
        out.append(
            {
                "media_id": media_id,
                "mime": mime,
                "width": 64 + seed % 1024,
                "height": 64 + (seed >> 10) % 1024,
                "n_bytes": len(raw),
                "sha256": digest,
            }
        )
    return pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])


def extract_image_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over media payloads: Arrow batches
    in, typed feature rows out; binary column dropped on the way out so
    downstream shuffles never carry payloads. The mime metadata column
    rides through so downstream filters can prune without re-joining."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake_decode)

    return media.select(
        "media_id", "payload", F.col("meta.mime").alias("mime")
    ).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
