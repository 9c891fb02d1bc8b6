"""JSONL (newline-delimited JSON) source/sink — the interchange format
training corpora usually arrive in (one document object per line).

Same schema-on-read discipline as the CSV source (SURVEY.md §2.1/§2.2):
an EXPLICIT schema — never inference, which would scan 100 TB twice and
silently widen types — plus a required-field check and a corrupt-record
side-channel instead of batch failure (the op-parse-date philosophy:
route bad rows, don't crash the job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejected) from a JSONL path/glob/URI.

    Malformed lines land in ``_corrupt_record`` (PERMISSIVE mode) and
    rows missing a required field join them — both come back on the
    reject side with a reason column, mirroring the CSV validation
    contract. The valid side carries exactly the declared schema."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    reason = F.when(F.col(_CORRUPT).isNotNull(), "malformed json")
    for field in required:
        reason = reason.when(F.col(field).isNull(), f"{field} is required")
    tagged = raw.withColumn("_reject_reason", reason)
    cols = [f.name for f in schema.fields]
    valid = tagged.filter(F.col("_reject_reason").isNull()).select(*cols)
    rejected = tagged.filter(F.col("_reject_reason").isNotNull()).select(
        *cols, _CORRUPT, "_reject_reason"
    )
    return valid, rejected


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition — the export
    shape downstream tokenizer/training jobs consume."""
    df.write.mode(mode).json(path)
