"""Fixture/table loaders (SURVEY.md §2.1 op-scan-table).

One parquet per table; ``spark.read.parquet`` gives columnar scan with
predicate pushdown and column pruning — expressing queries on top of
these loaders keeps filters/projections visible to Catalyst (check via
``PushedFilters``/``ReadSchema`` in ``.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_fixture_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — an illegal type for
        # Spark's reader unless read as long. The conf is runtime-
        # settable; set it here (not only in our session factory) so
        # the queries also work on a CALLER-provided vanilla session
        # (the driver passes its own SparkSession). Deliberately NOT
        # restored afterwards: execution is lazy, so resetting after
        # read() could flip the conf back before the scan actually
        # runs. Side effect: the caller's own TIMESTAMP(NANOS) parquet
        # reads in this session will also come back as bigint.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # floor-truncate nanos → microsecond timestamp — exactly what DuckDB
    # yields for the same column, keeping oracle parity.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_fixture_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    return {n: load_fixture_table(spark, sf_dir, n) for n in names}
