"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the catalog in
``hospital_stain_tracker_data_pipeline_spark.plans`` — one entry per operator from
SURVEY.md §2 plus the Phase-4 training-data extensions. Since round 7
every catalog entry carries a full DuckDB oracle (the IVF fit became
exact-integer and therefore SQL-replayable).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hospital_stain_tracker_data_pipeline_spark.plans import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the compare-shaped
    calendar-day lag/delta rollup (the reference's flagship read path,
    main.py:234-289)."""
    fn = CATALOG["window_lag_running"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle_sql
        for name, spec in CATALOG.items()
        if spec.oracle_sql is not None
    }
