"""Z-order lake layout + footer-stats file skipping.

Pins:
- round-trip identity: the rewrite changes LAYOUT only (same row
  multiset, NULLs included);
- the pruning trade that justifies the curve: a single-column sort
  prunes perfectly on its leading column and NOT AT ALL on the other;
  the Z-order layout prunes well on BOTH;
- the safety property of stats-based skipping: a file containing a
  matching row is NEVER skipped (report vs a pyarrow brute-force scan
  of every file);
- date-column support (epoch-day mapping) end to end;
- guards: non-range-prunable column types, curve bit budget, unknown
  columns, empty paths.
"""

from __future__ import annotations

import datetime
import glob
import os

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.pipeline.lake import (
    file_skipping_report,
    zorder_write,
)


def _xy(spark, n=40000):
    return spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )


def _multiset_digest(df):
    return df.selectExpr(
        "count(*) AS n",
        "sum(x) AS sx",
        "sum(y) AS sy",
        "sum(payload) AS sp",
        "sum(cast(xxhash64(x, y, payload) AS decimal(38, 0))) AS h",
    ).first()


def test_zorder_roundtrip_is_layout_only(spark, tmp_path):
    df = _xy(spark)
    rec = zorder_write(df, str(tmp_path / "z"), ["x", "y"], n_files=16)
    back = spark.read.parquet(str(tmp_path / "z"))
    assert _multiset_digest(back) == _multiset_digest(df)
    assert sorted(back.columns) == ["payload", "x", "y"]  # _z dropped
    assert rec["cols"] == ["x", "y"] and len(rec["boundaries"]["x"]) == 15

    # NULLs in a curve column survive (they rank 0, they don't vanish)
    withnull = df.withColumn(
        "y", F.when(F.col("payload") % 7 == 0, None).otherwise(F.col("y"))
    )
    zorder_write(withnull, str(tmp_path / "zn"), ["x", "y"], n_files=8)
    back2 = spark.read.parquet(str(tmp_path / "zn"))
    assert back2.count() == withnull.count()
    assert (
        back2.filter("y IS NULL").count()
        == withnull.filter("y IS NULL").count()
    )


def test_zorder_rewrites_a_table_over_its_own_path(spark, tmp_path):
    """The natural maintenance call — read a table, Z-order it back
    onto the SAME path — must work (the frame is pinned before the
    overwrite truncates the input files, the LakeTable.upsert
    read-write-same-path discipline)."""
    df = _xy(spark, n=5000)
    p = str(tmp_path / "t")
    df.write.parquet(p)
    before = _multiset_digest(spark.read.parquet(p))
    zorder_write(spark.read.parquet(p), p, ["x", "y"], n_files=8)
    assert _multiset_digest(spark.read.parquet(p)) == before
    assert file_skipping_report(p, {"y": (100, 160)})["files_skipped"] > 0


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """THE trade: sort-by-x prunes x-ranges perfectly and y-ranges not
    at all; Z-order prunes both. The y-range is where a 100 TB scan
    either reads everything or skips ~2/3 of the lake."""
    df = _xy(spark)
    by_x = str(tmp_path / "by_x")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(by_x)
    )
    z = str(tmp_path / "z")
    zorder_write(df, z, ["x", "y"], n_files=16)

    pred_y = {"y": (100, 160)}
    rep_xy = file_skipping_report(by_x, pred_y)
    rep_zy = file_skipping_report(z, pred_y)
    assert rep_xy["files_skipped"] == 0  # x-sort is blind to y
    assert rep_zy["files_read"] < rep_xy["files_read"]
    assert rep_zy["files_read"] <= rep_zy["files_total"] // 2

    pred_x = {"x": (100, 160)}
    rep_xx = file_skipping_report(by_x, pred_x)
    rep_zx = file_skipping_report(z, pred_x)
    assert rep_xx["files_skipped"] >= rep_zx["files_skipped"]  # x-sort wins x
    assert rep_zx["files_skipped"] > 0  # but the curve still prunes x

    # a conjunctive box predicate prunes at least as hard as either leg
    rep_box = file_skipping_report(z, {"x": (100, 160), "y": (100, 160)})
    assert rep_box["files_read"] <= min(
        rep_zx["files_read"], rep_zy["files_read"]
    )


def test_file_skipping_never_skips_a_matching_file(spark, tmp_path):
    """Safety: stats bound the data, so every file that CONTAINS a
    matching row must be in the must-read set — verified against a
    pyarrow brute-force scan of each file (the report itself never
    touches data pages)."""
    df = _xy(spark, n=20000)
    z = str(tmp_path / "z")
    zorder_write(df, z, ["x", "y"], n_files=12)
    lo, hi = 250, 300
    rep = file_skipping_report(z, {"y": (lo, hi)})

    files = sorted(glob.glob(os.path.join(z, "**", "*.parquet"), recursive=True))
    containing = 0
    read_by_stats = 0
    for f in files:
        t = papq.read_table(f, columns=["y"])
        has = any(
            v is not None and lo <= v <= hi for v in t.column("y").to_pylist()
        )
        md = papq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        needed = False
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx["y"]).statistics
            if st is None or not st.has_min_max or (
                st.min <= hi and st.max >= lo
            ):
                needed = True
        if has:
            containing += 1
            assert needed, f"file with matching rows would be skipped: {f}"
        if needed:
            read_by_stats += 1
    assert rep["files_read"] == read_by_stats
    assert rep["files_read"] >= containing > 0


def test_zorder_date_column(spark, tmp_path):
    df = spark.range(5000).select(
        F.date_add(
            F.to_date(F.lit("2024-01-01")), (F.col("id") % 365).cast("int")
        ).alias("day"),
        (F.xxhash64("id") % 100).alias("region"),
        F.col("id").alias("payload"),
    )
    z = str(tmp_path / "z")
    zorder_write(df, z, ["day", "region"], n_files=8)
    back = spark.read.parquet(z)
    assert back.count() == 5000
    rep = file_skipping_report(
        z,
        {"day": (datetime.date(2024, 3, 1), datetime.date(2024, 3, 10))},
    )
    assert rep["files_skipped"] > 0
    # half-open range: everything after Dec 1
    rep2 = file_skipping_report(z, {"day": (datetime.date(2024, 12, 1), None)})
    assert 0 < rep2["files_read"] < rep2["files_total"]


def test_zorder_guards(spark, tmp_path):
    df = _xy(spark, n=100).withColumn("name", F.lit("abc"))
    with pytest.raises(ValueError, match="range-prunable"):
        zorder_write(df, str(tmp_path / "a"), ["x", "name"])
    with pytest.raises(ValueError, match="not in frame"):
        zorder_write(df, str(tmp_path / "b"), ["nope"])
    with pytest.raises(ValueError, match="curve budget"):
        zorder_write(df, str(tmp_path / "c"), ["x", "y"], bits=17)
    with pytest.raises(ValueError, match="at least one"):
        zorder_write(df, str(tmp_path / "d"), [])
    with pytest.raises(ValueError, match="no parquet files"):
        file_skipping_report(str(tmp_path / "missing"), {"x": (0, 1)})
    z = str(tmp_path / "z")
    zorder_write(df, z, ["x"], n_files=2)
    with pytest.raises(ValueError, match="not in"):
        file_skipping_report(z, {"nope": (0, 1)})
