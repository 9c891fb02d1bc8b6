"""Golden-value tests for the scalar metric expressions (FIXTURES.md §A7;
reference seed numbers backend/app/seed.py:47-55, formula
compute_metrics.py:11-21)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.functions.metrics import (
    bed_occ_pct_api,
    bed_occ_pct_etl,
    case_bucket,
    clamp,
    icu_occ_pct,
    strain_index,
)


def _eval(spark, rows, schema, exprs):
    df = spark.createDataFrame(rows, schema)
    return df.select(*exprs).collect()


def test_seed_golden(spark):
    # 1000 beds / 850 occupied / 100 icu / 92 icu-occupied
    # → bed 0.85, icu 0.92, strain 89.2
    [r] = _eval(
        spark,
        [(1000, 850, 100, 92)],
        "total int, occ int, icu int, icu_occ int",
        [
            bed_occ_pct_etl(F.col("occ"), F.col("total")).alias("bed"),
            icu_occ_pct(F.col("icu_occ"), F.col("icu")).alias("icu_pct"),
            strain_index(
                bed_occ_pct_etl(F.col("occ"), F.col("total")),
                icu_occ_pct(F.col("icu_occ"), F.col("icu")),
            ).alias("strain"),
        ],
    )
    assert r.bed == 0.85
    assert r.icu_pct == 0.92
    assert r.strain == 89.2


def test_icu_null_fallback_and_clamp(spark):
    # icu NULL → strain = clamp(bed·100); full occupancy → clamped 100
    rows = [(100, 90, None, None), (1, 1, 1, 1), (100, 0, None, None)]
    out = _eval(
        spark,
        rows,
        "total int, occ int, icu int, icu_occ int",
        [
            strain_index(
                bed_occ_pct_etl(F.col("occ"), F.col("total")),
                icu_occ_pct(F.col("icu_occ"), F.col("icu")),
            ).alias("strain")
        ],
    )
    assert [r.strain for r in out] == [90.0, 100.0, 0.0]


def test_zero_beds_etl_vs_api_variants(spark):
    # total_beds = 0 → ETL 0.0 (compute_metrics.py:56) vs API NULL (main.py:164)
    [r] = _eval(
        spark,
        [(0, 0)],
        "total int, occ int",
        [
            bed_occ_pct_etl(F.col("occ"), F.col("total")).alias("etl"),
            bed_occ_pct_api(F.col("occ"), F.col("total")).alias("api"),
        ],
    )
    assert r.etl == 0.0
    assert r.api is None


def test_icu_zero_beds_yields_null(spark):
    # icu_beds == 0 is falsy in the reference → NULL, not div-by-zero
    [r] = _eval(
        spark,
        [(0, 0)],
        "icu int, icu_occ int",
        [icu_occ_pct(F.col("icu_occ"), F.col("icu")).alias("icu_pct")],
    )
    assert r.icu_pct is None


def test_case_bucket_thresholds(spark):
    rows = [(85.0,), (80.0,), (70.0,), (69.9,)]
    out = _eval(
        spark, rows, "s double", [case_bucket(F.col("s")).alias("b")]
    )
    # > 80 CRISIS; >= 70 ELEVATED; else STABLE (dashboard.html:328-338)
    assert [r.b for r in out] == ["CRISIS", "ELEVATED", "ELEVATED", "STABLE"]


def test_clamp(spark):
    out = _eval(
        spark,
        [(-5.0,), (50.0,), (150.0,)],
        "x double",
        [clamp(F.col("x"), 0.0, 100.0).alias("c")],
    )
    assert [r.c for r in out] == [0.0, 50.0, 100.0]


def test_round_half_even_matches_python_round(spark):
    from hospital_stain_tracker_data_pipeline_spark.functions.metrics import round_half_even

    # .5-boundary cases where HALF_UP (F.round) and HALF_EVEN (Python
    # round, the reference) disagree: 0.125 → 0.12 vs 0.13
    vals = [0.125, 0.135, 2.5, 3.5, 89.225, 0.845]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        (r.he, r.hu)
        for r in df.select(
            round_half_even(F.col("x"), 2).alias("he"),
            F.round(F.col("x"), 2).alias("hu"),
        ).collect()
    ]
    for v, (he, _hu) in zip(vals, got):
        assert he == round(v, 2), (v, he, round(v, 2))
    # and they genuinely differ on an exactly-representable half case
    [r] = (
        spark.createDataFrame([(2.5,)], "x double")
        .select(
            round_half_even(F.col("x"), 0).alias("he"),
            F.round(F.col("x"), 0).alias("hu"),
        )
        .collect()
    )
    assert r.he == 2.0 and r.hu == 3.0


def test_jdbc_upsert_statement_shape():
    from hospital_stain_tracker_data_pipeline_spark.sources.jdbc import upsert_statement

    sql = upsert_statement(
        "hospital_capacity_daily",
        ["date", "region_id", "total_beds", "occupied_beds"],
        ["date", "region_id"],
    )
    assert "ON CONFLICT (date, region_id) DO UPDATE SET" in sql
    assert "total_beds = EXCLUDED.total_beds" in sql
    assert "date = EXCLUDED.date" not in sql  # keys never updated
