"""Scalar metric expressions (SURVEY.md §2.8), all native Columns.

The reference implements these as per-row Python (``backend/app/etl/
compute_metrics.py:11-21,56-64`` and ``backend/app/main.py:164-169``);
here they are Catalyst expressions, so they stay inside whole-stage
codegen and vectorize for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp(col: Column, lo: float, hi: float) -> Column:
    """min(hi, max(lo, col)) — reference compute_metrics.py:21."""
    return F.least(F.lit(float(hi)), F.greatest(F.lit(float(lo)), col))


def guarded_div(num: Column, den: Column, zero_result: Column | None = None) -> Column:
    """num/den when den > 0, else ``zero_result`` (default NULL).

    The reference has two variants (SURVEY.md §2.8 op-fn-div-guard):
    the API yields NULL on zero denominator (main.py:164), the metrics
    ETL yields 0.0 (compute_metrics.py:56). Pass ``F.lit(0.0)`` for the
    ETL variant.
    """
    out = F.when(den > 0, num / den)
    if zero_result is not None:
        out = out.otherwise(zero_result)
    return out


def bed_occ_pct_etl(occupied: Column, total: Column) -> Column:
    """ETL variant: occupied/total, 0.0 when total <= 0 (compute_metrics.py:56)."""
    return guarded_div(occupied, total, F.lit(0.0))


def bed_occ_pct_api(occupied: Column, total: Column) -> Column:
    """API variant: occupied/total, NULL when total <= 0 (main.py:164)."""
    return guarded_div(occupied, total)


def icu_occ_pct(icu_occupied: Column, icu_beds: Column) -> Column:
    """icu_occupied/icu_beds only when icu_beds is truthy (non-null, > 0)
    AND icu_occupied is non-null; else NULL (compute_metrics.py:59-61).

    Note the reference's truthiness check means icu_beds == 0 → NULL,
    not a division error.
    """
    return F.when(
        icu_beds.isNotNull() & (icu_beds > 0) & icu_occupied.isNotNull(),
        icu_occupied / icu_beds,
    )


def strain_index(bed_occ: Column, icu_occ: Column, half_even: bool = False) -> Column:
    """Strain index (compute_metrics.py:11-21; README.md:35-44):

        bed_score = bed_occ_pct * 100
        icu_score = icu_occ_pct * 100 if icu_occ_pct is not None else bed_score
        round(min(100, max(0, 0.4*bed_score + 0.6*icu_score)), 2)

    Feed FULL-PRECISION pcts (the reference rounds only strain, never
    the pct inputs — pre-rounded inputs can deviate on .xx5
    boundaries). ``half_even=True`` matches the reference's Python
    ``round`` (banker's) on this formula's value range; the default
    HALF_UP matches the DuckDB oracle the catalog queries compare
    against."""
    bed_score = bed_occ * 100.0
    icu_score = F.coalesce(icu_occ * 100.0, bed_score)
    raw = clamp(0.4 * bed_score + 0.6 * icu_score, 0.0, 100.0)
    return round_half_even(raw, 2) if half_even else F.round(raw, 2)


def round_half_even(col: Column, scale: int) -> Column:
    """Banker's rounding — the reference's exact rounding behavior
    (Python ``round`` is HALF_EVEN, while Spark's ``F.round`` and
    DuckDB's ``ROUND`` are HALF_UP; SURVEY.md §7 'what's hard').

    ``rint`` rounds half-to-even, so ``rint(x·10^s)/10^s`` matches the
    reference on .xx5 boundaries for this domain's values (scores in
    [0, 100] at scale 2, where x·10^s stays exactly representable
    whenever x is a representable .xx5 boundary). It is NOT bit-for-bit
    Python ``round`` in general: CPython rounds via correctly-rounded
    decimal repr (``_Py_dg_dtoa``), while multiplying first can land a
    pathological double on the other side of the half — use a decimal
    type if such inputs ever matter. The engine's default queries use
    ``F.round`` (consistent with the DuckDB oracle); use this variant
    when reference parity matters more."""
    factor = float(10**scale)
    return F.call_function("rint", col * factor) / factor


def case_bucket(strain: Column) -> Column:
    """Dashboard status bucketing (dashboard.html:328-338; App.tsx:76-80):
    strain > 80 → CRISIS; >= 70 → ELEVATED; else STABLE."""
    return (
        F.when(strain > 80, F.lit("CRISIS"))
        .when(strain >= 70, F.lit("ELEVATED"))
        .otherwise(F.lit("STABLE"))
    )
