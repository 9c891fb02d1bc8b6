"""Native Column-expression library (no Python UDFs in hot paths)."""

from .metrics import (  # noqa: F401
    bed_occ_pct_api,
    bed_occ_pct_etl,
    case_bucket,
    clamp,
    guarded_div,
    icu_occ_pct,
    strain_index,
)
