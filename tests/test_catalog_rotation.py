"""Catalog rotation pins (rounds 10-12).

Two invariants every rotation must not break:

1. Every DEMOTED entry keeps full DuckDB-oracle correctness even
   though the grading driver no longer sees it — exact value-level
   replay here (the same compare discipline the driver applies to the
   50 graded entries).
2. Every promoted entry (plans/corpus.py, plans/crawl.py) matches its
   oracle value-exactly at the driver's grading scale semantics
   (sorted rows, sorted columns, repr-exact floats) — a rounding or
   summation-order drift fails HERE before it fails a driver round.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from hospital_stain_tracker_data_pipeline_spark.plans import CATALOG
from hospital_stain_tracker_data_pipeline_spark.plans.catalog import DEMOTED

PROMOTED = [
    # round 10
    "pack_token_chunks",
    "heavy_hitters",
    "dedup_spans",
    "dedup_substrings",
    "corpus_report",
    "bm25_topk",
    "gopher_quality_kept",
    "rrf_fuse",
    # round 11
    "repetition_profile",
    "sample_stratified",
    "filter_funnel",
    "fetch_schedule",
    # round 12 — the approx-sketch family's error contracts, the md5
    # epoch permutation, and the zlib signal's null-accounting
    "approx_percentiles_check",
    "approx_distinct_check",
    "epoch_shuffle",
    "compression_signals",
    # round 13 — PDF round-trip extraction (classic + ObjStm twins),
    # exact-URL crawl dedup (canonical strings value-compared), and
    # the RFC 9309 robots gate (group selection + longest-match under
    # two product tokens)
    "pdf_roundtrip",
    "url_dedup",
    "robots_gate",
    # round 14 — the image near-dup round trip (deterministic BMP/PNG
    # rigs -> real decode -> dHash -> capped Hamming banding, oracle
    # brute-forces the Hamming ball from the same md5 pixel formula)
    "image_near_dup_pairs",
]

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df):
    """Driver-shaped canonical form: columns sorted by name, rows
    sorted, floats repr-exact (a last-ulp drift must FAIL), date-like
    values with a zero time component normalized to the date."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(repr(v))
            elif hasattr(v, "isoformat"):
                t = str(v)
                row.append(t[:-9] if t.endswith(" 00:00:00") else t)
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def _check(spark, sf_dir, name, spec):
    got = spec.fn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    try:
        want = con.execute(spec.oracle_sql).df()
    finally:
        con.close()
    assert sorted(got.columns) == sorted(want.columns), name
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b) and len(a) > 0, (name, len(a), len(b))
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, (name, i, x, y)


@pytest.mark.parametrize("name", sorted(DEMOTED))
def test_demoted_entry_still_matches_oracle(spark, sf_dir, name):
    _check(spark, sf_dir, name, DEMOTED[name])


@pytest.mark.parametrize("name", PROMOTED)
def test_promoted_entry_matches_oracle_value_exact(spark, sf_dir, name):
    _check(spark, sf_dir, name, CATALOG[name])


def test_catalog_is_exactly_fifty_and_disjoint():
    assert len(CATALOG) == 50
    assert not set(CATALOG) & set(DEMOTED)
    for name in PROMOTED:
        assert name in CATALOG, name
        assert CATALOG[name].oracle_sql is not None, name
