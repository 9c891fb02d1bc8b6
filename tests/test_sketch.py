"""Bounded-memory sketches: heavy_hitters' exact-and-complete contract
(vs a full DuckDB GROUP BY oracle, under adversarial repartitioning and
tight capacities) and skew_report's cross-engine percentile replay."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.sketch import (
    _mg_merge,
    heavy_hitters,
    skew_report,
)


def _exploded_words(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")


def _oracle_heavy(sf_dir, phi):
    """DuckDB ground truth; the threshold is computed with the same
    exact rational arithmetic as the operator (float ceil(phi*N) would
    reproduce the operator's OWN former bug, hiding it)."""
    from fractions import Fraction

    con = duckdb.connect()
    n = con.execute(
        f"""
        SELECT count(*) FROM (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM read_parquet('{sf_dir}/documents.parquet')
        ) WHERE w <> ''
        """
    ).fetchone()[0]
    threshold = math.ceil(Fraction(str(phi)) * n)
    rows = con.execute(
        f"""
        WITH words AS (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM read_parquet('{sf_dir}/documents.parquet')
        ), nonblank AS (SELECT w FROM words WHERE w <> '')
        SELECT w, count(*) AS n FROM nonblank
        GROUP BY w
        HAVING count(*) >= {threshold}
        ORDER BY n DESC, w
        """
    ).fetchall()
    con.close()
    return rows


def test_heavy_hitters_matches_duckdb_oracle(spark, sf_dir):
    """Exact + complete against the full GROUP BY ground truth at a
    phi where several words qualify."""
    phi = 0.01
    words = _exploded_words(spark, sf_dir)
    got = [(r["item"], r["n"]) for r in heavy_hitters(words, "w", phi).collect()]
    want = _oracle_heavy(sf_dir, phi)
    assert got == want
    assert len(got) > 0, "fixture should have at least one 1%-heavy word"


def test_heavy_hitters_partitioning_invariant(spark):
    """The MG candidate union depends on partitioning; the final exact
    answer must not. Tight capacity exercises real decrements."""
    rows = (
        [("a",)] * 40 + [("b",)] * 25 + [("c",)] * 10
        + [(f"x{i}",) for i in range(25)]
    )
    base = spark.createDataFrame(rows, "w string")
    want = [("a", 40), ("b", 25), ("c", 10)]
    for nparts in (1, 3, 8):
        df = base.repartition(nparts)
        got = [
            (r["item"], r["n"])
            for r in heavy_hitters(df, "w", phi=0.1, capacity=20).collect()
        ]
        assert got == want, nparts


def test_heavy_hitters_threshold_edge_and_nulls(spark):
    """Items exactly AT ceil(phi*N) are included; below it excluded;
    NULLs are not an item class and do not count toward N."""
    # N = 10 non-null, phi = 0.3 -> threshold ceil(3.0) = 3
    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 5 + [(None,)] * 4
    df = spark.createDataFrame(rows, "w string")
    got = [(r["item"], r["n"]) for r in heavy_hitters(df, "w", phi=0.3).collect()]
    assert got == [("c", 5), ("a", 3)]


def test_heavy_hitters_empty_and_bad_phi(spark):
    df = spark.createDataFrame([], "w string")
    assert heavy_hitters(df, "w", phi=0.5).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", phi=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", phi=1.5)
    # a capacity at or below ceil(1/phi) would silently break
    # completeness — Misra-Gries retention is strict (> n_p/m), so an
    # exactly-phi-heavy item can vanish at the old ceil(1/phi) floor
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, "w", phi=0.5, capacity=1)
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, "w", phi=0.5, capacity=2)  # == ceil(1/phi)


def test_heavy_hitters_exact_rational_threshold(spark):
    """Regression: 0.07 * 100 = 7.000000000000001 in floats; an item
    occurring exactly 7/100 times IS 0.07-heavy and must be returned
    (the threshold is computed on the decimal value of phi, never a
    float product)."""
    rows = [("x",)] * 7 + [(f"f{i}",) for i in range(93)]
    df = spark.createDataFrame(rows, "w string")
    got = [(r["item"], r["n"]) for r in heavy_hitters(df, "w", phi=0.07).collect()]
    assert got == [("x", 7)]


def test_mg_merge_retention_bound():
    """Pure-python MG property: after streaming any sequence through
    batch merges, every item with true count > n/(capacity+1) is
    retained — the bound the distributed guarantee rests on."""
    import random

    rng = random.Random(7)
    capacity = 8
    universe = [f"k{i}" for i in range(50)]
    weights = [1 + (50 - i) ** 2 for i in range(50)]
    stream = rng.choices(universe, weights=weights, k=5000)
    true: dict = {}
    for x in stream:
        true[x] = true.get(x, 0) + 1
    summary: dict = {}
    for i in range(0, len(stream), 137):  # uneven batches
        batch = stream[i : i + 137]
        counts: dict = {}
        for x in batch:
            counts[x] = counts.get(x, 0) + 1
        summary = _mg_merge(summary, counts, capacity)
    n = len(stream)
    for k, c in true.items():
        if c > n / (capacity + 1):
            assert k in summary, (k, c, n / (capacity + 1))
            # counts are underestimates by at most n/(capacity+1)
            assert summary[k] >= c - math.ceil(n / (capacity + 1))


def test_skew_report_matches_duckdb(spark, sf_dir):
    """Every column of the one-row report replayed in DuckDB —
    including the exact continuous percentiles (quantile_cont) and the
    deterministic top-keys strings."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = skew_report(events, "event_type", top=3).collect()[0].asDict()
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH counts AS (
          SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS cnt
          FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1
        ), summary AS (
          SELECT sum(cnt) AS n_rows, count(*) AS n_keys, max(cnt) AS max_count,
                 quantile_cont(cnt, 0.5) AS p50_count,
                 quantile_cont(cnt, 0.9) AS p90_count,
                 quantile_cont(cnt, 0.99) AS p99_count,
                 round(max(cnt) / (sum(cnt) / count(*)), 2) AS skew_ratio
          FROM counts
        ), topk AS (
          SELECT list(disp ORDER BY neg, is_null, k) AS top_keys
          FROM (SELECT -cnt AS neg, (key IS NULL) AS is_null,
                       coalesce(key, '') AS k,
                       coalesce(key, chr(0) || 'NULL') || ':' || cnt AS disp
                FROM counts
                ORDER BY cnt DESC, (key IS NULL), key
                LIMIT 3)
        )
        SELECT * FROM summary, topk
        """
    ).df().iloc[0].to_dict()
    con.close()
    assert got["n_rows"] == want["n_rows"]
    assert got["n_keys"] == want["n_keys"]
    assert got["max_count"] == want["max_count"]
    for c in ("p50_count", "p90_count", "p99_count", "skew_ratio"):
        assert got[c] == pytest.approx(want[c], abs=1e-9), c
    assert list(got["top_keys"]) == list(want["top_keys"])


def test_skew_report_null_keys_are_a_group(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 3 + [("b",)], "k string"
    )
    row = skew_report(df, "k", top=2).collect()[0]
    assert row["n_rows"] == 9
    assert row["n_keys"] == 3
    assert row["max_count"] == 5
    assert list(row["top_keys"]) == ["a:5", "\x00NULL:3"]


def test_skew_report_null_tie_at_limit_matches_replay(spark):
    """Regression: a NULL key tying a real key at the limit boundary
    must pick the same row as the documented DuckDB replay — real keys
    sort before the NULL group at equal counts (explicit is-null
    field, NOT a coalesced string sentinel)."""
    df = spark.createDataFrame(
        [("AAA",)] * 3 + [(None,)] * 3 + [("b",)], "k string"
    )
    row = skew_report(df, "k", top=1).collect()[0]
    assert list(row["top_keys"]) == ["AAA:3"]
    # real keys win the boundary even when they sort AFTER the display
    # marker's old coalesced position ('ZZZ' > 'NULL' as strings)
    df2 = spark.createDataFrame(
        [("ZZZ",)] * 3 + [(None,)] * 3 + [("b",)], "k string"
    )
    row2 = skew_report(df2, "k", top=1).collect()[0]
    assert list(row2["top_keys"]) == ["ZZZ:3"]


def test_skew_report_null_string_key_does_not_collide(spark):
    """A genuine string key 'NULL' and the NULL group stay
    distinguishable: the NULL group renders as \\x00NULL (a marker a
    CAST-to-string key cannot produce), so both rows appear and order
    deterministically (real 'NULL' first at equal counts)."""
    df = spark.createDataFrame(
        [("NULL",)] * 3 + [(None,)] * 3 + [("b",)], "k string"
    )
    row = skew_report(df, "k", top=3).collect()[0]
    assert list(row["top_keys"]) == ["NULL:3", "\x00NULL:3", "b:1"]
    assert row["n_keys"] == 3
