"""Count-min sketch: bit-exact pure-Python cell replay, the
never-underestimate guarantee against exact counts, the 2N/w error
bound, merge algebra, and validation edges."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.sketch import (
    cms_merge,
    cms_query,
    cms_sketch,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def _hashes(item, width):
    hx = hashlib.md5(str(item).encode()).hexdigest()
    h1 = int(hx[:15], 16) % width
    h2 = (int(hx[15:30], 16) % width) | 1
    return h1, h2


def _replay_cells(items, width, depth):
    cells: dict[tuple[int, int], int] = {}
    for it in items:
        if it is None:
            continue
        h1, h2 = _hashes(it, width)
        for r in range(depth):
            key = (r, (h1 + r * h2) % width)
            cells[key] = cells.get(key, 0) + 1
    return cells


def _replay_query(cells, item, width, depth):
    h1, h2 = _hashes(item, width)
    return min(
        cells.get((r, (h1 + r * h2) % width), 0) for r in range(depth)
    )


def _words(spark, sf_dir):
    docs = load_fixture_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.col("w") != "")


def test_cms_cells_match_python_replay(spark, sf_dir):
    words = _words(spark, sf_dir)
    width, depth = 256, 4
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(words, "w", width, depth).collect()
    }
    want = _replay_cells([r["w"] for r in words.collect()], width, depth)
    assert got == want


def test_cms_never_underestimates_and_error_bound(spark, sf_dir):
    words = _words(spark, sf_dir)
    width, depth = 2048, 5
    sk = cms_sketch(words, "w", width, depth)
    exact = {
        r["w"]: r["n"]
        for r in words.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est = {
        r["w"]: r["est"]
        for r in cms_query(sk, words, "w", width, depth).collect()
    }
    n_total = sum(exact.values())
    assert set(est) == set(exact)
    assert all(est[w] >= exact[w] for w in exact)
    # expected overestimate is N/width per row, min over depth rows —
    # allow the standard 2N/width for every item (violations would be
    # a hashing-quality bug, not bad luck, at depth 5)
    bound = 2 * n_total / width
    bad = [w for w in exact if est[w] - exact[w] > bound]
    assert not bad, bad[:5]


def test_cms_absent_item_estimates_zero_or_bound(spark):
    df = spark.createDataFrame(
        [(f"in-{i % 20}",) for i in range(200)], "item string"
    )
    sk = cms_sketch(df, "item", 1024, 5)
    probes = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(50)], "item string"
    )
    est = {
        r["item"]: r["est"]
        for r in cms_query(sk, probes, "item", 1024, 5).collect()
    }
    # never inserted -> almost surely some row has an empty cell
    assert sum(est.values()) == 0


def test_cms_merge_equals_union_sketch(spark, sf_dir):
    words = _words(spark, sf_dir)
    a = words.filter(F.length("w") <= 5)
    b = words.filter(F.length("w") > 5)
    width, depth = 512, 4
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_merge(
            cms_sketch(a, "w", width, depth),
            cms_sketch(b, "w", width, depth),
        ).collect()
    }
    whole = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(a.unionByName(b), "w", width, depth).collect()
    }
    assert merged == whole


def test_cms_query_handles_multiplicity_and_nulls(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,)], "item string"
    )
    sk = cms_sketch(df, "item", 64, 3)
    # duplicated + NULL probes: output is one row per distinct non-NULL
    probes = spark.createDataFrame(
        [("x",), ("x",), (None,)], "item string"
    )
    rows = cms_query(sk, probes, "item", 64, 3).collect()
    assert len(rows) == 1 and rows[0]["item"] == "x"
    assert rows[0]["est"] >= 2
    cells = _replay_cells(["x", "x", "y"], 64, 3)
    assert rows[0]["est"] == _replay_query(cells, "x", 64, 3)


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="power of two"):
        cms_sketch(df, "item", width=1000)
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "item", depth=0)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_cms_query_rejects_larger_geometry_sketch(spark):
    """Querying a width-4096 sketch at width 512 would UNDERestimate —
    the one broken guarantee — so it must raise instead."""
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(f"item-{i}",) for i in range(5000)], "item string"
    )
    sk = cms_sketch(df, "item", width=4096, depth=5)
    with pytest.raises(SparkRuntimeException, match="larger parameters"):
        cms_query(sk, df, "item", width=512, depth=5).collect()
