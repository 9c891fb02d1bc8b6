"""Leakage-safe splitting: the no-straddle guarantee over transitive
near-dup chains, convergence to the plain hash split for singletons,
fraction sanity, a DuckDB replay of the bucket arithmetic, and
determinism."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
    minhash_lsh_dedup_pairs,
)
from hospital_stain_tracker_data_pipeline_spark.operators.splits import (
    leakage_safe_split,
    split_assignments,
    split_bucket,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def test_split_bucket_matches_duckdb(spark, sf_dir):
    got = {
        r["doc_id"]: r["b"]
        for r in load_fixture_table(spark, sf_dir, "documents")
        .select("doc_id", split_bucket(F.col("doc_id")).alias("b"))
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"""
            SELECT doc_id,
                   CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 100
            FROM '{sf_dir}/documents.parquet'
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_leakage_safe_split_chain_never_straddles(spark):
    """Transitive chain 1-2, 2-3, plus pair 10-11: every component one
    split; singletons keyed on themselves."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 10, 11, 50, 51]],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    by_id = {r["doc_id"]: (r["split_key"], r["split"]) for r in out}
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[1][0] == 1  # component min id
    assert by_id[10] == by_id[11]
    assert by_id[10][0] == 10
    # singletons: own id, i.e. the plain hash split
    for i in (50, 51):
        assert by_id[i][0] == i
    # output keeps every input row exactly once
    assert sorted(by_id) == [1, 2, 3, 10, 11, 50, 51]


def test_leakage_safe_split_on_fixture_with_real_pairs(spark, sf_dir):
    docs = load_fixture_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.5)
    out = leakage_safe_split(docs, pairs)
    pdf = out.select("doc_id", "split_key", "split").toPandas()
    assert len(pdf) == docs.count()
    # the no-straddle guarantee, checked against the pair list itself
    split_of = dict(zip(pdf["doc_id"], pdf["split"]))
    p = pairs.collect()
    assert p, "fixture should contain near-dup pairs at threshold 0.5"
    for r in p:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (
            r["id_a"], r["id_b"])
    # all three splits populated at fixture size, fractions sane
    frac = pdf["split"].value_counts(normalize=True)
    assert set(frac.index) == {"train", "val", "test"}
    assert 0.6 < frac["train"] < 0.95
    # deterministic under repartitioning
    pdf2 = (
        leakage_safe_split(docs.repartition(7), pairs)
        .select("doc_id", "split")
        .toPandas()
    )
    assert dict(zip(pdf2["doc_id"], pdf2["split"])) == split_of


def test_split_assignments_validation():
    with pytest.raises(ValueError):
        split_assignments(F.lit(1), train_pct=90, val_pct=20)


def test_leakage_safe_split_empty_pairs_is_plain_hash_split(spark):
    """Zero near-dup pairs: every doc keys on itself — byte-identical
    to the plain md5-bucket split."""
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = leakage_safe_split(docs, pairs).collect()
    assert len(out) == 40
    for r in out:
        assert r["split_key"] == r["doc_id"]
    plain = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", split_assignments(F.col("doc_id")).alias("s")
        ).collect()
    }
    assert {r["doc_id"]: r["split"] for r in out} == plain
