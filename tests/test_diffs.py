"""Corpus snapshot diff: classification matrix, NULL-text edges, the
token reconciliation invariant, and a DuckDB oracle over the same
parquet snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.diffs import (
    corpus_diff,
    corpus_diff_summary,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_diff_classification(spark):
    old = _mk(
        spark,
        [
            (1, "alpha beta"),
            (2, "will be removed"),
            (3, "stays the same"),
            (4, "before rewrite"),
            (5, None),
            (6, "becomes null"),
        ],
    )
    new = _mk(
        spark,
        [
            (1, "alpha beta"),
            (3, "stays the same"),
            (4, "after rewrite with more words"),
            (5, "was null before"),
            (6, None),
            (7, "brand new"),
        ],
    )
    got = {
        r["doc_id"]: (r["status"], r["old_tok"], r["new_tok"])
        for r in corpus_diff(old, new).collect()
    }
    # default excludes unchanged: 1 and 3 absent
    assert 1 not in got and 3 not in got
    assert got[2] == ("removed", 3, None)
    assert got[4][0] == "changed" and got[4][1] == 2 and got[4][2] == 5
    # NULL -> text and text -> NULL are CHANGED, never unchanged
    assert got[5] == ("changed", 0, 3)
    assert got[6] == ("changed", 2, 0)
    assert got[7] == ("added", None, 2)

    full = corpus_diff(old, new, include_unchanged=True)
    assert full.count() == 7
    assert full.filter(F.col("status") == "unchanged").count() == 2


def test_corpus_diff_summary_reconciles(spark):
    old = _mk(spark, [(1, "a b c"), (2, "d e"), (3, "same")])
    new = _mk(spark, [(1, "a b c d"), (3, "same"), (4, "x y z w v")])
    [s] = corpus_diff_summary(old, new).collect()
    assert (s["n_added"], s["n_removed"], s["n_changed"], s["n_unchanged"]) == (
        1, 1, 1, 1,
    )
    assert s["tok_added"] == 5
    assert s["tok_removed"] == 2
    # tok_delta == total(new) - total(old), reconcilable externally
    tot_old = 3 + 2 + 1
    tot_new = 4 + 1 + 5
    assert s["tok_delta"] == tot_new - tot_old


def test_corpus_diff_duckdb_oracle(spark, sf_dir, tmp_path):
    """Build two snapshots of the fixture corpus (drop some ids,
    rewrite some texts, add some), write both to parquet, and replay
    the per-status counts in DuckDB."""
    import duckdb

    docs = load_fixture_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    old = docs
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)  # remove ~1/7
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" EDITED"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            ).limit(13)
        )
    )
    p_old, p_new = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(p_old)
    new.write.parquet(p_new)

    got = {
        r["status"]: r["n"]
        for r in corpus_diff(
            spark.read.parquet(p_old),
            spark.read.parquet(p_new),
            include_unchanged=True,
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        s: n
        for s, n in duckdb.sql(
            f"""
        WITH o AS (SELECT doc_id, text FROM '{p_old}/*.parquet'),
             n AS (SELECT doc_id, text FROM '{p_new}/*.parquet')
        SELECT CASE
                 WHEN o.doc_id IS NULL THEN 'added'
                 WHEN n.doc_id IS NULL THEN 'removed'
                 WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
                 ELSE 'unchanged'
               END AS status, count(*) AS n
        FROM o FULL OUTER JOIN n USING (doc_id)
        GROUP BY 1
        """
        ).fetchall()
    }
    assert got == want
    assert got.get("added") == 13 and got.get("removed", 0) > 0


def test_corpus_diff_summary_empty_corpora_all_zeros(spark):
    """Two empty corpora reconcile to an all-zero row, never NULLs —
    a promotion gate asserting n_added == 0 must hold."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    [s] = corpus_diff_summary(empty, empty).collect()
    assert (
        s["n_added"], s["n_removed"], s["n_changed"], s["n_unchanged"],
        s["tok_added"], s["tok_removed"], s["tok_delta"],
    ) == (0, 0, 0, 0, 0, 0, 0)
