"""Reciprocal rank fusion: exact python replay, hybrid BM25+dense
composition over real retrieval outputs, weights/validation edges,
and the determinism of the fused k-boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.retrieval import (
    build_bm25_index,
    bm25_topk,
    reciprocal_rank_fusion,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def _rrf_replay(lists, weights=None, c=60, k=10):
    """Pure-python reference: rank by (score desc, id asc), fuse,
    round like the operator."""
    if weights is None:
        weights = [1.0] * len(lists)
    scores: dict = {}
    for wgt, lst in zip(weights, lists):
        ranked = sorted(lst, key=lambda t: (-t[1], t[0]))
        for rank, (doc, _) in enumerate(ranked, start=1):
            scores[doc] = scores.get(doc, 0.0) + wgt / (c + rank)
    fused = sorted(
        ((d, round(s, 6)) for d, s in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )
    return fused[:k]


def test_rrf_matches_python_replay(spark):
    a = [(1, 9.5), (2, 8.0), (3, 7.0), (4, 1.0)]
    b = [(3, 0.99), (5, 0.98), (1, 0.50)]
    cdf = [(6, 100.0), (1, 50.0)]
    dfs = [
        spark.createDataFrame(rows, "doc_id long, score double")
        for rows in (a, b, cdf)
    ]
    got = [
        (r["doc_id"], r["rrf_score"])
        for r in reciprocal_rank_fusion(
            dfs, k=10, weights=[1.0, 2.0, 0.5]
        ).collect()
    ]
    assert got == _rrf_replay([a, b, cdf], weights=[1.0, 2.0, 0.5])


def test_rrf_rank_based_not_score_based(spark):
    """Scaling one list's scores by 1000x changes nothing — RRF reads
    ranks, which is why uncalibrated BM25 and cosine lists fuse."""
    a = [(1, 3.0), (2, 2.0), (3, 1.0)]
    a_scaled = [(d, s * 1000) for d, s in a]
    b = [(2, 0.9), (4, 0.8)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, score double"
    )
    r1 = reciprocal_rank_fusion([mk(a), mk(b)]).collect()
    r2 = reciprocal_rank_fusion([mk(a_scaled), mk(b)]).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


def test_rrf_hybrid_bm25_dense_composition(spark, sf_dir):
    """The advertised composition: fuse a BM25 lexical list with a
    'dense' list over the same id space; every fused id comes from at
    least one input list and the top fused doc appears in both."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    idx = build_bm25_index(docs)
    seed = docs.orderBy("doc_id").select("text").first()["text"]
    query = " ".join(seed.split()[:8])
    lex = bm25_topk(idx, query, k=20)
    # a deterministic stand-in for a dense scorer over the same ids:
    # overlap with the lexical list on some ids, disjoint on others
    dense = lex.limit(10).select(
        "doc_id", (F.lit(1.0) / (F.col("doc_id") + 1)).alias("cos")
    ).unionByName(
        docs.orderBy(F.desc("doc_id"))
        .limit(5)
        .select("doc_id", F.lit(0.001).alias("cos"))
    )
    fused = reciprocal_rank_fusion(
        [lex, dense], score_cols=["score", "cos"], k=15
    )
    rows = fused.collect()
    assert 0 < len(rows) <= 15
    in_lex = {r["doc_id"] for r in lex.collect()}
    in_dense = {r["doc_id"] for r in dense.collect()}
    assert all(r["doc_id"] in in_lex | in_dense for r in rows)
    # fused scores are already sorted desc with id tiebreak
    vals = [r["rrf_score"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        reciprocal_rank_fusion([])
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="weights"):
        reciprocal_rank_fusion([df, df], weights=[1.0])
    with pytest.raises(ValueError, match="no score column"):
        reciprocal_rank_fusion([df.select("doc_id")])


def test_rrf_ambiguous_frame_raises(spark):
    """A frame still carrying extra columns (e.g. knn output with
    query_id) must fail loudly, not silently rank by the wrong one."""
    df = spark.createDataFrame(
        [(0, 1, 0.9)], "query_id long, doc_id long, score double"
    )
    with pytest.raises(ValueError, match="several non-id columns"):
        reciprocal_rank_fusion([df])
    # explicit score_cols resolves it
    rows = reciprocal_rank_fusion([df], score_cols=["score"]).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_rrf_score_cols_length_mismatch_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="score_cols"):
        reciprocal_rank_fusion([df, df], score_cols=["score"])


def test_rrf_duplicate_id_keeps_best_rank(spark):
    """An id duplicated within one list must not fan out the fusion
    join NOR consume a rank slot: duplicates collapse to their best
    score before ranking, so other docs' ranks are unaffected."""
    a = spark.createDataFrame(
        [(1, 9.0), (1, 2.0), (2, 5.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(1, 0.5), (3, 0.9)], "doc_id long, score double"
    )
    rows = reciprocal_rank_fusion([a, b]).collect()
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == [1, 2, 3]          # no duplicates
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    # doc 1: rank 1 in a, rank 2 in b
    assert got[1] == round(1 / 61 + 1 / 62, 6)
    # doc 2: rank 2 in a — NOT 3; doc 1's duplicate row must not have
    # occupied a rank slot above it
    assert got[2] == round(1 / 62, 6)
