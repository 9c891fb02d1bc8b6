"""Distributed batch-inference plumbing: golden linear-probe scores,
null-vector propagation, partitioning determinism, and a DuckDB replay
of the whole scoring pass over the embeddings fixture."""

from __future__ import annotations

import math

import pytest

from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
    batch_score,
    linear_probe_scorer,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_linear_probe_golden_scores(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 2.0, 0.0]),
            (3, None),
            (4, []),
        ],
        "vec_id long, embedding array<double>",
    )
    scorer = linear_probe_scorer([1.0, -0.5, 0.0], bias=0.25)
    out = {r.vec_id: r.score for r in batch_score(df, scorer).collect()}
    assert out[1] == round(1 / (1 + math.exp(-(1.0 + 0.25))), 6)
    assert out[2] == round(1 / (1 + math.exp(-(-1.0 + 0.25))), 6)
    assert out[3] is None and out[4] is None  # null/empty -> null, no crash


def test_probe_rejects_wrong_dimension(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        batch_score(df, linear_probe_scorer([1.0, 2.0, 3.0])).collect()


def test_batch_score_partitioning_invariant(spark):
    emb = load_fixture_table(spark, SF_DIR, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    scorer = linear_probe_scorer([((i * 7) % 5 - 2) / 10 for i in range(dim)])
    a = sorted(
        (r.vec_id, r.score)
        for r in batch_score(emb, scorer).select("vec_id", "score").collect()
    )
    b = sorted(
        (r.vec_id, r.score)
        for r in batch_score(emb.repartition(13), scorer)
        .select("vec_id", "score")
        .collect()
    )
    assert a == b and len(a) > 0


def test_batch_score_matches_duckdb_oracle(spark):
    """DuckDB replays the probe (list_dot_product + logistic) over the
    same fixture; scores must agree at the rounded precision."""
    import duckdb

    emb = load_fixture_table(spark, SF_DIR, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    weights = [((i * 7) % 5 - 2) / 10 for i in range(dim)]
    bias = 0.125
    got = dict(
        (r.vec_id, r.score)
        for r in batch_score(emb, linear_probe_scorer(weights, bias=bias))
        .select("vec_id", "score")
        .collect()
    )
    wlit = "[" + ", ".join(repr(w) for w in weights) + "]"
    want = dict(
        duckdb.connect()
        .execute(
            f"""
            SELECT vec_id,
                   ROUND(1.0 / (1.0 + exp(-(
                     list_dot_product(CAST(embedding AS DOUBLE[]), {wlit})
                     + {bias}))), 6) AS score
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            """
        )
        .fetchall()
    )
    assert len(got) == len(want) > 0
    mism = {
        k: (got[k], want[k])
        for k in want
        if got[k] is None or abs(got[k] - want[k]) > 1e-9
    }
    assert not mism, list(mism.items())[:5]


def test_nan_component_scores_null_and_ragged_raises(spark):
    """Documented NULL policy: a NaN vector component yields a NULL
    score (Arrow can't carry NaN-vs-missing separately); ragged vector
    lengths fail with a clear error naming the dims."""
    nan = float("nan")
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [nan, 2.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.score
        for r in batch_score(df, linear_probe_scorer([1.0, 1.0])).collect()
    }
    assert out[1] is not None and out[2] is None

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged"):
        batch_score(ragged.coalesce(1), linear_probe_scorer([1.0, 1.0])).collect()


def test_infinite_scores_surface_as_null(spark):
    """The NULL policy covers ALL non-finite scores: an overflow to
    +Infinity must come back NULL, not propagate into thresholds."""
    df = spark.createDataFrame(
        [(1, [1.0e308, 1.0e308]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.score
        for r in batch_score(
            df, linear_probe_scorer([1.0, 1.0], logistic=False)
        ).collect()
    }
    assert out[1] is None and out[2] == 0.0
