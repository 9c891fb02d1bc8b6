"""PageRank: hand-computed star-graph golden, python power-iteration
reference on a random-ish graph, dangling-mass handling, partitioning
invariance, and rank properness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.graph import pagerank


def _reference(edges, damping=0.85, iters=20, tol=1e-6):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, set] = {}
    for s, d in set(edges):
        out.setdefault(idx[s], set()).add(idx[d])
    r = [1.0 / n] * n
    for _ in range(iters):
        dangling = sum(r[i] for i in range(n) if i not in out)
        nxt = [(1 - damping) / n + damping * dangling / n] * n
        for s, dsts in out.items():
            share = r[s] / len(dsts)
            for d in dsts:
                nxt[d] += damping * share
        delta = sum(abs(a - b) for a, b in zip(nxt, r))
        r = nxt
        if delta < tol:
            break
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_star_golden(spark):
    """Hub-and-spoke: 1..4 all link to 0; 0 links nowhere (dangling).
    Node 0 must dominate, spokes tie exactly."""
    edges = [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=30).collect()}
    want = _reference(edges, iters=30)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert got[0] > got[1]
    assert got[1] == got[2] == got[3] == got[4]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_matches_reference_and_partitioning(spark):
    edges = [
        (a, b)
        for a in range(12)
        for b in range(12)
        if a != b and (a * 7 + b * 3) % 5 == 0
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=25).collect()}
    want = _reference(edges, iters=25)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # duplicate edges count once
    got_dup = {
        r["node"]: r["rank"]
        for r in pagerank(
            df.unionByName(df).repartition(9), iters=25
        ).collect()
    }
    for v in want:
        assert got_dup[v] == pytest.approx(got[v], abs=1e-12)


def test_pagerank_validation_and_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0
    df2 = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df2, damping=1.5)


def test_cc_max_iter_zero_degenerate_graphs_still_converge(spark):
    """max_iter=0 semantics are the identity-init ones (pre-round-14):
    the single available round is the PROOF round, so an empty or
    self-loop-only edge set converges (labels are already the fixpoint)
    while any real edge still raises. The round-14 fused first round
    must not consume that proof round."""
    from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
        connected_components_min_label,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    tel: dict = {}
    out = connected_components_min_label(empty, max_iter=0, telemetry=tel)
    assert out.count() == 0 and tel["converged"]

    loops = spark.createDataFrame([(5, 5), (9, 9)], "src long, dst long")
    tel = {}
    out = connected_components_min_label(loops, max_iter=0, telemetry=tel)
    assert {(r["node"], r["cluster_id"]) for r in out.collect()} == {
        (5, 5),
        (9, 9),
    }
    assert tel["converged"] and tel["iterations"] == 1

    edge = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="did not converge"):
        connected_components_min_label(edge, max_iter=0)
