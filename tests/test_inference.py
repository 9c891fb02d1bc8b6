"""Distributed batch-inference plumbing: golden linear-probe scores,
null-vector propagation, partitioning determinism, and a DuckDB replay
of the whole scoring pass over the embeddings fixture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# train_logistic_probe — the distributed trainer behind the probe
# ---------------------------------------------------------------------------


def _numpy_logistic_reference(X, y, iters, lr, l2=0.0):
    """Single-process full-batch GD with the exact update rule the
    distributed trainer implements — the cross-implementation oracle."""
    import numpy as np

    w = np.zeros(X.shape[1])
    b = 0.0
    hist = []
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-15
        pc = np.clip(p, eps, 1 - eps)
        hist.append(
            float(-(y * np.log(pc) + (1 - y) * np.log(1 - pc)).mean())
        )
        resid = p - y
        w = w - lr * (X.T @ resid / len(y) + l2 * w)
        b = b - lr * resid.mean()
    return w, b, hist


def _labeled_embeddings(spark, sf_dir):
    from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
        load_fixture_table,
    )

    emb = load_fixture_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "embedding",
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
    )


def test_train_logistic_probe_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        train_logistic_probe,
    )

    df = _labeled_embeddings(spark, sf_dir)
    w, b, hist = train_logistic_probe(
        df, vec_col="embedding", label_col="y", iters=10, lr=0.5, l2=0.01
    )
    pdf = df.orderBy("vec_id").toPandas()
    X = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    w_ref, b_ref, hist_ref = _numpy_logistic_reference(X, y, 10, 0.5, 0.01)
    assert np.allclose(w, w_ref, rtol=1e-6, atol=1e-9)
    assert b == pytest.approx(b_ref, rel=1e-6, abs=1e-9)
    assert hist == pytest.approx(hist_ref, rel=1e-6)
    # training actually learns: loss strictly improves over the run
    assert hist[-1] < hist[0]


def test_train_logistic_probe_partitioning_invariant(spark, sf_dir):
    import numpy as np

    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        train_logistic_probe,
    )

    df = _labeled_embeddings(spark, sf_dir)
    w1, b1, _ = train_logistic_probe(df, label_col="y", iters=3, lr=0.5)
    w8, b8, _ = train_logistic_probe(
        df.repartition(8), label_col="y", iters=3, lr=0.5
    )
    assert np.allclose(w1, w8, rtol=1e-9, atol=1e-12)
    assert b1 == pytest.approx(b8, rel=1e-9, abs=1e-12)


def test_trained_probe_feeds_batch_score_and_separates_classes(spark, sf_dir):
    """The loop closes: train -> linear_probe_scorer -> batch_score
    must rank the positive class above the negative one (mean score
    gap), i.e. the trained weights are usable by the serving path."""
    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        batch_score,
        linear_probe_scorer,
        train_logistic_probe,
    )

    df = _labeled_embeddings(spark, sf_dir)
    w, b, _ = train_logistic_probe(df, label_col="y", iters=40, lr=2.0)
    scored = batch_score(df, linear_probe_scorer(w, bias=b))
    [r] = (
        scored.groupBy()
        .agg(
            F.avg(F.when(F.col("y") == 1.0, F.col("score"))).alias("pos"),
            F.avg(F.when(F.col("y") == 0.0, F.col("score"))).alias("neg"),
        )
        .collect()
    )
    # the fixture embeddings are only weakly linearly separable (unit
    # vectors, class-mean gap ~0.15); 40 full-batch steps reach a
    # ~0.016 mean-score gap in the numpy reference — assert the
    # trained probe reproduces that separation direction and magnitude
    assert r["pos"] > r["neg"] + 0.01, (r["pos"], r["neg"])


def test_train_logistic_probe_skips_null_and_empty_rows(spark):
    import numpy as np

    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        train_logistic_probe,
    )

    rows = [
        ([1.0, 0.0], 1.0),
        ([0.0, 1.0], 0.0),
        (None, 1.0),
        ([], 0.0),
        ([0.5, 0.5], None),
    ]
    df = spark.createDataFrame(rows, "embedding array<double>, y double")
    w, b, hist = train_logistic_probe(df, label_col="y", iters=5, lr=1.0)
    X = np.array([[1.0, 0.0], [0.0, 1.0]])
    y = np.array([1.0, 0.0])
    w_ref, b_ref, _ = _numpy_logistic_reference(X, y, 5, 1.0)
    assert np.allclose(w, w_ref, rtol=1e-9)
    assert b == pytest.approx(b_ref, rel=1e-9, abs=1e-12)


def test_train_logistic_probe_empty_input_raises(spark):
    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        train_logistic_probe,
    )

    df = spark.createDataFrame([], "embedding array<double>, y double")
    with pytest.raises(ValueError, match="no usable"):
        train_logistic_probe(df, label_col="y", iters=1)


def test_probe_calibration_duckdb_oracle(spark):
    """probe_calibration's bucket stats, reliability fractions, and
    top-down precision/recall sweep replay exactly in DuckDB. Scores
    are integer-derived rationals (vec_id-based) so bucketing has no
    float-boundary ambiguity and the comparison is value-exact."""
    import duckdb

    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        probe_calibration,
    )
    from pyspark.sql import functions as F

    scored = spark.range(0, 500).select(
        F.col("id").alias("vec_id"),
        F.round((F.col("id") % 97) / 97.0, 6).alias("score"),
        (F.col("id") % 3 == 0).cast("int").alias("label"),
    )
    # plant NULLs: excluded rows must not perturb any bucket
    scored = scored.withColumn(
        "score", F.when(F.col("vec_id") % 101 == 0, None).otherwise(F.col("score"))
    )
    got = [
        tuple(r)
        for r in probe_calibration(scored, n_buckets=10)
        .collect()
    ]
    want = [
        tuple(r)
        for r in duckdb.sql(
            """
WITH s AS (
  SELECT id AS vec_id,
         CASE WHEN id % 101 = 0 THEN NULL
              ELSE ROUND((id % 97) / 97.0, 6) END AS score,
         CASE WHEN id % 3 = 0 THEN 1 ELSE 0 END AS label
  FROM range(0, 500) t(id)
), b AS (
  SELECT LEAST(9, GREATEST(0, CAST(FLOOR(score * 10) AS INT))) AS bucket,
         score, label
  FROM s WHERE score IS NOT NULL
), per AS (
  SELECT bucket, COUNT(*) AS n, SUM(label) AS positives,
         ROUND(AVG(score), 6) AS mean_score
  FROM b GROUP BY bucket
)
SELECT bucket, n, positives, mean_score,
       ROUND(positives / CAST(n AS DOUBLE), 6) AS frac_positive,
       ROUND(SUM(positives) OVER w / CAST(SUM(n) OVER w AS DOUBLE), 6)
         AS precision_at,
       ROUND(SUM(positives) OVER w
             / GREATEST(1, CAST(SUM(positives) OVER
                 (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING) AS DOUBLE)), 6) AS recall_at
FROM per
WINDOW w AS (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
ORDER BY bucket
"""
        ).fetchall()
    ]
    assert len(got) == 10
    assert got == want
    # the sweep's structural invariants: recall falls as the threshold
    # rises; the bottom row's recall covers every positive
    recalls = [r[6] for r in got]
    assert recalls[0] == 1.0
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))


def test_probe_calibration_composes_with_batch_score(spark, sf_dir):
    """End-to-end: score the embeddings fixture with a fixed logistic
    probe, attach labels, calibrate — every bucket's frac_positive is a
    probability and counts conserve."""
    import numpy as np

    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        batch_score,
        linear_probe_scorer,
        probe_calibration,
    )
    from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
        load_fixture_table,
    )
    from pyspark.sql import functions as F

    emb = load_fixture_table(spark, sf_dir, "embeddings")
    w = np.linspace(-0.5, 0.5, 64)
    scored = batch_score(emb, linear_probe_scorer(w, bias=0.1)).withColumn(
        "label", (F.col("label") % 2).cast("int")
    )
    cal = probe_calibration(scored, n_buckets=5).collect()
    assert sum(r["n"] for r in cal) == scored.filter(
        F.col("score").isNotNull()
    ).count()
    for r in cal:
        assert 0.0 <= r["frac_positive"] <= 1.0
        assert 0.0 <= r["precision_at"] <= 1.0


def test_probe_calibration_excludes_nan_scores(spark):
    from pyspark.sql import functions as F

    from hospital_stain_tracker_data_pipeline_spark.operators.inference import (
        probe_calibration,
    )

    scored = spark.createDataFrame(
        [(0.05, 1), (0.15, 0), (0.95, 1)], "score double, label int"
    ).unionByName(
        spark.range(1).select(
            F.lit(float("nan")).alias("score"), F.lit(1).alias("label")
        )
    )
    cal = probe_calibration(scored, n_buckets=10).collect()
    assert sum(r["n"] for r in cal) == 3      # NaN row excluded
    assert all(r["mean_score"] == r["mean_score"] for r in cal)  # no NaN
