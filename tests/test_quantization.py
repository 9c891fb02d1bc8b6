"""SQ8 embedding quantization: exact DuckDB replay of the int8 arrays
(floor-parity rounding), round-trip error bound, cosine preservation,
zero/NULL policies, and the 1-byte storage schema."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hospital_stain_tracker_data_pipeline_spark.operators.similarity import (
    cosine,
    dequantize_embeddings,
    quantize_embeddings,
)


def test_quantize_matches_duckdb_exactly(spark, sf_dir):
    got = (
        quantize_embeddings(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        )
        .orderBy("vec_id")
        .collect()
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH base AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM read_parquet('{sf_dir}/embeddings.parquet')
        ), m AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS amax
          FROM base
        )
        SELECT vec_id,
          CASE WHEN amax > 0 THEN amax / 127.0 ELSE 0.0 END AS scale,
          list_transform(v, x -> CAST(greatest(-127, least(127,
            CAST(floor(x * (CASE WHEN amax > 0 THEN 127.0 / amax
                             ELSE 0.0 END) + 0.5) AS INT))) AS TINYINT))
            AS qvec
        FROM m ORDER BY vec_id
        """
    ).fetchall()
    con.close()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["vec_id"] == w[0]
        assert g["scale"] == w[1], g["vec_id"]  # bit-exact, no approx
        assert list(g["qvec"]) == list(w[2]), g["vec_id"]


def test_roundtrip_error_bound_and_cosine_preservation(spark, sf_dir):
    """|x - x_hat| <= scale/2 per component (floor(+0.5) rounding) and
    pairwise cosines move < 0.01 after SQ8."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    q = quantize_embeddings(emb)
    deq = dequantize_embeddings(q).withColumnRenamed("embedding", "deq")
    joined = (
        emb.select("vec_id", "embedding")
        .join(deq, "vec_id")
        .join(q.select("vec_id", "scale"), "vec_id")
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        x = np.asarray(r["embedding"], dtype=np.float64)
        xh = np.asarray(r["deq"], dtype=np.float64)
        bound = r["scale"] / 2 + 1e-12
        assert np.max(np.abs(x - xh)) <= bound, r["vec_id"]

    # cosine drift over real pairs
    a = emb.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
    )
    da = dequantize_embeddings(q).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("qa")
    )
    db = dequantize_embeddings(q).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("qb")
    )
    pairs = (
        a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
        .join(da, "ia").join(db, "ib")
        .select(
            (cosine(F.col("ea").cast("array<double>"),
                    F.col("eb").cast("array<double>"))
             - cosine(F.col("qa"), F.col("qb"))).alias("drift")
        )
        .agg(F.max(F.abs(F.col("drift"))).alias("m"))
        .collect()[0]["m"]
    )
    assert pairs < 0.01, pairs


def test_zero_and_null_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, None), (3, [1.0, -2.0, 0.5])],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    q = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert q[1]["scale"] == 0.0 and list(q[1]["qvec"]) == [0, 0, 0]
    assert q[2]["scale"] is None and q[2]["qvec"] is None
    assert q[3]["qvec"][1] in (-127, 127) and abs(q[3]["qvec"][1]) == 127
    deq = {
        r["vec_id"]: r["embedding"]
        for r in dequantize_embeddings(quantize_embeddings(df)).collect()
    }
    assert deq[1] == [0.0, 0.0, 0.0]
    assert deq[2] is None
    # extreme component reconstructs exactly (q = ±127 times amax/127)
    assert deq[3][1] == pytest.approx(-2.0, abs=1e-12)


def test_qvec_is_one_byte_per_component(spark, sf_dir):
    q = quantize_embeddings(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    t = dict(q.dtypes)["qvec"]
    assert t == "array<tinyint>", t


def test_sq8_knn_recall(spark, sf_dir):
    """Searching the QUANTIZED lake instead of the float lake keeps
    recall@10 >= 0.9 on the fixture — the SQ8 artifact is a drop-in
    corpus for knn_brute_force via dequantize_embeddings."""
    from hospital_stain_tracker_data_pipeline_spark.operators.similarity import (
        knn_brute_force,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (
        emb.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    truth = knn_brute_force(emb, queries, k=10)
    sq8 = dequantize_embeddings(quantize_embeddings(emb))
    approx = knn_brute_force(sq8, queries, k=10)
    t = {(r["query_id"], r["vec_id"]) for r in truth.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(t & a) / len(t)
    assert recall >= 0.9, recall
