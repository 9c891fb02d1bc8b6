"""Similarity-search plans over the ``embeddings`` fixture
(training-data pipeline extensions; SURVEY.md Phase 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_lsh_pairs,
    blocked_similar_pairs,
    knn_brute_force,
    knn_ivf,
)
from ..sources.tables import load_fixture_table


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 neighbors of vec_id 0: broadcast
    the query vector, single corpus scan, TakeOrdered top-k. The
    exactness baseline every ANN variant is measured against."""
    emb = load_fixture_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_brute_force(emb, query, k=10).orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )


SQL_KNN_COSINE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id = 0
), sims AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_dot_product(qv, CAST(e.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(qv, qv))
              * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))), 6)
           AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine_sim FROM sims
ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
"""


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (cosine ≥
    0.35 — tuned to the fixture's similarity range, whose max
    within-label cosine is ~0.47). The label plays the blocking key
    that an LSH bucket plays at scale — the quadratic term is bounded
    per block."""
    emb = load_fixture_table(spark, sf_dir, "embeddings")
    return blocked_similar_pairs(emb, "label", threshold=0.35).orderBy(
        "id_a", "id_b"
    )


SQL_EMBEDDING_DUP_PAIRS = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.ev, b.ev)
             / (sqrt(list_dot_product(a.ev, a.ev))
                * sqrt(list_dot_product(b.ev, b.ev))), 6) AS cosine_sim
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.ev, b.ev)
      / (sqrt(list_dot_product(a.ev, a.ev))
         * sqrt(list_dot_product(b.ev, b.ev))), 6) >= 0.35
ORDER BY id_a, id_b
"""


def q_ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: multi-table sign-projection LSH (8 tables ×
    6 bits, deterministic integer-lattice planes over 1e-6-quantized
    vectors) → distinct candidates → exact cosine verify (≥ 0.35).
    Zero false positives by construction; recall is a property of the
    banding, and the DuckDB oracle replays the ENTIRE pipeline —
    bucket assignment, candidate join, verify — hash-exactly, because
    every projection/dot/norm is a sum of exact float64 integers
    (see operators.similarity.QUANT_SCALE).

    nbits sizes the bucket fan-out: candidates/table ≈ n²/2^nbits, so
    more bits = fewer candidates = cheaper verify but lower recall —
    at larger corpus sizes raise nbits to keep candidate counts flat."""
    emb = load_fixture_table(spark, sf_dir, "embeddings")
    return ann_lsh_pairs(
        emb, threshold=0.35, nbits=6, tables=8, dim=64
    ).orderBy("id_a", "id_b")


def _ann_lsh_oracle_sql(
    threshold: float, nbits: int, tables: int, dim: int, seed: int = 42
) -> str:
    """Generate the DuckDB replay of ``ann_lsh_pairs``: the same
    integer-lattice planes (same LCG stream) inlined as literals, the
    same floor(x·1e6) quantization, sign → bit-pack → bucket self-join
    → exact quantized-cosine verify. All arithmetic is sums of exact
    float64 integers, so buckets and cosines match Spark bit-for-bit."""
    from ..operators.similarity import lattice_planes

    planes = lattice_planes(tables, nbits, dim, seed)
    rows = []
    for i in range(tables * nbits):
        t, b = divmod(i, nbits)
        coefs = ", ".join(f"{c:.1f}" for c in planes[i])
        rows.append(f"({t}, {1 << b}, [{coefs}])")
    values = ",\n    ".join(rows)
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> floor(x * 1000000.0)) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
), planes(tbl, wt, coefs) AS (
  SELECT * FROM (VALUES
    {values}
  ) v(tbl, wt, coefs)
), bits AS (
  SELECT q.vec_id, p.tbl,
         CASE WHEN list_inner_product(q.qv, p.coefs) >= 0
              THEN p.wt ELSE 0 END AS bitval
  FROM q CROSS JOIN planes p
), buckets AS (
  SELECT vec_id, tbl, CAST(SUM(bitval) AS BIGINT) AS bucket
  FROM bits GROUP BY 1, 2
), cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), n2 AS (
  SELECT vec_id, qv, list_inner_product(qv, qv) AS nn FROM q
)
SELECT c.id_a, c.id_b,
       ROUND(list_inner_product(a.qv, b.qv) / (sqrt(a.nn) * sqrt(b.nn)), 6)
         AS cosine_sim
FROM cands c
JOIN n2 a ON c.id_a = a.vec_id
JOIN n2 b ON c.id_b = b.vec_id
WHERE ROUND(list_inner_product(a.qv, b.qv) / (sqrt(a.nn) * sqrt(b.nn)), 6)
      >= {threshold}
ORDER BY id_a, id_b
"""


SQL_ANN_LSH_PAIRS = _ann_lsh_oracle_sql(
    threshold=0.35, nbits=6, tables=8, dim=64
)


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, computed as a fully distributed
    array aggregate: posexplode the vector to (label, pos, x) → grouped
    decimal-exact mean per dimension. Output is the exploded form
    (label, pos, centroid_val) — stable to hash cross-engine.

    Scale: this is the update step of distributed k-means. The explode
    multiplies rows by dim, but the partial+final agg collapses them to
    labels × dim rows before the shuffle — the shuffle payload is the
    centroid matrix, not the corpus."""
    emb = load_fixture_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    return (
        ex.groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("centroid_val")
        )
        .orderBy("label", "pos")
    )


SQL_EMBEDDING_CENTROIDS = """
WITH v AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), ex AS (
  SELECT label, u.pos, u.x
  FROM v,
       UNNEST([{'pos': i - 1, 'x': ev[i]} FOR i IN range(1, len(ev) + 1)]) AS t(u)
)
SELECT label, pos,
       ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
         AS centroid_val
FROM ex GROUP BY label, pos
ORDER BY label, pos
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the same query as ``knn_cosine``: spherical
    k-means coarse quantizer (16 cells, 3 Lloyd iterations,
    deterministic hash-order init) → probe the query's 4 nearest cells
    → exact cosine inside the probed quarter of the corpus.

    The ONE legitimately rows-only catalog entry: the fit interleaves
    driver-side numpy normalization with per-iteration Spark jobs — an
    iterative algorithm DuckDB has no way to replay as one SQL query;
    the driver records rows-only while ``tests/test_ann_recall.py``
    pins recall floors + overlap bit-identity
    (``test_ivf_recall_scales_with_nprobe``), bit-identical output
    under corpus repartitioning
    (``test_ivf_partitioning_determinism`` — the Lloyd update sums
    1e-6-quantized components as LONGs, so aggregation order cannot
    perturb centroids), and the exact sf0.001 top-10
    (``test_ivf_golden_neighbors``). Scale: search cost is
    ~nprobe/n_clusters of brute force; n_clusters grows ~√corpus to
    keep both the assign gemm and the per-cell scan balanced."""
    emb = load_fixture_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_ivf(
        emb, query, k=10, n_clusters=16, nprobe=4, iters=3
    ).orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
