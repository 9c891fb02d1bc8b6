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
    """IVF ANN top-10 for the same query as ``knn_cosine``: k-means
    coarse quantizer (16 cells, 3 Lloyd iterations, deterministic
    md5-order init) → probe the query's 4 nearest cells → exact cosine
    inside the probed quarter of the corpus.

    Fully oracle-graded since round 7: the fit is exact integer
    arithmetic on the 1e-6 grid end-to-end (md5-ordered seeds,
    integer-gemm assignment, LONG-sum + floor-division update — see
    ``operators.similarity.ivf_fit_centroids``), so
    ``_ivf_oracle_sql`` below replays the ENTIRE operator — all three
    Lloyd iterations unrolled as CTEs, then probe + exact-cosine
    verify — and matches hash-exactly. Recall floors, nprobe
    monotonicity, partitioning determinism and the sf0.001 golden
    top-10 stay pinned in ``tests/test_ann_recall.py``. Scale: search
    cost is ~nprobe/n_clusters of brute force; n_clusters grows
    ~√corpus to keep both the assign gemm and the per-cell scan
    balanced."""
    emb = load_fixture_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_ivf(
        emb, query, k=10, n_clusters=16, nprobe=4, iters=3
    ).orderBy(F.desc("cosine_sim"), F.asc("vec_id"))


def _ivf_oracle_sql(
    k: int = 10, n_clusters: int = 16, nprobe: int = 4, iters: int = 3
) -> str:
    """Generate the DuckDB replay of ``knn_ivf`` — fit included.

    Replayability argument (mirrors ``ivf_fit_centroids``): every
    quantity is either (a) an exact integer below 2^53 carried in
    BIGINT/DOUBLE (quantized components, their dot products, the
    Lloyd sums), or (b) the result of a single correctly-rounded IEEE
    operation on such integers (sqrt, divide, floor-of-quotient).
    Neither class depends on evaluation or aggregation order, so
    Spark's gemm-and-shuffle answers and this SQL's window-and-join
    answers are bit-identical; the fit unrolls as one CTE chain per
    Lloyd iteration (assign → update → carry empty clusters)."""
    parts = [
        f"""
WITH src AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> floor(x * 1000000.0)) AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL
), c0 AS (
  SELECT rn - 1 AS cluster, qv AS cv
  FROM (
    SELECT qv, row_number() OVER (
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM src
  ) WHERE rn <= {n_clusters}
)"""
    ]
    score = (
        "list_inner_product(s.qv, c.cv)\n"
        "           / (CASE WHEN list_inner_product(c.cv, c.cv) = 0 THEN 1.0\n"
        "                   ELSE sqrt(list_inner_product(c.cv, c.cv)) END)"
    )
    for i in range(1, iters + 1):
        parts.append(f""", a{i} AS (
  SELECT s.vec_id, c.cluster,
         {score} AS score
  FROM src s CROSS JOIN c{i - 1} c
), asg{i} AS (
  SELECT vec_id, cluster FROM a{i}
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY score DESC, cluster ASC) = 1
), upd{i} AS (
  SELECT g.cluster, t.u.pos,
         floor(CAST(SUM(CAST(t.u.x AS BIGINT)) AS DOUBLE) / COUNT(*)) AS val
  FROM asg{i} g
  JOIN src s USING (vec_id),
       UNNEST([{{'pos': i - 1, 'x': s.qv[i]}}
               FOR i IN range(1, len(s.qv) + 1)]) AS t(u)
  GROUP BY g.cluster, t.u.pos
), c{i} AS (
  SELECT p.cluster, COALESCE(n.cv, p.cv) AS cv
  FROM c{i - 1} p
  LEFT JOIN (SELECT cluster, list(val ORDER BY pos) AS cv
             FROM upd{i} GROUP BY cluster) n USING (cluster)
)""")
    parts.append(f""", af AS (
  SELECT s.vec_id, c.cluster,
         {score} AS score
  FROM src s CROSS JOIN c{iters} c
), cells AS (
  SELECT vec_id, cluster FROM af
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY score DESC, cluster ASC) = 1
), probe AS (
  SELECT vec_id AS query_id, cluster FROM af
  WHERE vec_id = 0
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY score DESC, cluster ASC) <= {nprobe}
), n2 AS (
  SELECT vec_id, v, list_inner_product(v, v) AS nn FROM src
)
SELECT query_id, vec_id, cosine_sim
FROM (
  SELECT p.query_id, ce.vec_id,
         ROUND(list_inner_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)), 6)
           AS cosine_sim
  FROM probe p
  JOIN cells ce USING (cluster)
  JOIN n2 a ON a.vec_id = p.query_id
  JOIN n2 b ON b.vec_id = ce.vec_id
  WHERE ce.vec_id <> p.query_id
)
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) <= {k}
ORDER BY cosine_sim DESC, vec_id ASC
""")
    return "".join(parts)


SQL_KNN_IVF = _ivf_oracle_sql(k=10, n_clusters=16, nprobe=4, iters=3)
