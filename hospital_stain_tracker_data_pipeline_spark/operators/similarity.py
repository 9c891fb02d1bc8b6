"""Similarity search over embedding columns (SURVEY.md Phase 4):
brute-force cosine top-k as the exactness baseline, plus two scale
paths — label/bucket-blocked pair search and random-hyperplane LSH
(IVF-style candidate pruning without a model fit).

All vector math is higher-order functions over array<double>
(zip_with + aggregate) — JVM-side, deterministic element order, no UDF.
At 100 TB the brute-force path is a broadcast of the (small) query set
against a scanned corpus: O(corpus) with no shuffle; the pair-search
paths shuffle only by block/bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import fanout


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-to-right aggregate — the same
    operation order as a scalar loop, so results are bit-stable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def knn_brute_force(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors of each query vector: broadcast the query
    set, scan the corpus once, per-query top-k via window rank.

    rows = (query_id, vec_id, cosine_sim). Cosine rounded to 6 for
    cross-engine comparability; ordering uses the rounded value with an
    id tiebreak so the k-boundary is deterministic."""
    from pyspark.sql import Window

    c = fanout(corpus).select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    )
    q = query.select(
        F.col(query_id_col), as_double_array(F.col(vec_col)).alias("_q")
    )
    sims = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_q"), F.col("_v")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        sims.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def blocked_similar_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All within-block pairs with rounded cosine ≥ threshold
    (embedding-cosine near-dup detection). The block key bounds the
    quadratic term; at scale the block is an LSH bucket (below)."""
    v = fanout(df).select(
        F.col(block_col).alias("_block"),
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_v"),
    )
    a = v.select("_block", F.col(id_col).alias("id_a"), F.col("_v").alias("v_a"))
    b = v.select("_block", F.col(id_col).alias("id_b"), F.col("_v").alias("v_b"))
    return (
        a.join(b, "_block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _lcg_vals(n: int, s: int) -> list[float]:
    """Deterministic pseudo-random plane coefficients in [-1, 1] (no
    numpy on executors; reproducible across runs)."""
    x, out = s & 0x7FFFFFFF, []
    for _ in range(n):
        x = (1103515245 * x + 12345) & 0x7FFFFFFF
        out.append(x / 0x3FFFFFFF - 1.0)
    return out


def random_hyperplane_buckets(
    df: DataFrame,
    nbits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    tables: int = 1,
) -> DataFrame:
    """Sign-random-projection LSH (cosine-preserving): per hash table,
    nbits fixed pseudo-random hyperplanes, bucket = sign bit-pack.
    Output = (id, vec, table, bucket), one row per table (exploded).

    Multiple tables are the recall lever — a close pair only needs to
    agree on ALL bits of ONE table (recall = 1-(1-p^nbits)^tables).
    This is the scale path for ANN: the pair/knn search runs per
    (table, bucket) instead of globally."""
    v = as_double_array(F.col(vec_col))

    def _bucket(t: int) -> Column:
        bits = []
        for b in range(nbits):
            coeffs = _lcg_vals(dim, seed + 1000 * (t * nbits + b))
            proj = F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(c) for c in coeffs]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
        bucket = bits[0]
        for e in bits[1:]:
            bucket = bucket + e
        return bucket

    tb = F.explode(
        F.array(
            *[
                F.struct(F.lit(t).alias("table"), _bucket(t).alias("bucket"))
                for t in range(tables)
            ]
        )
    ).alias("_tb")
    return fanout(df).select(F.col(id_col), F.col(vec_col), tb).select(
        id_col, vec_col, F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket")
    )


def ann_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    nbits: int = 4,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: multi-table LSH candidate gen →
    distinct candidate ids → exact cosine verify ≥ threshold. Zero
    false positives (exact verify); recall = 1-(1-p^nbits)^tables where
    p = 1 - θ/π."""
    bucketed = random_hyperplane_buckets(
        df, nbits, dim, id_col, vec_col, tables=tables
    )
    a = bucketed.select("table", "bucket", F.col(id_col).alias("id_a"))
    b = bucketed.select("table", "bucket", F.col(id_col).alias("id_b"))
    cands = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v"))
    va = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("v_a"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("v_b"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
