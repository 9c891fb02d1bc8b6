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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import fanout, materialize


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
    v = materialize(
        fanout(df).select(
            F.col(block_col).alias("_block"),
            F.col(id_col),
            as_double_array(F.col(vec_col)).alias("_v"),
        )
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
    (table, bucket) instead of globally.

    The tables×nbits projections are ONE Arrow-batched Pandas UDF doing
    a numpy matrix multiply per batch — the deliberate exception to the
    no-UDF rule: 48+ hyperplane dot products per row as Catalyst
    expressions blow up the codegen method past JIT limits, while BLAS
    does the whole batch in one gemm. Plane coefficients come from the
    deterministic LCG, so buckets are reproducible run-to-run."""
    from pyspark.sql.functions import pandas_udf

    n_planes = tables * nbits
    planes = np.array(
        [_lcg_vals(dim, seed + 1000 * i) for i in range(n_planes)]
    )  # (n_planes, dim)
    weights = np.array([1 << b for b in range(nbits)])

    @pandas_udf("array<int>")
    def buckets_udf(emb: pd.Series) -> pd.Series:
        arrs = emb.to_numpy()
        if not len(arrs):
            return pd.Series([], dtype=object)
        # NULL embedding → NULL buckets (row drops out of every table)
        mask = np.array([a is not None for a in arrs])
        out = np.empty(len(arrs), dtype=object)
        out[~mask] = None
        if mask.any():
            x = np.stack(arrs[mask])  # (present, dim)
            bits = (x @ planes.T) >= 0  # (present, n_planes)
            per_table = bits.reshape(len(x), tables, nbits)
            packed = (per_table * weights).sum(axis=2).astype("int32")
            for j, i in enumerate(np.nonzero(mask)[0]):
                out[i] = packed[j]
        return pd.Series(out)

    bucketed = fanout(df).select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(buckets_udf(as_double_array(F.col(vec_col)))).alias(
            "table", "bucket"
        ),
    )
    return bucketed


def dot_batch_udf():
    """Arrow-batched pairwise dot product (numpy einsum per batch) —
    the vectorized verify for candidate pairs. ~100× a per-element
    higher-order-function evaluation on large pair sets; used only in
    NON-oracle-compared paths (einsum's summation order differs from a
    sequential loop in the last ulp)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        aa, bb = a.to_numpy(), b.to_numpy()
        if not len(aa):
            return pd.Series([], dtype="float64")
        # NULL on either side → NULL dot (then filtered by threshold)
        mask = np.array(
            [x is not None and y is not None for x, y in zip(aa, bb)]
        )
        out = np.full(len(aa), np.nan)
        if mask.any():
            x = np.stack(aa[mask])
            y = np.stack(bb[mask])
            out[mask] = np.einsum("ij,ij->i", x, y)
        res = pd.Series(out)
        return res.where(mask, None)

    return _dot


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
    p = 1 - θ/π.

    Verify-side scale design: vectors are L2-normalized ONCE per row
    (so the per-pair work is a single dot product, not dot + 2 norms)
    and the pair dot runs as an Arrow-batched numpy einsum — the pair
    set is orders of magnitude larger than the vector set, so per-pair
    cost dominates everything."""
    bucketed = materialize(
        random_hyperplane_buckets(
            df, nbits, dim, id_col, vec_col, tables=tables
        ).select(id_col, "table", "bucket")
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
    # compute the norm ONCE into its own column — a lambda referencing
    # norm(_v) would re-evaluate the whole aggregate per element
    # (O(dim²)/row; no CSE inside higher-order functions). The
    # materialize boundary sits BETWEEN norm and the transform so
    # CollapseProject cannot re-inline it into the lambda.
    with_norm = materialize(
        v.select(F.col(id_col), "_v", norm(F.col("_v")).alias("_n"))
    )
    nv = with_norm.select(
        F.col(id_col),
        F.transform("_v", lambda x: x / F.col("_n")).alias("_nv"),
    )
    va = nv.select(F.col(id_col).alias("id_a"), F.col("_nv").alias("v_a"))
    vb = nv.select(F.col(id_col).alias("id_b"), F.col("_nv").alias("v_b"))
    dot_udf = dot_batch_udf()
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot_udf(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
