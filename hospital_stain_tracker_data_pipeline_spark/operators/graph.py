"""Distributed PageRank (beyond the reference surface — the classic
link-graph quality signal: a web-curation pipeline weights documents by
their domain's rank, and "rank the domain graph" is PageRank over the
host-to-host link edges).

Spark-first shape: each iteration is one join (ranks → out-edges) and
one aggregate (contributions → new ranks), both keyed by node id with
map-side partial aggregation; the driver holds only the dangling-mass
scalar and the convergence delta (aggregated values, never rows). The
rank state is localCheckpoint'd per iteration so lineage stays flat —
the same discipline as the k-means and connected-components loops.

Determinism: contributions are quantized to 1e-12-scaled LONGs before
the sum (the exact-integer trick from the k-means fit), so the
aggregation is order-invariant and reruns under any partitioning are
bit-identical — floating PageRank sums would drift with shuffle order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = int(1e12)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = 1e-6,
) -> DataFrame:
    """Node ranks for a directed edge list; returns ``(node, rank)``
    summing to 1 over all nodes that appear in any edge.

    Standard formulation: ``r' = (1−d)/N + d·(Σ_in r/outdeg +
    dangling_mass/N)`` — dangling nodes (no out-edges) redistribute
    their mass uniformly, keeping the distribution proper. Stops early
    when the L1 delta falls under ``tol`` (driver-side scalar check —
    each iteration already computes it as an aggregate).

    Duplicate edges count once (the link exists or it doesn't —
    multi-edges would let a page vote twice)."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank", "outdeg")
        # dangling mass: an aggregated scalar, the only collect per
        # loop — summed as quantized LONGs like the contributions, so
        # it too is order-invariant (a float sum here would leak
        # shuffle-order ulps into every node via the uniform term)
        [row] = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(
                F.sum(F.round(F.col("rank") * _SCALE).cast("long")),
                F.lit(0),
            ).alias("m")
        ).collect()
        dangling = float(row["m"]) / _SCALE
        contrib = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()),
                   e["src"] == with_deg["node"])
            .select(
                F.col("dst").alias("node"),
                # quantized-integer partial sums: order-invariant
                F.round((F.col("rank") / F.col("outdeg")) * _SCALE)
                .cast("long")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        uniform = base + damping * dangling / n
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(uniform)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0)) / F.lit(float(_SCALE)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            [d] = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(
                    # quantized-integer L1 delta: the early-stop
                    # decision must not depend on float sum order
                    F.sum(
                        F.round(
                            F.abs(F.col("a.rank") - F.col("b.rank")) * _SCALE
                        ).cast("long")
                    ).alias("d")
                )
                .collect()
            )
            ranks = new_ranks
            if float(d["d"]) / _SCALE < tol:
                break
        else:
            ranks = new_ranks
    return ranks
