"""Leakage-safe dataset splitting (beyond the reference surface — the
eval-integrity control a training-data pipeline needs on top of a plain
hash split): assign train/val/test so that NEAR-DUPLICATE documents can
never straddle a split boundary. A plain per-doc hash split leaks — two
near-identical pages land on opposite sides and the eval set silently
overlaps the training set (the exact failure decontamination papers
measure).

Mechanism: near-dup pairs (from any of the library's pair generators:
MinHash-LSH, SimHash, SemDeDup) → connected components → every doc
inherits its COMPONENT's id as the split key → the usual md5-bucket
hash split on that key. Whole clusters move together by construction;
singleton docs (no near-dup) key on themselves, so the split converges
to the plain hash split as the duplicate rate goes to zero.

At 100 TB: the pair generation dominates (banded, see dedup.py); the
component pass is the library's min-label CC (iterations = cluster
diameter, shallow for near-dup graphs); the split itself is one
map-side expression + a broadcast-able join of the (node, cluster)
table onto the corpus — tiny, because only docs that APPEAR in a pair
carry an entry, and everything else short-circuits to its own id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components_min_label


def split_bucket(key: Column, n_buckets: int = 100) -> Column:
    """md5-derived stable bucket in [0, n_buckets) — the same
    engine-portable construction as `q_train_test_split` (15 hex chars
    → long, exactly replayable in DuckDB)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_buckets
    )


def split_assignments(
    key: Column, train_pct: int = 80, val_pct: int = 10
) -> Column:
    """'train' | 'val' | 'test' from a stable key; percentages are
    integer bucket counts out of 100."""
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(
            f"invalid split percentages: {train_pct}/{val_pct}"
        )
    b = split_bucket(key)
    return (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    train_pct: int = 80,
    val_pct: int = 10,
    cc_max_iter: int = 20,
) -> DataFrame:
    """Adds ``split_key`` (the near-dup component's minimum doc id;
    own id for docs in no pair) and ``split`` to ``docs``.

    ``pairs`` is any (id_a, id_b) near-dup edge frame —
    ``minhash_lsh_dedup_pairs``, ``simhash_dedup_pairs``,
    ``semantic_dedup_pairs`` output all fit. Every doc of a connected
    near-dup component receives the SAME split (key = component min
    id), so no ≥-threshold pair — nor any transitive chain of pairs —
    can straddle train/eval. Deterministic under any partitioning
    (min-label CC + md5 buckets, no RNG). ``cc_max_iter`` is the CC
    pass's component-diameter capacity — the knob the non-convergence
    error tells the operator to raise."""
    a, b = pair_cols
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    # nodes=None → edge-incident universe derived from the operator's
    # own checkpointed edge list (a lazy pairs producer runs ONCE)
    comp = connected_components_min_label(edges, max_iter=cc_max_iter).select(
        F.col("node").alias(id_col), F.col("cluster_id").alias("_comp")
    )
    keyed = docs.join(comp, id_col, "left").withColumn(
        "split_key", F.coalesce(F.col("_comp"), F.col(id_col))
    ).drop("_comp")
    return keyed.withColumn(
        "split", split_assignments(F.col("split_key"), train_pct, val_pct)
    )
