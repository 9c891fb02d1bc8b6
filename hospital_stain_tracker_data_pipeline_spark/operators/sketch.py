"""Bounded-memory frequency sketches and skew diagnostics (beyond the
reference surface — the corpus-profiling tools a 100 TB pipeline needs
before it can pick caps, salts, and dedup parameters).

``heavy_hitters`` finds every item whose global frequency is at least a
``phi`` fraction of the corpus — EXACTLY — in two scans and without
ever shuffling the full item stream. Pass 1 runs a Misra-Gries
(space-saving) summary per partition inside ``mapInPandas``: a
capacity-``m`` summary retains every item whose local count exceeds
``n_p / m``, so by pigeonhole the union of per-partition candidate
sets contains every item with global count > N/m (Agarwal et al.,
"Mergeable Summaries", PODS 2012). With ``m = 2*ceil(1/phi)`` the
candidate union (≤ m rows per partition — kilobytes) is a guaranteed
superset of the phi-heavy items. Pass 2 broadcast-semi-joins the
corpus against the candidates and takes EXACT counts for just those
items. The full item stream is never the shuffle payload: the only
exchange carries candidate-matched rows reduced by partial
aggregation.

``skew_report`` profiles a key column (per-key count distribution +
hot keys + a salt suggestion) so the cost of a planned groupBy/join on
that key is visible before it runs.

The batch-level Misra-Gries merge uses pandas ``value_counts`` per
Arrow batch (vectorized) and only touches Python dicts at summary
size, not stream size.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _mg_merge(summary: dict, counts: dict, capacity: int) -> dict:
    """Merge a batch's exact counts into a Misra-Gries summary, then
    compress back to ``capacity`` entries by subtracting the
    (capacity+1)-th largest counter from all (the mergeable-summaries
    merge: error grows additively, the > n/m retention guarantee is
    preserved)."""
    for k, v in counts.items():
        summary[k] = summary.get(k, 0) + int(v)
    if len(summary) > capacity:
        cut = sorted(summary.values(), reverse=True)[capacity]
        summary = {k: v - cut for k, v in summary.items() if v > cut}
    return summary


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    phi: float,
    capacity: int | None = None,
) -> DataFrame:
    """All items whose frequency is ≥ ``phi * N`` (N = total rows),
    with EXACT counts, as ``(item, n)`` sorted by ``n`` descending then
    item ascending. One row of ``df`` = one item occurrence (explode
    upstream for n-grams). NULL items are ignored (they are not a
    frequency class). ``phi`` must be in (0, 1].

    Guarantee: complete AND exact — pass 1's per-partition Misra-Gries
    candidate union provably contains every phi-heavy item; pass 2
    re-counts candidates exactly. Items below the threshold never
    appear. Memory is O(capacity) per task; the default capacity
    ``2*ceil(1/phi)`` doubles the pigeonhole requirement for slack,
    and an explicit capacity below ``ceil(1/phi)`` is rejected —
    it would silently break completeness. The threshold
    ``ceil(phi*N)`` is computed in exact rational arithmetic on the
    decimal value of ``phi`` (never float products).

    At 100 TB: pass 1 is a mapInPandas scan emitting ≤ capacity rows
    per partition; pass 2 is a broadcast semi-join (candidate set is
    kilobytes) plus a partially-aggregated count whose exchange carries
    only candidate items. Nothing resembling the full n-gram stream is
    ever shuffled — compare a naive ``groupBy(item).count()`` whose
    exchange is the entire corpus vocabulary.
    """
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    # Fraction(str(phi)) reads the DECIMAL the caller wrote (0.07 ->
    # 7/100), so thresholds and guards are exact — float math would
    # make ceil(0.07 * 100) = 8 and silently exclude an exactly-
    # phi-heavy item
    phi_frac = Fraction(str(phi))
    min_capacity = math.ceil(1 / phi_frac)
    m = int(capacity) if capacity is not None else 2 * min_capacity
    if m < min_capacity:
        raise ValueError(
            f"capacity {capacity} breaks the completeness guarantee: "
            f"phi={phi} needs capacity >= ceil(1/phi) = {min_capacity}"
        )

    items = df.select(F.col(item_col).cast("string").alias("item"))

    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("part_rows", T.LongType()),
        ]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        n_rows = 0
        for pdf in batches:
            col = pdf["item"].dropna()  # NULLs are not an item class
            n_rows += len(col)
            summary = _mg_merge(summary, col.value_counts().to_dict(), m)
        rows = [(k, 0) for k in summary]
        rows.append((None, n_rows))  # partition-size meta row
        yield pd.DataFrame(rows, columns=["item", "part_rows"])

    summary_df = items.mapInPandas(summarize, out_schema)
    summary_df = summary_df.persist()
    try:
        total = summary_df.agg(F.sum("part_rows").alias("n")).collect()[0]["n"] or 0
        candidates = summary_df.filter(F.col("item").isNotNull()).select(
            "item"
        ).distinct()
        threshold = math.ceil(phi_frac * total)
        exact = (
            items.join(F.broadcast(candidates), "item", "left_semi")
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= F.lit(threshold))
            .orderBy(F.col("n").desc(), F.col("item"))
        )
        # materialize before unpersisting the summary the plan hangs off
        exact = exact.localCheckpoint(eager=True)
    finally:
        summary_df.unpersist()
    return exact


def skew_report(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """One-row diagnosis of how skewed ``key_col`` is — run it BEFORE
    committing to a groupBy/join on that key at scale.

    Columns: ``n_rows``, ``n_keys``, ``max_count`` (hottest key's
    rows), ``p50_count``/``p90_count``/``p99_count`` (EXACT continuous
    percentiles of the per-key count distribution — same definition as
    DuckDB's ``quantile_cont``, so the report is cross-engine
    replayable), ``top_keys`` (the ``top`` hottest keys as
    ``key:count`` strings, count-desc then key-asc), and
    ``skew_ratio`` = max_count / mean_count — the factor by which the
    hottest task outweighs the average if this key becomes a shuffle
    key. A ratio ≫ the executor-count suggests salting
    (``skew_ratio`` rounded to 2 dp for stable cross-engine hashes).

    Plan: one partial-agg exchange to per-key counts (rows = n_keys,
    not n_rows), then a single-node summary over the count column —
    the exact-percentile sort is over n_keys values, which is the
    distribution being diagnosed, not the corpus. NULL keys count as a
    real group (NULL-key volume is exactly what you want visible).
    """
    counts = (
        df.groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # collect_list order is not guaranteed even after orderBy+limit, so
    # the struct carries a negated count and array_sort imposes the
    # (count desc, key asc) order deterministically post-collection
    # the limit orders by the same COALESCED key the display strings
    # use (plus a NULL-last tiebreak), so a NULL key tying with a real
    # key at the boundary picks the same row as the DuckDB replay
    topk = (
        counts.orderBy(
            F.col("cnt").desc(),
            F.coalesce(F.col("key"), F.lit("NULL")),
            F.col("key").isNull(),
        )
        .limit(top)
        .select(
            F.struct(
                (-F.col("cnt")).alias("_neg"),
                F.coalesce(F.col("key"), F.lit("NULL")).alias("key"),
                F.col("cnt").alias("cnt"),
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("_ss"))
        .select(
            F.transform(
                "_ss", lambda s: F.concat_ws(":", s["key"], s["cnt"])
            ).alias("top_keys")
        )
    )
    summary = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_count"),
        F.percentile("cnt", F.lit(0.5)).alias("p50_count"),
        F.percentile("cnt", F.lit(0.9)).alias("p90_count"),
        F.percentile("cnt", F.lit(0.99)).alias("p99_count"),
        F.round(
            F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1))), 2
        ).alias("skew_ratio"),
    )
    return summary.crossJoin(topk)
