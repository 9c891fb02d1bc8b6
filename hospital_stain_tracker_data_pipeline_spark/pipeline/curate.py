"""End-to-end corpus curation recipe: the canonical composition of the
training-data operators into the pipeline a pretraining data run
actually executes —

    quality funnel → exact dedup → near-dup drop → epoch shuffle
    → sequence packing

Each stage is one of the library's standalone operators; this module
only wires them, so the scale properties are the stages' own (funnel:
one conditional-agg scan; exact dedup: fingerprint groupBy, payload
never shuffles; near-dup: banded MinHash-LSH candidates, no all-pairs;
shuffle: distributed range sort; packing: per-shard cumsum window).
The wiring adds exactly one extra scan for the funnel report and
nothing else.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from ..operators.dedup import exact_dedup, minhash_lsh_dedup_pairs
from ..operators.packing import epoch_shuffle, filter_funnel, pack_token_chunks


@dataclass
class CurationReport:
    total: int
    after_quality: int
    after_exact_dedup: int
    after_near_dedup: int
    chunks: int
    packed_tokens: int


def default_quality_stages(
    min_tokens: int = 5, min_quality: float = 0.2
) -> list[tuple[str, Column]]:
    """The C4-ish default funnel: non-blank, a minimum length, a
    minimum heuristic quality score. Stages are (name, predicate)
    pairs — callers append/replace to taste."""
    return [
        ("nonblank", F.trim(F.col("text")) != ""),
        ("min_tokens", token_count(F.col("text")) >= min_tokens),
        ("quality", quality_score(F.col("text")) >= min_quality),
    ]


def curate_documents(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    seed: int = 0,
    stages: list[tuple[str, Column]] | None = None,
    near_dup_threshold: float = 0.9,
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation pipeline over a ``(doc_id, text)`` corpus;
    returns ``(packed_chunks, report)``.

    Winner policy is uniform across both dedup stages: the LOWEST
    doc_id of a duplicate group survives (deterministic under any
    partitioning). Near-dup pairs come from the banded MinHash-LSH
    operator, so the drop set is exactly "every doc that appears as
    the higher id in a ≥threshold pair" — transitive chains collapse
    to their minimum without a connected-components pass because each
    pair independently names a smaller survivor. The final chunk set is
    a pure function of (corpus, stages, threshold, seed, budget,
    n_shards) — rerunnable bit-identically, which is what a training
    job resuming mid-corpus needs."""
    stages = stages if stages is not None else default_quality_stages()
    total = docs.count()

    cond = None
    for _, c in stages:
        cond = c if cond is None else (cond & c)
    clean = docs.filter(cond) if cond is not None else docs
    n_clean = clean.count()

    # exact dedup: keep each fingerprint's lowest doc_id
    keep = exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    exact = clean.join(keep, "doc_id", "left_semi")
    n_exact = exact.count()

    # near-dup drop: every higher id of a >= threshold pair goes
    drop = (
        minhash_lsh_dedup_pairs(exact, threshold=near_dup_threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    deduped = exact.join(drop, "doc_id", "left_anti")
    n_near = deduped.count()

    shuffled = epoch_shuffle(deduped, seed=seed)
    chunks = pack_token_chunks(
        shuffled.drop("_order"), budget=budget, n_shards=n_shards
    )
    agg = chunks.agg(
        F.count_distinct("shard", "chunk_id").alias("n_chunks"),
        F.sum("chunk_tokens").alias("tok"),
    ).collect()[0]

    report = CurationReport(
        total=total,
        after_quality=n_clean,
        after_exact_dedup=n_exact,
        after_near_dedup=n_near,
        chunks=int(agg.n_chunks or 0),
        packed_tokens=int(agg.tok or 0),
    )
    return chunks, report


def curation_funnel_report(
    docs: DataFrame, stages: list[tuple[str, Column]] | None = None
) -> DataFrame:
    """The one-scan observability row for the quality stages alone
    (dedup attrition needs the join stages above and is reported by
    ``curate_documents``)."""
    return filter_funnel(docs, stages if stages is not None else default_quality_stages())
