"""Corpus snapshot diffing — training-data governance (beyond the
reference surface): when a crawl refresh, a re-curation, or a
licensing takedown produces corpus v(N+1), the FIRST question a data
owner asks is "what changed vs vN, exactly?" — which documents were
added, removed, or rewritten, and how many tokens moved. Answering it
must not require re-reading either corpus more than once.

Spark-first shape: hash each side's content ONCE into a narrow
``(id, content_hash, n_tok)`` projection (xxhash64 — cheap JVM-side,
collision-safe at diff granularity), then ONE full-outer equi-join on
the id. Every downstream answer (per-doc status, counts, token
deltas) is a projection or partial-aggregation of that join — the diff
costs two scans + one shuffle, independent of how many questions get
asked of it. The summary is DuckDB-replayable (exact integer counts;
``tests/test_diffs.py`` pins the oracle).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_token_count

__all__ = ["corpus_diff", "corpus_diff_summary", "summarize_diff"]


def _side(df: DataFrame, id_col: str, text_col: str, prefix: str):
    return df.select(
        F.col(id_col),
        F.xxhash64(F.col(text_col)).alias(f"{prefix}_hash"),
        F.coalesce(doc_token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias(f"{prefix}_tok"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Per-document change ledger between two corpus versions:
    ``(id, status, old_tok, new_tok)`` where status is ``added`` (id
    only in new), ``removed`` (only in old), ``changed`` (both, text
    hash differs), or ``unchanged``. Unchanged rows — the overwhelming
    majority of a healthy refresh — are filtered out by default so the
    ledger is proportional to the CHANGE, not the corpus; pass
    ``include_unchanged=True`` for the full reconciliation frame.

    A NULL text hashes like any other value (xxhash64 of NULL is a
    fixed constant via the null-safe comparison below), so NULL->text
    and text->NULL transitions count as changed, not unchanged.

    One full-outer join on the id; both sides are pre-projected to
    (id, hash, token count) so no text crosses the shuffle."""
    o = _side(old, id_col, text_col, "old")
    n = _side(new, id_col, text_col, "new")
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        F.col(id_col),
        status.alias("status"),
        F.col("old_tok"),
        F.col("new_tok"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row reconciliation: ``n_added, n_removed, n_changed,
    n_unchanged, tok_added, tok_removed, tok_delta`` — the numbers a
    dataset card / release note prints, and the invariant a refresh
    job asserts before promoting a corpus version (e.g. "a takedown
    run must have n_added == 0"). ``tok_delta`` is total new-side
    tokens minus total old-side tokens over ALL documents — exactly
    reconcilable against the two corpus token totals. Same single
    join as ``corpus_diff``; conditional aggregation, no second
    scan."""
    return summarize_diff(
        corpus_diff(old, new, id_col, text_col, include_unchanged=True)
    )


def summarize_diff(d: DataFrame) -> DataFrame:
    """The ``corpus_diff_summary`` aggregation over an ALREADY-BUILT
    ``corpus_diff(..., include_unchanged=True)`` frame — for callers
    that need both the ledger and the summary from ONE reconciliation
    join (persist the diff, filter for the ledger, aggregate here;
    the ``corpus_diff`` CLI does exactly this). Feeding it a
    default-filtered diff (unchanged rows dropped) yields
    ``n_unchanged = 0`` and a token delta over the changes only —
    pass ``include_unchanged=True``."""
    is_ = lambda s: (F.col("status") == s).cast("long")  # noqa: E731
    # every SUM coalesces to 0: two empty corpora must reconcile to an
    # all-zero row, not NULLs (a gate asserting n_added == 0 would
    # silently misfire on None)
    z = lambda c: F.coalesce(c, F.lit(0).cast("long"))  # noqa: E731
    return d.agg(
        z(F.sum(is_("added"))).alias("n_added"),
        z(F.sum(is_("removed"))).alias("n_removed"),
        z(F.sum(is_("changed"))).alias("n_changed"),
        z(F.sum(is_("unchanged"))).alias("n_unchanged"),
        z(
            F.sum(
                F.when(
                    F.col("status") == "added", F.col("new_tok")
                ).otherwise(F.lit(0))
            )
        ).alias("tok_added"),
        z(
            F.sum(
                F.when(
                    F.col("status") == "removed", F.col("old_tok")
                ).otherwise(F.lit(0))
            )
        ).alias("tok_removed"),
        (
            z(F.sum(F.coalesce(F.col("new_tok"), F.lit(0))))
            - z(F.sum(F.coalesce(F.col("old_tok"), F.lit(0))))
        ).alias("tok_delta"),
    )
