"""The query catalog: name → QuerySpec(fn, oracle_sql).

Backs ``__spark_entry__.queries()`` / ``oracle_sql()``. Every entry —
including ``knn_ivf`` since round 7 (the Lloyd fit is exact-integer
arithmetic, so its oracle unrolls the iterations as SQL CTEs), the LSH
ANN, and all four streaming entries — carries a full DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from . import corpus as C
from . import crawl as W
from . import relational as R
from . import text as X
from . import vectors as V
from . import streaming_plan as S


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: Optional[str]


# Exactly 50 entries — the grading driver caps at the first 50 in
# declaration order, so near-duplicate §2 one-liners are consolidated
# into multi-op queries (each merged entry's docstring lists the op-IDs
# it carries; COVERAGE.md maps every §2 op-id to its entry).
CATALOG: dict[str, QuerySpec] = {
    # --- §2.2 projections / filters / validation ---
    "filter_project": QuerySpec(R.q_filter_project, R.SQL_FILTER_PROJECT),
    "validate_rejects": QuerySpec(R.q_validate_rejects, R.SQL_VALIDATE_REJECTS),
    # --- §2.3 joins ---
    "dim_join": QuerySpec(R.q_dim_join, R.SQL_DIM_JOIN),
    "dim_get_or_create": QuerySpec(R.q_dim_get_or_create, R.SQL_DIM_GET_OR_CREATE),
    "upsert_merge": QuerySpec(R.q_upsert_merge, R.SQL_UPSERT_MERGE),
    "asof_join": QuerySpec(R.q_asof_join, R.SQL_ASOF_JOIN),
    # --- §2.4 aggregations (merged families) ---
    "scalar_summary": QuerySpec(R.q_scalar_summary, R.SQL_SCALAR_SUMMARY),
    "event_type_metrics": QuerySpec(
        R.q_event_type_metrics, R.SQL_EVENT_TYPE_METRICS
    ),
    # --- §2.5 windows ---
    "window_lag_running": QuerySpec(
        R.q_window_lag_running, R.SQL_WINDOW_LAG_RUNNING
    ),
    "rolling_trend": QuerySpec(R.q_rolling_trend, R.SQL_ROLLING_TREND),
    "rank_topn_per_group": QuerySpec(
        R.q_rank_topn_per_group, R.SQL_RANK_TOPN_PER_GROUP
    ),
    # --- §2.7 set ops / grouping sets ---
    "grouping_multi": QuerySpec(R.q_grouping_multi, R.SQL_GROUPING_MULTI),
    # --- §2.8 scalar functions ---
    "strain_formula": QuerySpec(R.q_strain_formula, R.SQL_STRAIN_FORMULA),
    # --- headline aggregations (bench) ---
    "pricing_summary": QuerySpec(R.q_pricing_summary, R.SQL_PRICING_SUMMARY),
    "top_unshipped": QuerySpec(R.q_top_unshipped, R.SQL_TOP_UNSHIPPED),
    # --- text analysis (Phase 4) ---
    "doc_profile": QuerySpec(X.q_doc_profile, X.SQL_DOC_PROFILE),
    "tfidf_topterms": QuerySpec(X.q_tfidf_topterms, X.SQL_TFIDF_TOPTERMS),
    # --- dedup family (Phase 4) ---
    "dedup_jaccard_topk": QuerySpec(X.q_dedup_jaccard_topk, X.SQL_DEDUP_JACCARD_TOPK),
    "dedup_simhash": QuerySpec(X.q_dedup_simhash, X.SQL_DEDUP_SIMHASH),
    "dedup_minhash_lsh": QuerySpec(X.q_dedup_minhash_lsh, X.SQL_DEDUP_MINHASH_LSH),
    "dup_clusters": QuerySpec(X.q_dup_clusters, X.SQL_DUP_CLUSTERS),
    # --- training-data pipeline ops (Phase 4) ---
    "train_test_split": QuerySpec(X.q_train_test_split, X.SQL_TRAIN_TEST_SPLIT),
    # --- round-13 rotation: PDF round-trip extraction (classic 1.4 +
    # ObjStm/xref-stream 1.5 twins, hash-graded against the fixture
    # text) and exact-URL crawl dedup (real canonicalizer + lowest-id
    # winners, canonical strings value-compared) ---
    "pdf_roundtrip": QuerySpec(X.q_pdf_roundtrip, X.SQL_PDF_ROUNDTRIP),
    "url_dedup": QuerySpec(W.q_url_dedup, W.SQL_URL_DEDUP),
    "robots_gate": QuerySpec(W.q_robots_gate, W.SQL_ROBOTS_GATE),
    # --- round-12 rotation: the approximate-sketch family's error
    # CONTRACTS hash-graded (internals stay engine-private), the md5
    # epoch permutation replayed key-exact, and the zlib signal's
    # NULL-accounting contract (see plans/relational.py + corpus.py
    # docstrings and COVERAGE.md) ---
    "approx_percentiles_check": QuerySpec(
        R.q_approx_percentiles_check, R.SQL_APPROX_PERCENTILES_CHECK
    ),
    "approx_distinct_check": QuerySpec(
        R.q_approx_distinct_check, R.SQL_APPROX_DISTINCT_CHECK
    ),
    "epoch_shuffle": QuerySpec(C.q_epoch_shuffle, C.SQL_EPOCH_SHUFFLE),
    "compression_signals": QuerySpec(
        C.q_compression_signals, C.SQL_COMPRESSION_SIGNALS
    ),
    # --- round-11 rotation: repetition / sampling / funnel / crawl
    # (previously pytest-only under the 50-entry cap; see COVERAGE.md) ---
    "repetition_profile": QuerySpec(
        C.q_repetition_profile, C.SQL_REPETITION_PROFILE
    ),
    "sample_stratified": QuerySpec(
        C.q_sample_stratified, C.SQL_SAMPLE_STRATIFIED
    ),
    "filter_funnel": QuerySpec(C.q_filter_funnel, C.SQL_FILTER_FUNNEL),
    "fetch_schedule": QuerySpec(W.q_fetch_schedule, W.SQL_FETCH_SCHEDULE),
    # --- corpus-pipeline rotation (round 10: previously pytest-only
    # under the 50-entry cap; see plans/corpus.py + COVERAGE.md) ---
    "pack_token_chunks": QuerySpec(
        C.q_pack_token_chunks, C.SQL_PACK_TOKEN_CHUNKS
    ),
    "heavy_hitters": QuerySpec(C.q_heavy_hitters, C.SQL_HEAVY_HITTERS),
    "dedup_spans": QuerySpec(C.q_dedup_spans, C.SQL_DEDUP_SPANS),
    "dedup_substrings": QuerySpec(
        C.q_dedup_substrings, C.SQL_DEDUP_SUBSTRINGS
    ),
    "corpus_report": QuerySpec(C.q_corpus_report, C.SQL_CORPUS_REPORT),
    "bm25_topk": QuerySpec(C.q_bm25_topk, C.SQL_BM25_TOPK),
    "gopher_quality_kept": QuerySpec(
        C.q_gopher_quality_kept, C.SQL_GOPHER_QUALITY_KEPT
    ),
    "rrf_fuse": QuerySpec(C.q_rrf_fuse, C.SQL_RRF_FUSE),
    # --- multimodal plumbing (Phase 4; round 14 rotation #5: the
    # image near-dup round trip — deterministic BMP/PNG writer rigs →
    # real sniff/decode → integer dHash → the capped Hamming-banded
    # pair engine, with the oracle re-deriving every hash
    # arithmetically and brute-forcing the Hamming ball) ---
    "image_near_dup_pairs": QuerySpec(
        X.q_image_near_dup_pairs, X.SQL_IMAGE_NEAR_DUP_PAIRS
    ),
    # --- similarity search (Phase 4) ---
    "knn_cosine": QuerySpec(V.q_knn_cosine, V.SQL_KNN_COSINE),
    "embedding_dup_pairs": QuerySpec(V.q_embedding_dup_pairs, V.SQL_EMBEDDING_DUP_PAIRS),
    "ann_lsh_pairs": QuerySpec(V.q_ann_lsh_pairs, V.SQL_ANN_LSH_PAIRS),
    "embedding_centroids": QuerySpec(
        V.q_embedding_centroids, V.SQL_EMBEDDING_CENTROIDS
    ),
    # --- §2.9 streaming ---
    "stream_events_ingest": QuerySpec(
        S.q_stream_events_ingest, S.SQL_STREAM_EVENTS_INGEST
    ),
    "stream_windowed_counts": QuerySpec(
        S.q_stream_windowed_counts, S.SQL_STREAM_WINDOWED_COUNTS
    ),
    "stream_sessionize": QuerySpec(
        S.q_stream_sessionize, S.SQL_STREAM_SESSIONIZE
    ),
    "stream_dedup": QuerySpec(S.q_stream_dedup, S.SQL_STREAM_DEDUP),
}

# Rotation ledger: entries that left the driver-graded 50 to make room
# for new operator families. Round 10 demoted eight near-duplicate
# relational one-liners (for the corpus-pipeline tranche); round 11
# demoted topk (its TakeOrderedAndProject shape rides
# rank_topn_per_group and sample_exact_k), range_join_binned (overlaps
# asof_join's range semantics), vocab_topk (top-words overlaps
# heavy_hitters + tfidf_topterms), and knn_ivf (its fit is
# embedding_centroids, its scan knn_cosine) — for the repetition /
# stratified-sampling / funnel / crawl-schedule tranche. Every demoted
# entry keeps its full DuckDB oracle and is replayed value-exactly by
# pytest (tests/test_catalog_rotation.py), so no op-id loses a
# correctness check — COVERAGE.md maps each demoted entry's op-ids to
# the surviving driver entries that still carry them. bench.py resolves
# HEADLINE names against CATALOG | DEMOTED so the benchmark set (and
# warm_total's round-over-round comparability) is unchanged by rotation.
DEMOTED: dict[str, QuerySpec] = {
    # --- round 14: multimodal_profile made room for
    # image_near_dup_pairs. Its payload surface was TEXT bytes profiled
    # as opaque media (sha256/byte-length/seeded dims); the promoted
    # entry drives the strictly stronger path — real BMP and PNG
    # containers through the same sniff_image front end the profile
    # uses, plus the pixel decoders, the dHash and the banded pair
    # engine — and the header-stat shapes stay pinned by the rotation
    # replay below and the pdf_roundtrip classify/roundtrip row ---
    "multimodal_profile": QuerySpec(
        X.q_multimodal_profile, X.SQL_MULTIMODAL_PROFILE
    ),
    # --- round 13: demoted for the pdf_roundtrip / url_dedup tranche.
    # dates_coverage's distinct-sorted / groupby-having / sort-asc
    # shapes all ride scalar_summary + grouping_multi (and the replay
    # below); dedup_exact's fingerprint groupBy is subsumed by
    # dup_clusters' exact stage and the corpus_report attrition row ---
    "dates_coverage": QuerySpec(R.q_dates_coverage, R.SQL_DATES_COVERAGE),
    "dedup_exact": QuerySpec(X.q_dedup_exact, X.SQL_DEDUP_EXACT),
    # set_membership_ops made room for robots_gate: a beyond-reference
    # §2.7 extra whose semi/anti shapes also ride dim_get_or_create's
    # left_anti and the index tombstone anti-joins; grouping sets stay
    # graded via grouping_multi
    "set_membership_ops": QuerySpec(
        R.q_set_membership_ops, R.SQL_SET_MEMBERSHIP_OPS
    ),
    # --- round 12: demoted for the approx-sketch / epoch-shuffle /
    # compression tranche. redact_text's regex battery rides the
    # quality family (gopher_quality_kept + corpus_report + the
    # rotation replay); doc_chunks' fixed-window chunking is
    # pack_token_chunks' simpler sibling; batch sessionize's
    # gap-session semantics stay graded through stream_sessionize
    # (whose oracle IS the batch definition); mixture_sample's
    # temperature quota shares the md5 keyed-permutation machinery now
    # graded via sample_stratified + epoch_shuffle ---
    "redact_text": QuerySpec(R.q_redact_text, R.SQL_REDACT_TEXT),
    "doc_chunks": QuerySpec(X.q_doc_chunks, X.SQL_DOC_CHUNKS),
    "sessionize": QuerySpec(R.q_sessionize, R.SQL_SESSIONIZE),
    "mixture_sample": QuerySpec(X.q_mixture_sample, X.SQL_MIXTURE_SAMPLE),
    # --- round 11 ---
    "topk": QuerySpec(R.q_topk, R.SQL_TOPK),
    "range_join_binned": QuerySpec(
        R.q_range_join_binned, R.SQL_RANGE_JOIN_BINNED
    ),
    "vocab_topk": QuerySpec(X.q_vocab_topk, X.SQL_VOCAB_TOPK),
    "knn_ivf": QuerySpec(V.q_knn_ivf, V.SQL_KNN_IVF),
    # --- round 10 ---
    "pivot_status": QuerySpec(R.q_pivot_status, R.SQL_PIVOT_STATUS),
    "gap_fill": QuerySpec(R.q_gap_fill, R.SQL_GAP_FILL),
    "window_value_family": QuerySpec(
        R.q_window_value_family, R.SQL_WINDOW_VALUE_FAMILY
    ),
    "sort_limit": QuerySpec(R.q_sort_limit, R.SQL_SORT_LIMIT),
    "div_guard_variants": QuerySpec(
        R.q_div_guard_variants, R.SQL_DIV_GUARD_VARIANTS
    ),
    "json_extract": QuerySpec(R.q_json_extract, R.SQL_JSON_EXTRACT),
    "scalar_subquery": QuerySpec(R.q_scalar_subquery, R.SQL_SCALAR_SUBQUERY),
    "date_format_rollup": QuerySpec(
        R.q_date_format_rollup, R.SQL_DATE_FORMAT_ROLLUP
    ),
}

# explicit raise (not assert — stripped under python -O): the grading
# driver truncates to the first 50 entries, so a 51st would silently
# get no correctness row.
if len(CATALOG) != 50:
    raise RuntimeError(f"driver grades first 50 entries; got {len(CATALOG)}")
if set(CATALOG) & set(DEMOTED):
    raise RuntimeError("a query must not be both graded and demoted")
