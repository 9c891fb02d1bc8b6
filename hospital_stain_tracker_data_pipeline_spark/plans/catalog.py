"""The query catalog: name → QuerySpec(fn, oracle_sql).

Backs ``__spark_entry__.queries()`` / ``oracle_sql()``. ``oracle_sql``
is None for genuinely non-SQL-expressible entries (approximate LSH
candidate generation, streaming) — the driver records a rows-only check
for those (SURVEY.md §5.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from . import relational as R
from . import text as X
from . import vectors as V
from . import streaming_plan as S


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: Optional[str]


CATALOG: dict[str, QuerySpec] = {
    # --- §2.2 projections / filters / validation ---
    "filter_eq": QuerySpec(R.q_filter_eq, R.SQL_FILTER_EQ),
    "project_rename": QuerySpec(R.q_project_rename, R.SQL_PROJECT_RENAME),
    "validate_rejects": QuerySpec(R.q_validate_rejects, R.SQL_VALIDATE_REJECTS),
    # --- §2.3 joins ---
    "dim_join": QuerySpec(R.q_dim_join, R.SQL_DIM_JOIN),
    "dim_get_or_create": QuerySpec(R.q_dim_get_or_create, R.SQL_DIM_GET_OR_CREATE),
    "upsert_merge": QuerySpec(R.q_upsert_merge, R.SQL_UPSERT_MERGE),
    "asof_join": QuerySpec(R.q_asof_join, R.SQL_ASOF_JOIN),
    "semi_anti_join": QuerySpec(R.q_semi_anti_join, R.SQL_SEMI_ANTI_JOIN),
    "pivot_status": QuerySpec(R.q_pivot_status, R.SQL_PIVOT_STATUS),
    # --- §2.4 aggregations ---
    "agg_max_date": QuerySpec(R.q_agg_max_date, R.SQL_AGG_MAX_DATE),
    "available_dates": QuerySpec(R.q_available_dates, R.SQL_AVAILABLE_DATES),
    "distinct_sorted": QuerySpec(R.q_distinct_sorted, R.SQL_DISTINCT_SORTED),
    "coverage_having": QuerySpec(R.q_coverage_having, R.SQL_COVERAGE_HAVING),
    "argmax_date": QuerySpec(R.q_argmax_date, R.SQL_ARGMAX_DATE),
    "agg_avg": QuerySpec(R.q_agg_avg, R.SQL_AGG_AVG),
    "count_filtered": QuerySpec(R.q_count_filtered, R.SQL_COUNT_FILTERED),
    "skew_salted_agg": QuerySpec(R.q_skew_salted_agg, R.SQL_SKEW_SALTED_AGG),
    "value_percentiles": QuerySpec(R.q_value_percentiles, R.SQL_VALUE_PERCENTILES),
    # --- §2.5 windows ---
    "window_lag_delta": QuerySpec(R.q_window_lag_delta, R.SQL_WINDOW_LAG_DELTA),
    "rolling_trend": QuerySpec(R.q_rolling_trend, R.SQL_ROLLING_TREND),
    "sessionize": QuerySpec(R.q_sessionize, R.SQL_SESSIONIZE),
    "rank_topn_per_group": QuerySpec(
        R.q_rank_topn_per_group, R.SQL_RANK_TOPN_PER_GROUP
    ),
    "gap_fill": QuerySpec(R.q_gap_fill, R.SQL_GAP_FILL),
    "window_value_family": QuerySpec(
        R.q_window_value_family, R.SQL_WINDOW_VALUE_FAMILY
    ),
    # --- §2.6 sorts / limits / top-k ---
    "sort_limit": QuerySpec(R.q_sort_limit, R.SQL_SORT_LIMIT),
    "topk": QuerySpec(R.q_topk, R.SQL_TOPK),
    "argmax_measure": QuerySpec(R.q_argmax_measure, R.SQL_ARGMAX_MEASURE),
    # --- §2.7 set ops / grouping sets ---
    "set_ops": QuerySpec(R.q_set_ops, R.SQL_SET_OPS),
    "priority_rollup": QuerySpec(R.q_priority_rollup, R.SQL_PRIORITY_ROLLUP),
    "cube_agg": QuerySpec(R.q_cube_agg, R.SQL_CUBE_AGG),
    "grouping_sets": QuerySpec(R.q_grouping_sets, R.SQL_GROUPING_SETS),
    "range_join_binned": QuerySpec(R.q_range_join_binned, R.SQL_RANGE_JOIN_BINNED),
    "running_total": QuerySpec(R.q_running_total, R.SQL_RUNNING_TOTAL),
    # --- §2.8 scalar functions ---
    "strain_formula": QuerySpec(R.q_strain_formula, R.SQL_STRAIN_FORMULA),
    "div_guard_variants": QuerySpec(R.q_div_guard_variants, R.SQL_DIV_GUARD_VARIANTS),
    "json_extract": QuerySpec(R.q_json_extract, R.SQL_JSON_EXTRACT),
    "scalar_subquery": QuerySpec(R.q_scalar_subquery, R.SQL_SCALAR_SUBQUERY),
    "date_format_rollup": QuerySpec(R.q_date_format_rollup, R.SQL_DATE_FORMAT_ROLLUP),
    # --- headline aggregations (bench) ---
    "pricing_summary": QuerySpec(R.q_pricing_summary, R.SQL_PRICING_SUMMARY),
    "top_unshipped": QuerySpec(R.q_top_unshipped, R.SQL_TOP_UNSHIPPED),
    # --- text analysis (Phase 4) ---
    "text_stats": QuerySpec(X.q_text_stats, X.SQL_TEXT_STATS),
    "text_quality": QuerySpec(X.q_text_quality, X.SQL_TEXT_QUALITY),
    "lang_id": QuerySpec(X.q_lang_id, X.SQL_LANG_ID),
    "fingerprint": QuerySpec(X.q_fingerprint, X.SQL_FINGERPRINT),
    "token_bpe": QuerySpec(X.q_token_bpe, X.SQL_TOKEN_BPE),
    "tfidf_topterms": QuerySpec(X.q_tfidf_topterms, X.SQL_TFIDF_TOPTERMS),
    "redact_text": QuerySpec(R.q_redact_text, R.SQL_REDACT_TEXT),
    # --- dedup family (Phase 4) ---
    "dedup_exact": QuerySpec(X.q_dedup_exact, X.SQL_DEDUP_EXACT),
    "dedup_jaccard_topk": QuerySpec(X.q_dedup_jaccard_topk, X.SQL_DEDUP_JACCARD_TOPK),
    "dedup_simhash": QuerySpec(X.q_dedup_simhash, X.SQL_DEDUP_SIMHASH),
    "dedup_minhash_lsh": QuerySpec(X.q_dedup_minhash_lsh, None),
    "dup_clusters": QuerySpec(X.q_dup_clusters, X.SQL_DUP_CLUSTERS),
    # --- training-data pipeline ops (Phase 4) ---
    "doc_chunks": QuerySpec(X.q_doc_chunks, X.SQL_DOC_CHUNKS),
    "train_test_split": QuerySpec(X.q_train_test_split, X.SQL_TRAIN_TEST_SPLIT),
    "vocab_topk": QuerySpec(X.q_vocab_topk, X.SQL_VOCAB_TOPK),
    "mixture_sample": QuerySpec(X.q_mixture_sample, X.SQL_MIXTURE_SAMPLE),
    # --- multimodal plumbing (Phase 4) ---
    "multimodal_meta": QuerySpec(X.q_multimodal_meta, X.SQL_MULTIMODAL_META),
    "multimodal_features": QuerySpec(X.q_multimodal_features, X.SQL_MULTIMODAL_FEATURES),
    # --- similarity search (Phase 4) ---
    "knn_cosine": QuerySpec(V.q_knn_cosine, V.SQL_KNN_COSINE),
    "embedding_dup_pairs": QuerySpec(V.q_embedding_dup_pairs, V.SQL_EMBEDDING_DUP_PAIRS),
    "ann_lsh_pairs": QuerySpec(V.q_ann_lsh_pairs, None),
    "embedding_centroids": QuerySpec(
        V.q_embedding_centroids, V.SQL_EMBEDDING_CENTROIDS
    ),
    "knn_ivf": QuerySpec(V.q_knn_ivf, None),
    # --- §2.9 streaming ---
    "stream_events_ingest": QuerySpec(S.q_stream_events_ingest, None),
    "stream_windowed_counts": QuerySpec(
        S.q_stream_windowed_counts, S.SQL_STREAM_WINDOWED_COUNTS
    ),
    "stream_sessionize": QuerySpec(S.q_stream_sessionize, None),
    "stream_dedup": QuerySpec(S.q_stream_dedup, S.SQL_STREAM_DEDUP),
}
