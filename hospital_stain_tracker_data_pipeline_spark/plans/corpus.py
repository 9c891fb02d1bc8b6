"""Driver-graded corpus-pipeline plans (round-10 catalog rotation).

These eight operators carried pytest-level DuckDB oracles from the day
they landed (the grading driver caps the catalog at 50 entries, so they
were held out — COVERAGE.md's cap-exclusion paragraph); round 10 rotates
them INTO the driver catalog in place of eight near-duplicate relational
one-liners (now ``plans.catalog.DEMOTED``, still pytest-replayed). Each
``q_*`` here wraps the real operator from ``operators/`` — the driver
row grades the production code path, not a reimplementation.

Cross-engine determinism notes (the tricks that keep the value-hash
green, see the module docstrings they came from):

- md5 for every permutation/ranking key a DuckDB oracle must replay;
- exact integer arithmetic wherever a float sum would be partition-
  order-sensitive (heavy-hitter thresholds via ``count*100 >= N``,
  ``corpus_report``'s mean_quality over ×10⁴ LONGs);
- ``round(·, 6)`` on scores BEFORE any ordering that feeds a LIMIT;
- RRF fuses exactly two lists, so each fused score is one two-double
  add — bitwise commutative, no ordering concern at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, quality_score
from ..operators.dedup import dedup_spans, dedup_substrings
from ..operators.packing import pack_token_chunks
from ..operators.quality import corpus_report, filter_gopher_quality
from ..operators.retrieval import (
    bm25_topk,
    build_bm25_index,
    reciprocal_rank_fusion,
)
from ..operators.sketch import heavy_hitters
from ..sources.tables import load_fixture_table

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def q_pack_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (`operators/packing.py::
    pack_token_chunks`): shard by doc_id, per-shard token cumsum spans,
    overlap each span with fixed 256-token chunk windows. One window
    cumsum per shard + arithmetic — no per-token explode; the 100 TB
    pre-batching shape."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    return pack_token_chunks(docs, budget=256, n_shards=8).orderBy(
        "shard", "chunk_id", "doc_id"
    )


SQL_PACK_TOKEN_CHUNKS = r"""
WITH base AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
  FROM documents
), nonempty AS (
  SELECT * FROM base WHERE n_tok > 0
), spans AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER w - n_tok AS tok_start,
         SUM(n_tok) OVER w AS tok_end
  FROM nonempty WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
), chunks AS (
  SELECT shard, doc_id, n_tok, tok_start,
         unnest(generate_series(CAST(tok_start // 256 AS BIGINT),
                                CAST((tok_end - 1) // 256 AS BIGINT)))
           AS chunk_id
  FROM spans
)
SELECT CAST(shard AS INT) AS shard, CAST(chunk_id AS BIGINT) AS chunk_id,
       doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(GREATEST(0, tok_start - chunk_id * 256) AS BIGINT)
         AS chunk_start,
       CAST(LEAST(tok_start + n_tok, (chunk_id + 1) * 256)
            - GREATEST(tok_start, chunk_id * 256) AS BIGINT)
         AS chunk_tokens
FROM chunks
ORDER BY shard, chunk_id, doc_id
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (`operators/sketch.py::heavy_hitters`)
    over the corpus word stream at phi=1%: per-partition bounded-memory
    candidate generation inside mapInPandas + an exact broadcast-probed
    recount — complete and exact by the mergeable-summaries pigeonhole
    bound, never a full-vocabulary shuffle. The threshold is exact
    rational arithmetic (ceil(phi·N) via integer compare), mirrored in
    the oracle as ``count·100 >= N``."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    return heavy_hitters(words, "w", phi=0.01)


SQL_HEAVY_HITTERS = r"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents
), nonblank AS (SELECT w FROM words WHERE w <> ''),
tot AS (SELECT count(*) AS n_total FROM nonblank)
SELECT w AS item, count(*) AS n
FROM nonblank, tot
GROUP BY w, n_total
HAVING count(*) * 100 >= n_total
ORDER BY n DESC, item
"""


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global span dedup (`operators/dedup.py::
    dedup_spans`): split every doc into spans, keep only the globally
    FIRST occurrence of each distinct span (lowest (doc_id, pos) via an
    md5-fingerprint window), reassemble in order. The fixture corpus
    has no newlines, so the span unit here is the word (delim=' ') with
    ``min_chars=4`` — short spans are never treated as duplicates,
    exercising the guard. n_spans cast to long for the cross-engine
    schema (Spark ``size`` is int, DuckDB ``len`` is bigint)."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    return (
        dedup_spans(docs, delim=" ", min_chars=4)
        .withColumn("n_spans", F.col("n_spans").cast("long"))
        .orderBy("doc_id")
    )


SQL_DEDUP_SPANS = r"""
WITH spans AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS span,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
), keyed AS (
  SELECT doc_id, pos, span,
         CASE WHEN length(trim(span)) < 4
              THEN 'u' || '#' || doc_id || '#' || pos
              ELSE md5(trim(span)) END AS fp
  FROM spans
), kept AS (
  SELECT doc_id, pos, span,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rk
  FROM keyed
), assembled AS (
  SELECT doc_id, COUNT(*) AS n_spans_kept,
         string_agg(span, ' ' ORDER BY pos) AS text_deduped
  FROM kept WHERE rk = 1 GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.text_deduped, '') AS text_deduped,
       len(string_split(d.text, ' ')) AS n_spans,
       COALESCE(a.n_spans_kept, 0) AS n_spans_kept
FROM documents d LEFT JOIN assembled a USING (doc_id)
ORDER BY doc_id
"""


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al exact duplicated-substring removal (`operators/
    dedup.py::dedup_substrings`): any 6-token window occurring more
    than once anywhere in the corpus survives only at its globally
    first occurrence; overlapping duplicate windows merge into one cut
    interval; docs reassemble from the surviving token positions."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    return dedup_substrings(docs, min_tokens=6).orderBy("doc_id")


SQL_DEDUP_SUBSTRINGS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(g['i'] - 1 AS BIGINT) AS pos,
         md5(array_to_string(t[g['i']:g['i']+5], ' ')) AS key
  FROM (
    SELECT doc_id, t,
           unnest(list_transform(range(1, len(t) - 6 + 2),
                                 i -> {'i': i})) AS g
    FROM toks WHERE len(t) >= 6
  )
),
marked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
  FROM grams
),
cut AS (
  SELECT doc_id, pos AS s, pos + 6 AS e FROM marked WHERE rn > 1
),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR s > max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) THEN 1 ELSE 0 END AS new
  FROM cut
),
grouped AS (
  SELECT doc_id, s, e,
         sum(new) OVER (
           PARTITION BY doc_id ORDER BY s, e
           ROWS UNBOUNDED PRECEDING
         ) AS grp
  FROM flagged
),
merged AS (
  SELECT doc_id, grp, min(s) AS s, max(e) AS e
  FROM grouped GROUP BY doc_id, grp
),
covered AS (
  SELECT doc_id, CAST(g['i'] AS BIGINT) AS idx
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(s, e), i -> {'i': i})) AS g
    FROM merged
  )
),
tok_idx AS (
  SELECT doc_id, CAST(g['i'] - 1 AS BIGINT) AS idx, t[g['i']] AS tok
  FROM (
    SELECT doc_id, t,
           unnest(list_transform(range(1, len(t) + 1),
                                 i -> {'i': i})) AS g
    FROM toks
  )
),
kept AS (
  SELECT k.doc_id, k.idx, k.tok
  FROM tok_idx k
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c
    WHERE c.doc_id = k.doc_id AND c.idx = k.idx
  )
),
reassembled AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY idx) AS text_deduped,
         count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - coalesce(r.kept_n, 0) AS BIGINT)
         AS n_tokens_removed
FROM toks t LEFT JOIN reassembled r USING (doc_id)
ORDER BY t.doc_id
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card (`operators/quality.py::corpus_report`):
    doc/blank counts, token mass + exact interpolated percentiles,
    order-invariant mean quality (×10⁴ LONG sum), exact-dup rate via
    the 64-bit normalized fingerprint — ONE projection + ONE aggregate
    over the corpus."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    return corpus_report(docs)


SQL_CORPUS_REPORT = rf"""
WITH per AS (
  SELECT
    CASE WHEN trim(coalesce(text, '')) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS nt,
    CASE WHEN trim(coalesce(text, '')) = '' THEN NULL
         ELSE round(0.5 * least(1.0,
             len(string_split_regex(trim(text), '\s+')) / 100.0)
           + 0.5 * (1.0 -
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t IN ({_STOP_SQL}))) * 1.0
             / len(string_split_regex(trim(text), '\s+'))), 4) END AS q,
    substring(md5(regexp_replace(lower(trim(coalesce(text, ''))),
                                 '\s+', ' ', 'g')), 1, 16) AS fp,
    trim(coalesce(text, '')) = '' AS blank
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN blank THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       round(avg(nt), 6) AS mean_tokens,
       round(quantile_cont(nt, 0.5), 4) AS p50_tokens,
       round(quantile_cont(nt, 0.9), 4) AS p90_tokens,
       round(quantile_cont(nt, 0.99), 4) AS p99_tokens,
       CAST(max(nt) AS BIGINT) AS max_tokens,
       round(CAST(sum(CAST(round(q * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 / CAST(count(q) AS DOUBLE), 6) AS mean_quality,
       round(1.0 - count(DISTINCT fp) * 1.0 / count(*), 6)
         AS exact_dup_rate
FROM per
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-25 (`operators/retrieval.py::build_bm25_index` +
    ``bm25_topk``): one-scan postings/df/doc-len index, query terms
    broadcast into the postings equi-join (no scan of non-matching
    postings), one partial-agg groupBy(doc), TakeOrdered top-k. Scores
    round(·, 6) before the ordering."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    idx = build_bm25_index(docs)
    return bm25_topk(idx, "the data of and system", k=25)


SQL_BM25_TOPK = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
post AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
  GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
q(term) AS (VALUES ('and'), ('data'), ('of'), ('system'), ('the')),
scored AS (
  SELECT p.doc_id,
         round(sum(
           ln(1 + (n - df + 0.5) / (df + 0.5))
           * tf * 2.2
           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
         ), 6) AS score
  FROM post p
  JOIN q USING (term)
  JOIN dfs USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 25
"""


def q_gopher_quality_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 quality-rule kept set (`operators/quality.py::
    filter_gopher_quality`): every Rae-et-al §A1.1 signal as a pure
    zero-exchange Column, one combined scalar filter. ``min_stopwords``
    is relaxed to 0 because the synthetic fixture vocabulary carries at
    most one distinct Gopher stopword per doc (the published ≥2 rule
    would keep nothing — the signal replay still computes it)."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    return (
        filter_gopher_quality(docs, min_stopwords=0)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


SQL_GOPHER_QUALITY_KEPT = r"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars, text,
         list_filter(string_split_regex(text, '\s+'),
                     w -> w <> '') AS words,
         list_filter(string_split(text, chr(10)),
                     l -> trim(l) <> '') AS lines
  FROM documents
), sig AS (
  SELECT doc_id, lang, source, n_chars,
    len(words) AS n_words,
    CASE WHEN len(words) > 0 THEN round(
      list_sum(list_transform(words, w -> length(w))) * 1.0
        / len(words), 6) END AS mean_word_len,
    CASE WHEN len(words) > 0 THEN round(
      len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
        * 1.0 / len(words), 6) END AS frac_alpha_words,
    CASE WHEN len(words) > 0 THEN round(
      ((length(text) - length(replace(text, '#', '')))
       + len(regexp_extract_all(text, '(\.\.\.|…)')))
        * 1.0 / len(words), 6) END AS symbol_word_ratio,
    CASE WHEN len(lines) > 0 THEN round(
      len(list_filter(lines,
          l -> regexp_matches(trim(l), '^[-*•‣▪●·]')))
        * 1.0 / len(lines), 6) END AS frac_bullet_lines,
    CASE WHEN len(lines) > 0 THEN round(
      len(list_filter(lines,
          l -> regexp_matches(trim(l), '(\.\.\.|…)$')))
        * 1.0 / len(lines), 6) END AS frac_ellipsis_lines,
    contains(text, '{') AS has_curly_brace,
    contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum
  FROM base
)
SELECT doc_id, lang, source, n_chars
FROM sig
WHERE n_words BETWEEN 50 AND 100000
  AND mean_word_len BETWEEN 3.0 AND 10.0
  AND frac_alpha_words >= 0.8
  AND symbol_word_ratio <= 0.1
  AND (frac_bullet_lines IS NULL OR frac_bullet_lines <= 0.9)
  AND (frac_ellipsis_lines IS NULL OR frac_ellipsis_lines <= 0.3)
  AND NOT has_curly_brace
  AND NOT has_lorem_ipsum
ORDER BY doc_id
"""


def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion (`operators/retrieval.py::
    reciprocal_rank_fusion`, SIGIR-2009): fuse two deterministic
    rankings over the corpus — length-ranked top-25 (score = n_chars)
    and heuristic-quality-ranked top-25 — via rank-derived 1/(60+rank)
    contributions. Exactly two lists ⇒ each fused score is one
    two-double add (bitwise commutative), rounded to 6; ties break on
    doc_id everywhere, so the k=15 boundary is deterministic."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    by_len = (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(25)
        .select("doc_id", F.col("n_chars").cast("double").alias("score"))
    )
    by_quality = (
        docs.select("doc_id", quality_score(F.col("text")).alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(25)
    )
    return reciprocal_rank_fusion(
        [by_len, by_quality], score_cols=["score", "q"], k=15
    )


SQL_RRF_FUSE = rf"""
WITH by_len AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score
  FROM documents ORDER BY n_chars DESC, doc_id LIMIT 25
), qscore AS (
  SELECT doc_id,
         round(0.5 * least(1.0,
             len(string_split_regex(trim(text), '\s+')) / 100.0)
           + 0.5 * (1.0 -
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t IN ({_STOP_SQL}))) * 1.0
             / len(string_split_regex(trim(text), '\s+'))), 4) AS score
  FROM documents
), by_q AS (
  SELECT doc_id, score FROM qscore ORDER BY score DESC, doc_id LIMIT 25
), r1 AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM by_len
), r2 AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM by_q
), united AS (
  SELECT doc_id, 1.0 / (60 + rnk) AS c FROM r1
  UNION ALL
  SELECT doc_id, 1.0 / (60 + rnk) AS c FROM r2
)
SELECT doc_id, round(sum(c), 6) AS rrf_score
FROM united GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id LIMIT 15
"""


# ---------------------------------------------------------------------------
# round-11 rotation: repetition profile, stratified sampling, filter funnel
# ---------------------------------------------------------------------------


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition profile
    (`operators/repetition.py::doc_repetition_profile`): duplicate-line
    stats computed IN-ROW (zero shuffle) + repeated-n-gram character
    mass via explode → (doc, gram) partial count → per-doc aggregate —
    the MassiveText/FineWeb boilerplate signal, linear in corpus
    tokens. Promoted to the driver catalog in round 11 (previously the
    pytest DuckDB oracle in tests/test_repetition.py)."""
    from ..operators.repetition import doc_repetition_profile

    return doc_repetition_profile(
        load_fixture_table(spark, sf_dir, "documents"),
        top_ns=(2, 3),
        dup_ns=(5,),
    )


_GRAM_CTE = r"""
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= {n} THEN
      list_transform(range(1, len(t) - {m} + 1),
                     i -> array_to_string(t[i:i+{m}], ' '))
    ELSE [] END) AS g
  FROM toks
"""

SQL_REPETITION_PROFILE = r"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS t,
         string_split(text, chr(10)) AS lines
  FROM documents
), linestats AS (
  SELECT doc_id,
    CAST(len(lines) AS INT) AS n_lines,
    ROUND(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
          / len(lines), 6) AS dup_line_frac,
    ROUND(CASE WHEN list_sum(list_transform(lines, l -> length(l))) = 0
          THEN 0.0 ELSE
          CAST(list_sum(list_transform(lines, l -> length(l)))
               - list_sum(list_transform(list_distinct(lines),
                                         l -> length(l))) AS DOUBLE)
          / list_sum(list_transform(lines, l -> length(l))) END, 6)
      AS dup_line_char_frac
  FROM toks
), g2 AS ({g2}), g3 AS ({g3}), g5 AS ({g5}),
a2 AS (
  SELECT doc_id, ROUND(CAST(max(c * glen) AS DOUBLE) / sum(c * glen), 6)
           AS top_2gram_char_frac
  FROM (SELECT doc_id, g, count(*) AS c, length(g) AS glen
        FROM g2 GROUP BY doc_id, g) GROUP BY doc_id
), a3 AS (
  SELECT doc_id, ROUND(CAST(max(c * glen) AS DOUBLE) / sum(c * glen), 6)
           AS top_3gram_char_frac
  FROM (SELECT doc_id, g, count(*) AS c, length(g) AS glen
        FROM g3 GROUP BY doc_id, g) GROUP BY doc_id
), a5 AS (
  SELECT doc_id,
         ROUND(CAST(sum(CASE WHEN c > 1 THEN c * glen ELSE 0 END)
               AS DOUBLE) / sum(c * glen), 6) AS dup_5gram_char_frac
  FROM (SELECT doc_id, g, count(*) AS c, length(g) AS glen
        FROM g5 GROUP BY doc_id, g) GROUP BY doc_id
)
SELECT l.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       top_2gram_char_frac, top_3gram_char_frac, dup_5gram_char_frac
FROM linestats l
LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
LEFT JOIN a5 USING (doc_id)
""".format(
    g2=_GRAM_CTE.format(n=2, m=1),
    g3=_GRAM_CTE.format(n=3, m=2),
    g5=_GRAM_CTE.format(n=5, m=4),
)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum eval draw (`operators/mixture.py::
    sample_stratified`): 25 documents from EVERY source via the
    md5(seed:id) keyed-permutation window — deterministic, no binomial
    jitter, one stratum-keyed exchange. Promoted round 11 (previously
    the pytest DuckDB replay in tests/test_mixture.py)."""
    from ..operators.mixture import sample_stratified

    return sample_stratified(
        load_fixture_table(spark, sf_dir, "documents"),
        "source",
        k=25,
        seed=7,
    )


SQL_SAMPLE_STRATIFIED = r"""
WITH r AS (
  SELECT *, row_number() OVER (
    PARTITION BY source
    ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
  ) AS rk
  FROM documents
  WHERE doc_id IS NOT NULL
)
SELECT doc_id, text, lang, source, n_chars FROM r WHERE rk <= 25
"""


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning funnel census (`operators/packing.py::
    filter_funnel`): cumulative survivor counts for four ordered
    stages in ONE conditional-aggregation scan — the C4/RefinedWeb
    attrition report without N corpus passes. Promoted round 11."""
    from ..operators.packing import filter_funnel

    docs = load_fixture_table(spark, sf_dir, "documents")
    return filter_funnel(
        docs,
        [
            ("lang_en", F.col("lang") == "en"),
            ("min_chars", F.col("n_chars") >= 200),
            ("max_chars", F.col("n_chars") <= 2000),
            ("has_period", F.col("text").contains(".")),
        ],
    )


SQL_FILTER_FUNNEL = r"""
SELECT CAST(count(*) AS BIGINT) AS total,
  CAST(coalesce(sum(CASE WHEN lang = 'en'
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS after_lang_en,
  CAST(coalesce(sum(CASE WHEN lang = 'en' AND n_chars >= 200
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS after_min_chars,
  CAST(coalesce(sum(CASE WHEN lang = 'en' AND n_chars >= 200
    AND n_chars <= 2000 THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS after_max_chars,
  CAST(coalesce(sum(CASE WHEN lang = 'en' AND n_chars >= 200
    AND n_chars <= 2000 AND contains(text, '.')
    THEN 1 ELSE 0 END), 0) AS BIGINT) AS after_has_period
FROM documents
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch permutation (`operators/
    packing.py::epoch_shuffle`, rotated IN round 12): every document
    keyed by the first 60 bits of ``md5(seed:id)`` as a LONG and
    globally range-sorted on it. The driver compares sorted rows, so
    the graded artifact is the KEY ITSELF — the oracle recomputes the
    exact 60-bit fold per id in DuckDB, pinning that the permutation
    is the cross-engine-replayable function the mid-epoch-resume
    contract promises (same seed ⇒ same order on any engine), not an
    engine-private hash."""
    from ..operators.packing import epoch_shuffle

    docs = load_fixture_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    return epoch_shuffle(docs, seed=7).select(
        "doc_id", F.col("_order").alias("shuffle_key")
    )


SQL_EPOCH_SHUFFLE = r"""
SELECT doc_id,
       CAST(CONCAT('0x', substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS shuffle_key
FROM documents
WHERE doc_id IS NOT NULL
"""


def q_compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality signal census (`operators/quality.py::
    compression_signals`, rotated IN round 12): the zlib ratio runs
    per document in one Arrow batch pass, then a per-source rollup
    grades its CONTRACT — ``n_ratio_null`` must equal the blank/NULL
    doc count exactly (the documented NULL-for-empty rule) and every
    non-blank doc must carry a strictly positive ratio. DEFLATE output
    is engine-private (DuckDB has no zlib), so the ratio VALUES stay
    pinned by the exact pure-python replay in tests/test_quality.py;
    the null-accounting and positivity contract is engine-independent
    and hash-graded here."""
    from ..operators.quality import compression_signals

    docs = load_fixture_table(spark, sf_dir, "documents")
    return (
        compression_signals(docs)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("zlib_ratio").isNull(), 1))
            .cast("long")
            .alias("n_ratio_null"),
            F.count(F.when(F.col("zlib_ratio") > 0, 1))
            .cast("long")
            .alias("n_ratio_positive"),
        )
        .orderBy("source")
    )


SQL_COMPRESSION_SIGNALS = r"""
SELECT source, COUNT(*) AS n_docs,
       CAST(coalesce(sum(CASE WHEN text IS NULL OR text = ''
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ratio_null,
       CAST(coalesce(sum(CASE WHEN text IS NOT NULL AND text <> ''
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ratio_positive
FROM documents GROUP BY source ORDER BY source
"""
