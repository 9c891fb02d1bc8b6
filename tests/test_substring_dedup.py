"""Exact duplicated-substring removal (Lee et al. 2022 style):
first-occurrence-wins goldens, overlapping-window merge into whole
passages, full DuckDB cross-engine replay on the fixture corpus, and
partitioning determinism."""

from __future__ import annotations

import duckdb
import pytest

from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
    dedup_substrings,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def test_substring_dedup_golden_first_occurrence_wins(spark):
    shared = "one two three four five six seven eight nine ten"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words {shared} closing remark"),
            (2, f"другое start {shared} tail bits here"),
            (3, "completely unrelated text with no repeated passage at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in dedup_substrings(docs, min_tokens=8).collect()
    }
    # doc 1 is the global first occurrence: untouched
    assert got[1]["n_tokens_removed"] == 0
    assert got[1]["text_deduped"] == f"intro words {shared} closing remark"
    # doc 2: the three overlapping 8-grams of the 10-token passage
    # merge into ONE removed span covering all 10 tokens
    assert got[2]["n_tokens_removed"] == 10
    assert got[2]["text_deduped"] == "другое start tail bits here"
    assert got[3]["n_tokens_removed"] == 0


def test_substring_dedup_doc_reduced_to_empty(spark):
    text = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in dedup_substrings(docs, min_tokens=8).collect()
    }
    assert got[1]["text_deduped"] == text
    assert got[2]["text_deduped"] == ""
    assert got[2]["n_tokens_removed"] == 8
    with pytest.raises(ValueError):
        dedup_substrings(docs, min_tokens=0)


def test_substring_dedup_matches_duckdb_oracle(spark, sf_dir):
    """Full replay: windows, md5 keys, first-occurrence ranking,
    interval merge, reassembly — every output cell must match."""
    L = 6
    docs = load_fixture_table(spark, sf_dir, "documents")
    got = sorted(
        tuple(r) for r in dedup_substrings(docs, min_tokens=L).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS t
          FROM '{sf_dir}/documents.parquet'
        ),
        grams AS (
          SELECT doc_id, CAST(g['i'] - 1 AS BIGINT) AS pos,
                 md5(array_to_string(t[g['i']:g['i']+{L - 1}], ' ')) AS key
          FROM (
            SELECT doc_id, t,
                   unnest(list_transform(range(1, len(t) - {L} + 2),
                                         i -> {{'i': i}})) AS g
            FROM toks WHERE len(t) >= {L}
          )
        ),
        marked AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY key ORDER BY doc_id, pos)
                   AS rn
          FROM grams
        ),
        cut AS (
          SELECT doc_id, pos AS s, pos + {L} AS e FROM marked WHERE rn > 1
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
                   unnest(list_transform(range(s, e), i -> {{'i': i}})) AS g
            FROM merged
          )
        ),
        tok_idx AS (
          SELECT doc_id, CAST(g['i'] - 1 AS BIGINT) AS idx, t[g['i']] AS tok
          FROM (
            SELECT doc_id, t,
                   unnest(list_transform(range(1, len(t) + 1),
                                         i -> {{'i': i}})) AS g
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
        """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_substring_dedup_partitioning_invariant(spark):
    shared = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, f"doc {i} says {shared} and more m{i}") for i in range(20)],
        "doc_id long, text string",
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    a = key(dedup_substrings(docs, min_tokens=10))
    b = key(dedup_substrings(docs.repartition(7), min_tokens=10))
    assert a == b
    # exactly one doc (the lowest id) keeps the shared passage
    keepers = [r for r in a if "w0 w1" in r[1]]
    assert len(keepers) == 1 and keepers[0][0] == 0
