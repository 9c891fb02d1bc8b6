"""N-gram LM perplexity (CCNet-style quality stage): gram
construction, hand-computed add-k golden, smoothing properness,
min_count pruning semantics, unseen-context floor, the full DuckDB
cross-engine oracle over the fixture corpus, head/middle/tail
bucketing, and the broadcast-join plan shape of scoring."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.lm import (
    NgramLM,
    doc_ngrams,
    lm_tokens,
    perplexity_buckets,
    score_perplexity,
    train_ngram_lm,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def _toy(spark):
    return spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )


def test_lm_tokens_and_ngrams_golden(spark):
    docs = spark.createDataFrame(
        [(1, "  Hello   world "), (2, ""), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["t"], r["g2"], r["g1"], r["g3"])
        for r in docs.select(
            "doc_id",
            lm_tokens(F.col("text")).alias("t"),
            doc_ngrams(F.col("text"), 2).alias("g2"),
            doc_ngrams(F.col("text"), 1).alias("g1"),
            doc_ngrams(F.col("text"), 3).alias("g3"),
        ).collect()
    }
    t, g2, g1, g3 = rows[1]
    assert t == ["hello", "world"]
    assert [(g["ctx"], g["word"]) for g in g2] == [
        ("<s>", "hello"),
        ("hello", "world"),
    ]
    assert [(g["ctx"], g["word"]) for g in g1] == [("", "hello"), ("", "world")]
    assert [(g["ctx"], g["word"]) for g in g3] == [
        ("<s> <s>", "hello"),
        ("<s> hello", "world"),
    ]
    # empty doc: zero tokens, zero grams (not [""])
    assert rows[2] == ([], [], [], [])
    assert [(g["ctx"], g["word"]) for g in rows[3][1]] == [("<s>", "solo")]


def test_train_counts_and_vocab_golden(spark):
    lm = train_ngram_lm(_toy(spark), n=2, k=0.1)
    grams = {
        (r["ctx"], r["word"]): r["c_cw"] for r in lm.grams.collect()
    }
    ctxs = {r["ctx"]: r["c_ctx"] for r in lm.contexts.collect()}
    assert grams == {("<s>", "a"): 3, ("a", "b"): 2, ("a", "c"): 1}
    assert ctxs == {"<s>": 3, "a": 3}
    assert lm.vocab_size == 3
    assert lm.n == 2 and lm.k == 0.1


def test_perplexity_hand_computed_golden(spark):
    lm = train_ngram_lm(_toy(spark), n=2, k=0.1)
    got = {
        r["doc_id"]: r
        for r in score_perplexity(_toy(spark), lm, round_to=None).collect()
    }
    # denom adds k*(V+1) = 0.4
    p_a = 3.1 / 3.4
    p_b = 2.1 / 3.4
    p_c = 1.1 / 3.4
    anl1 = -(math.log(p_a) + math.log(p_b)) / 2
    anl3 = -(math.log(p_a) + math.log(p_c)) / 2
    assert got[1]["n_grams"] == 2
    assert got[1]["avg_neg_logp"] == pytest.approx(anl1, rel=1e-12)
    assert got[1]["perplexity"] == pytest.approx(math.exp(anl1), rel=1e-12)
    assert got[3]["avg_neg_logp"] == pytest.approx(anl3, rel=1e-12)
    # identical docs score identically
    assert got[2]["avg_neg_logp"] == got[1]["avg_neg_logp"]


def test_unseen_word_and_context_floors(spark):
    lm = train_ngram_lm(_toy(spark), n=2, k=0.1)
    probe = spark.createDataFrame([(10, "z z")], "doc_id long, text string")
    [r] = score_perplexity(probe, lm, round_to=None).collect()
    # (<s>, z): known ctx, unseen word -> k / (c_ctx + k(V+1))
    # (z, z): unseen ctx -> uniform 1/(V+1)
    anl = -(math.log(0.1 / 3.4) + math.log(1 / 4)) / 2
    assert r["n_grams"] == 2
    assert r["avg_neg_logp"] == pytest.approx(anl, rel=1e-12)


def test_empty_doc_scores_null_not_dropped(spark):
    lm = train_ngram_lm(_toy(spark), n=2, k=0.1)
    probe = spark.createDataFrame(
        [(10, "a b"), (11, "   "), (12, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in score_perplexity(probe, lm).collect()}
    assert set(got) == {10, 11, 12}
    for d in (11, 12):
        assert got[d]["n_grams"] == 0
        assert got[d]["avg_neg_logp"] is None
        assert got[d]["perplexity"] is None


def test_add_k_distribution_is_proper(spark):
    """For a known context, p over the V known words + the OOV bucket
    sums to exactly 1 (the smoothing is a true distribution, not a
    score hack); with min_count pruning the scored mass can only
    DROP (pruned grams fall to the floor), never exceed 1."""
    lm = train_ngram_lm(_toy(spark), n=2, k=0.1)
    V, k = lm.vocab_size, lm.k
    ctxs = {r["ctx"]: r["c_ctx"] for r in lm.contexts.collect()}
    grams = {(r["ctx"], r["word"]): r["c_cw"] for r in lm.grams.collect()}
    for ctx in ctxs:
        denom = ctxs[ctx] + k * (V + 1)
        mass = sum(
            (grams.get((ctx, w), 0) + k) / denom for w in ("a", "b", "c")
        ) + k / denom  # the OOV bucket
        assert mass == pytest.approx(1.0, rel=1e-12)


def test_min_count_prunes_grams_but_not_context_totals(spark):
    full = train_ngram_lm(_toy(spark), n=2, k=0.1)
    pruned = train_ngram_lm(_toy(spark), n=2, k=0.1, min_count=2)
    kept = {(r["ctx"], r["word"]) for r in pruned.grams.collect()}
    assert kept == {("<s>", "a"), ("a", "b")}  # (a, c) count 1 pruned
    # exact context totals survive pruning -> probabilities stay proper
    assert sorted(map(tuple, pruned.contexts.collect())) == sorted(
        map(tuple, full.contexts.collect())
    )
    # pruned gram scores strictly worse, untouched docs identical
    sf = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in score_perplexity(_toy(spark), full, round_to=None).collect()
    }
    sp = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in score_perplexity(_toy(spark), pruned, round_to=None).collect()
    }
    assert sp[1] == pytest.approx(sf[1], rel=1e-12)
    assert sp[3] > sf[3]


def test_perplexity_matches_duckdb_oracle(spark, sf_dir):
    """Full cross-engine replay on the fixture corpus (catalog is at
    its 50-entry driver cap, so the parity pin lives here): DuckDB
    re-derives tokenization, BOS-padded bigram construction, both
    count tables, V, and the add-k scoring; every doc's gram count
    must match exactly and the float scores to 1e-9 relative."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    lm = train_ngram_lm(docs, n=2, k=0.1)
    got = {
        r["doc_id"]: r
        for r in score_perplexity(docs, lm, round_to=None).collect()
    }
    oracle = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             t -> t <> '') AS t
          FROM '{sf_dir}/documents.parquet'
        ),
        padded AS (SELECT doc_id, list_prepend('<s>', t) AS p FROM toks),
        flat AS (
          SELECT doc_id, g['ctx'] AS ctx, g['word'] AS word
          FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(p)),
                          i -> {{'ctx': p[i], 'word': p[i+1]}})) AS g
            FROM padded
          )
        ),
        cw AS (SELECT ctx, word, count(*) AS c_cw FROM flat GROUP BY 1, 2),
        cc AS (SELECT ctx, count(*) AS c_ctx FROM flat GROUP BY 1),
        v AS (
          SELECT count(DISTINCT w) AS v
          FROM (SELECT unnest(t) AS w FROM toks) WHERE w <> '<s>'
        ),
        scored AS (
          SELECT f.doc_id,
                 ln((coalesce(c_cw, 0) + 0.1)
                    / (coalesce(c_ctx, 0) + 0.1 * (v + 1))) AS lp
          FROM flat f
          LEFT JOIN cw USING (ctx, word)
          LEFT JOIN cc USING (ctx)
          CROSS JOIN v
        )
        SELECT doc_id, count(lp) AS n_grams, -avg(lp) AS anl
        FROM scored GROUP BY 1
        """
    ).fetchall()
    assert oracle, "oracle returned no rows"
    oracle_ids = set()
    for doc_id, n_grams, anl in oracle:
        oracle_ids.add(doc_id)
        assert got[doc_id]["n_grams"] == n_grams
        assert got[doc_id]["avg_neg_logp"] == pytest.approx(anl, rel=1e-9)
    # docs absent from the oracle (zero tokens) must still be present
    # Spark-side with NULL scores
    for doc_id, r in got.items():
        if doc_id not in oracle_ids:
            assert r["n_grams"] == 0 and r["perplexity"] is None


def test_perplexity_buckets_fractions_and_null_policy(spark):
    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)] + [(11, None)],
        "doc_id long, perplexity double",
    )
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(
            scored, head_frac=0.2, tail_frac=0.3
        ).collect()
    }
    # 11 docs; NULL is always tail. Ranks are cume_dist over 11 rows.
    assert got[11] == "tail"
    # rank(doc i) = i/11: head = ranks <= 0.2 -> docs 1-2
    assert got[1] == "head" and got[2] == "head"
    assert got[3] == "middle"
    # tail = ranks > 0.7 -> docs 8, 9, 10 (+ the NULL)
    assert got[7] == "middle"
    assert got[8] == "tail" and got[10] == "tail"
    with pytest.raises(ValueError):
        perplexity_buckets(scored, head_frac=0.8, tail_frac=0.4)


def test_perplexity_buckets_grouped_by_lang(spark):
    scored = spark.createDataFrame(
        [(1, 5.0, "en"), (2, 1.0, "en"), (3, 9.0, "de"), (4, 2.0, "de")],
        "doc_id long, perplexity double, lang string",
    )
    got = {
        r["doc_id"]: (r["ppl_bucket"], r["ppl_rank"])
        for r in perplexity_buckets(
            scored, head_frac=0.5, tail_frac=0.5, by="lang"
        ).collect()
    }
    # each lang ranks independently: best half head, worst half tail
    assert got[2][0] == "head" and got[1][0] == "tail"
    assert got[4][0] == "head" and got[3][0] == "tail"


def test_score_plan_broadcasts_model_and_never_shuffles_corpus(spark):
    lm = train_ngram_lm(_toy(spark), n=2, k=0.1)
    plan = score_perplexity(_toy(spark), lm)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------------------
# Unicode normalization — the pre-fingerprint curation pass
# ---------------------------------------------------------------------------


def test_normalize_text_nfkc_goldens(spark):
    from hospital_stain_tracker_data_pipeline_spark.functions.text import (
        normalize_text_udf,
    )

    rows = [
        (1, "ﬁre"),        # ligature fi -> "fire"
        (2, "Ｆｕｌｌ１２３"),  # fullwidth -> "Full123"
        (3, "é"),     # combining acute -> precomposed é
        (4, None),
        (5, "plain"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", normalize_text_udf("NFKC")(F.col("t")).alias("n")
        ).collect()
    }
    assert got[1] == "fire"
    assert got[2] == "Full123"
    assert got[3] == "é"
    assert got[4] is None
    assert got[5] == "plain"
    with pytest.raises(ValueError, match="unknown normalization"):
        normalize_text_udf("NFX")


def test_normalize_text_nfc_matches_duckdb(spark, sf_dir):
    """Cross-engine pin for the one form DuckDB exposes
    (nfc_normalize): both engines must produce identical NFC text for
    the whole fixture corpus."""
    from hospital_stain_tracker_data_pipeline_spark.functions.text import (
        normalize_text_udf,
    )
    from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
        load_fixture_table,
    )

    docs = load_fixture_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", normalize_text_udf("NFC")(F.col("text")).alias("n")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, nfc_normalize(text) FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_contrastive_score_dsir_ranking(spark):
    """Train a target LM on domain A text and a general LM on mixed
    text: importance must rank an A-like doc above a B-like doc, agree
    with independently-computed per-model scores, and enforce the
    shared-n contract."""
    from hospital_stain_tracker_data_pipeline_spark.operators.lm import (
        contrastive_score,
    )

    dom_a = "alpha beta gamma " * 10
    dom_b = "rock paper scissors " * 10
    target = train_ngram_lm(
        spark.createDataFrame([(1, dom_a)], "doc_id long, text string"), n=2
    )
    general = train_ngram_lm(
        spark.createDataFrame(
            [(1, dom_a), (2, dom_b)], "doc_id long, text string"
        ),
        n=2,
    )
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma alpha beta"), (20, "rock paper scissors rock"),
         (30, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in contrastive_score(probe, target, general).collect()}
    assert got[10]["importance"] > got[20]["importance"]
    assert got[30]["importance"] is None and got[30]["n_grams"] == 0
    # cross-check against the standalone scorer per model
    t = {r["doc_id"]: r["avg_neg_logp"] for r in score_perplexity(probe, target).collect()}
    g = {r["doc_id"]: r["avg_neg_logp"] for r in score_perplexity(probe, general).collect()}
    for d in (10, 20):
        assert got[d]["target_anl"] == pytest.approx(t[d], abs=2e-4)
        assert got[d]["general_anl"] == pytest.approx(g[d], abs=2e-4)
        assert got[d]["importance"] == pytest.approx(g[d] - t[d], abs=4e-4)
    tri = train_ngram_lm(
        spark.createDataFrame([(1, dom_a)], "doc_id long, text string"), n=3
    )
    with pytest.raises(ValueError, match="disagree on n"):
        contrastive_score(probe, tri, general)


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below varied text; NULL/empty
    yield NULL; values replay exactly against the same stdlib zlib."""
    import zlib

    from hospital_stain_tracker_data_pipeline_spark.functions.text import (
        compression_ratio_udf,
    )

    rows = [
        (1, "spam " * 200),
        (2, " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", compression_ratio_udf()(F.col("text")).alias("cr")
        ).collect()
    }
    assert got[3] is None and got[4] is None
    assert got[1] < 0.1  # highly repetitive
    assert got[2] > got[1] * 3  # varied text compresses much worse
    for i, t in rows[:2]:
        b = t.encode()
        assert got[i] == pytest.approx(len(zlib.compress(b, 6)) / len(b))
    with pytest.raises(ValueError):
        compression_ratio_udf(level=0)


def test_contrastive_plan_broadcasts_all_model_tables(spark):
    """Scale shape of DSIR scoring: four broadcast joins (two tables
    per model) onto one exploded gram stream, no sort-merge join."""
    from hospital_stain_tracker_data_pipeline_spark.operators.lm import (
        contrastive_score,
    )

    t = train_ngram_lm(_toy(spark), n=2)
    g = train_ngram_lm(_toy(spark), n=2)
    plan = (
        contrastive_score(_toy(spark), t, g)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_ngram_lm_save_load_roundtrip(spark, sf_dir, tmp_path):
    """A persisted model must score identically to the in-memory one;
    a half-written artifact (no meta) fails loudly."""
    from hospital_stain_tracker_data_pipeline_spark.operators.lm import (
        load_ngram_lm,
        save_ngram_lm,
    )

    docs = load_fixture_table(spark, sf_dir, "documents")
    lm = train_ngram_lm(docs, n=2, k=0.1, min_count=2)
    path = str(tmp_path / "lm_art")
    save_ngram_lm(lm, path)
    back = load_ngram_lm(spark, path)
    assert (back.n, back.vocab_size, back.k) == (lm.n, lm.vocab_size, lm.k)
    a = {
        r["doc_id"]: (r["n_grams"], r["avg_neg_logp"])
        for r in score_perplexity(docs, lm).collect()
    }
    b = {
        r["doc_id"]: (r["n_grams"], r["avg_neg_logp"])
        for r in score_perplexity(docs, back).collect()
    }
    assert a == b
    with pytest.raises(Exception):
        load_ngram_lm(spark, str(tmp_path / "nope"))
