"""Deduplication operators for training-data pipelines (SURVEY.md
Phase 4): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- Exact dedup is a hash groupBy on a fingerprint — one shuffle of
  (fingerprint, id), never the payload.
- Jaccard/MinHash/SimHash all avoid the O(n²) cross join: pairs are
  generated inside blocks (a blocking key, LSH band buckets, or SimHash
  prefix bands), so the shuffle is keyed by block and the quadratic
  blowup is bounded per block. At 100 TB you salt oversized blocks and
  cap per-block pair counts.
- Hashes are md5-derived (cross-engine stable) rather than murmur3, so
  results are reproducible anywhere, not just inside one Spark build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint64_hex, normalized_text, word_shingles


def _hex_to_long(hex16: Column) -> Column:
    """First 15 hex chars → non-negative bigint (fits in 60 bits).
    conv() returns a string; cast explicitly."""
    return F.conv(F.substring(hex16, 1, 15), 16, 10).cast("long")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup over normalized text: one row per fingerprint with
    the lowest id kept (deterministic winner) and the duplicate count."""
    return (
        df.select(
            fingerprint64_hex(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    return df.select(
        F.col(id_col), word_shingles(F.col(text_col), k).alias("shingles")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """All within-block pairs with their exact shingle-set Jaccard.

    The block join bounds the pair count (lang/source/LSH bucket at
    scale). Jaccard = |∩| / (|A|+|B|-|∩|), integer-derived → double,
    bit-identical across engines."""
    sets = df.select(
        F.col(id_col),
        F.col(block_col).alias("_block"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    )
    a = sets.select(
        F.col("_block"),
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = sets.select(
        F.col("_block"),
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_b"),
    )
    pairs = a.join(b, "_block").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return pairs.select(
        "id_a",
        "id_b",
        (inter / union).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """num_hashes-wide MinHash signature: per hash i, min over shingles
    of md5(i || shingle) as a 60-bit int. md5-based so the signature is
    engine-independent; transform/array_min keep it JVM-side."""
    # Single-parameter lambdas only: PySpark binds a 2nd parameter to
    # the array index, so default-arg capture would be silently wrong.
    def _min_hash(i: int):
        prefix = f"{i}|"
        return F.array_min(
            F.transform(
                shingles,
                lambda s: _hex_to_long(F.md5(F.concat(F.lit(prefix), s))),
            )
        )

    return F.array(*[_min_hash(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: equal band-slices of the MinHash signature
    → same bucket → pair. rows = (id_a, id_b, n_bands_matched).

    Shuffle is keyed by (band, bucket-hash): near-dups collide in ≥1
    band w.h.p.; everything else never pairs up — this is what replaces
    the O(n²) similarity join at scale."""
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col),
        minhash_signature(word_shingles(F.col(text_col), k), num_hashes).alias("sig"),
    )
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a")
    )
    b = banded.select(
        F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands_matched"))
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Candidates verified with exact Jaccard ≥ threshold (classic
    candidate-gen + verify): LSH recall is probabilistic, the verify
    step makes the OUTPUT exact-above-threshold (only pairs LSH missed
    entirely can be absent)."""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, k)
    sets = shingle_sets(df, text_col, id_col, k)
    a = sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return joined.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: Column, nbits: int = 32) -> Column:
    """SimHash over word tokens: per token take nbits from md5, sum
    ±1 votes per bit, sign → bit. Returns a bigint (nbits wide).

    Entirely higher-order functions (transform/aggregate/filter) — no
    UDF, so the fingerprint computes inside codegen next to the scan."""
    toks = F.split(normalized_text(text), " ")
    hashes = F.transform(toks, lambda t: _hex_to_long(F.md5(t)))

    # aggregate's merge lambda must take exactly (acc, x) — a third
    # parameter (even defaulted) breaks PySpark's binding.
    def _votes(j: int):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_exprs = []
    for j in range(nbits):
        votes = _votes(j)
        bit_exprs.append(
            F.when(votes > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def simhash_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbits: int = 32,
    max_hamming: int = 8,
) -> DataFrame:
    """Within-block pairs with SimHash Hamming distance ≤ max_hamming.
    (At scale, block by SimHash prefix bands instead of a data column —
    same mechanics, pigeonhole guarantees recall for small distances.)"""
    h = df.select(
        F.col(id_col),
        F.col(block_col).alias("_block"),
        simhash64(F.col(text_col), nbits).alias("simhash"),
    )
    a = h.select("_block", F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"))
    b = h.select("_block", F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"))
    return (
        a.join(b, "_block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
