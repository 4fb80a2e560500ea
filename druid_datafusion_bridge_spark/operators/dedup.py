"""Distributed deduplication operators.

Design for 100 TB:
- exact dedup = one shuffle on a 128-bit fingerprint (high-cardinality,
  skew-free key);
- near-dup detection avoids the O(n^2) pair space: an inverted-index join
  on shingles (exact Jaccard) for corpus slices, MinHash+LSH band-bucket
  join for the full corpus. Both are explode/groupBy/join of built-ins —
  whole-stage-codegen'd, no Python in the hot path.
- all hashes are md5-derived (F.md5 -> 60-bit int), deterministic and
  engine-independent, so results are oracle-checkable and stable across
  Spark versions (unlike xxhash64 seeds or hashCode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import spread

# LSH layout: 16 minhash permutations = 4 bands x 4 rows.
# P(candidate | jaccard s) = 1 - (1 - s^4)^4  => s50 ~ 0.66.
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 4
MINHASH_SEEDS = MINHASH_BANDS * MINHASH_ROWS_PER_BAND


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash (first 15 hex chars of md5)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5 fingerprint -> (fp, keep_id, n_copies).

    Keeps the lowest id per content group. One hash-groupBy shuffle.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col).alias("_id"))
        .groupBy("fp")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def doc_word_ngrams(
    docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, g).

    Docs shorter than n tokens contribute no rows. Built with
    sequence/slice/transform — fully JVM-side.
    """
    t = F.split(F.col(text_col), " ")
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    return spread(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("g")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    Inverted-index self-join on shingles: only docs sharing at least one
    shingle ever meet, so cost tracks real overlap, not |docs|^2.
    Returns (doc_a, doc_b, shared, jaccard) with doc_a < doc_b.
    """
    grams = doc_word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    cnt = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "g")
    b = grams.select(F.col("doc_id").alias("doc_b"), "g")
    pairs = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        pairs.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select("doc_a", "doc_b", "shared", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    n: int = 5,
    seeds: int = MINHASH_SEEDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: (doc_id, sig array<long> of length `seeds`).

    h_s(gram) = md5_hash60(s || ':' || gram); sig[s] = min over grams.

    One row per (doc, gram) carrying the full hash vector; signatures
    fold element-wise (zip_with least) inside a single groupBy — one
    shuffle, no seeds-fold row blowup. At 100 TB this is the difference
    between shuffling |grams| rows and |grams| x seeds rows.
    """
    grams = doc_word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    hash_vec = F.transform(
        F.sequence(F.lit(0), F.lit(seeds - 1)),
        lambda s: md5_hash60(F.concat_ws(":", s, F.col("g"))),
    )
    per_gram = grams.select("doc_id", hash_vec.alias("hv"))
    max_sig = F.expr(
        f"array_repeat(CAST(9223372036854775807 AS BIGINT), {seeds})"
    )
    return per_gram.groupBy("doc_id").agg(
        F.aggregate(
            F.collect_list("hv"),
            max_sig,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
        ).alias("sig")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n: int = 5,
    bands: int = MINHASH_BANDS,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH near-dup candidates: docs equal on a whole band of minhashes.

    Band-key groupBy-join means cost is O(docs x bands) plus within-bucket
    pair expansion — the scale path for corpus-wide near-dedup.
    Returns distinct (doc_a, doc_b), doc_a < doc_b.
    """
    sig = minhash_signatures(
        docs, n=n, seeds=bands * rows_per_band, text_col=text_col, id_col=id_col
    )
    # Band keys sliced straight out of the signature array — one narrow
    # (doc, band, key) row per band, no per-seed explode or extra shuffle.
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.array_join(
            F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                lambda m: m.cast("string"),
            ),
            ",",
        ),
    )
    bands_df = sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )
    a = bands_df.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands_df.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
