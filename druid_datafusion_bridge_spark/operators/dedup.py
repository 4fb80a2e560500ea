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
# Hot-bucket bound for LSH pair expansion (see lsh_candidate_pairs);
# module-level so query oracles can mirror the cap semantics exactly.
LSH_MAX_BUCKET = 2000
# Document-frequency cut for the exact-Jaccard inverted index (see
# ngram_jaccard_pairs): shingles present in more than this many docs are
# dropped before the self-join. Module-level so query oracles mirror the
# cut exactly.
NGRAM_MAX_DF = 1000

# Universal-hash family for the minhash permutations: one md5 base hash
# per gram, then per-seed affine maps (a*hi + b*lo + s) mod (2^61 - 1)
# over the base hash's 30-bit halves — the standard single-base-hash
# minhash construction. Products stay < 2^61 (a,b < 2^31, hi,lo < 2^30),
# so the arithmetic is exact in int64 for Spark AND the DuckDB oracle.
MINHASH_PRIME = (1 << 61) - 1
_M31 = 2147483647


def seed_coeffs(seeds: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs < 2^31 per seed (Knuth/xxhash odd
    constants), shared by the Spark operator and the SQL oracle."""
    return [
        ((1 + s * 2654435761) % _M31, (7 + s * 2246822519) % _M31)
        for s in range(seeds)
    ]


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
    max_df: int = NGRAM_MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    Inverted-index self-join on shingles, with a document-frequency cut:
    shingles appearing in more than ``max_df`` docs are anti-joined out
    BEFORE the self-join. Without the cut, one boilerplate shingle shared
    by millions of docs makes a single posting list's pair expansion
    quadratic (the same failure mode lsh_candidate_pairs bounds with
    LSH_MAX_BUCKET); with it, per-shingle pair volume is bounded by
    max_df^2/2. Per-doc gram counts (the Jaccard denominator) still use
    the FULL gram set, so a dropped shingle can only LOWER a pair's
    estimated Jaccard — the cut produces no false pairs, only possible
    misses among docs whose entire overlap is boilerplate.
    Returns (doc_a, doc_b, shared, jaccard) with doc_a < doc_b.
    """
    grams = doc_word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    cnt = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    # df-cut: the hot set (df > max_df) is at most |gram rows|/max_df
    # entries — small, so AQE turns the anti-join into a broadcast.
    hot = (
        grams.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("g")
    )
    kept = grams.join(hot, "g", "left_anti")
    a = kept.select(F.col("doc_id").alias("doc_a"), "g")
    b = kept.select(F.col("doc_id").alias("doc_b"), "g")
    pairs = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    # NO broadcast hint on the denominator joins: cnt has one row PER
    # DOCUMENT (unbounded — billions of rows at 100 TB), so forcing a
    # broadcast here would ship the whole corpus's count table to every
    # executor and remove Spark's size-based fallback. Left unhinted,
    # AQE broadcasts when the corpus is actually small and shuffles on
    # doc_id otherwise — the shuffle is keyed the same as `pairs`'
    # groupBy output, so it stays a well-partitioned hash join.
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
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

    base = md5_hash60(gram); h_s = (a_s*hi + b_s*lo + s) mod (2^61-1)
    over base's 30-bit halves; sig[s] = min over the doc's grams. One
    md5 per gram total — the seed permutations are integer-only.
    """
    grams = doc_word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    base = grams.select("doc_id", md5_hash60(F.col("g")).alias("h"))
    hi = F.shiftright(F.col("h"), 30)
    lo = F.col("h").bitwiseAND(F.lit((1 << 30) - 1))
    per_gram = base.select(
        "doc_id",
        *[
            ((F.lit(a) * hi + F.lit(b) * lo + F.lit(s)) % F.lit(MINHASH_PRIME)).alias(
                f"h{s}"
            )
            for s, (a, b) in enumerate(seed_coeffs(seeds))
        ],
    )
    # Plain MIN aggregates get map-side partial aggregation: each task
    # pre-folds its grams to one row per doc before the shuffle, so the
    # exchange carries |docs| x seeds longs, not |grams| x seeds (a
    # collect_list-then-fold formulation would shuffle every gram's
    # hash vector).
    sig = per_gram.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"m{s}") for s in range(seeds)]
    )
    return sig.select(
        "doc_id", F.array(*[f"m{s}" for s in range(seeds)]).alias("sig")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n: int = 5,
    bands: int = MINHASH_BANDS,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """LSH near-dup candidates: docs equal on a whole band of minhashes.

    Band-key groupBy-join means cost is O(docs x bands) plus within-bucket
    pair expansion — the scale path for corpus-wide near-dedup.
    Returns distinct (doc_a, doc_b), doc_a < doc_b.

    Hot-bucket bound (a 100 TB corpus of boilerplate can put millions of
    docs in one band bucket; both an unbounded collect_list row and the
    quadratic expansion would blow up): members are ranked per bucket
    by a row_number-only window — O(1) window state, no per-row list.
    The first ``max_bucket`` members of each bucket fold into a
    cap-bounded sorted id list and expand all-pairs; every later member
    is linked to the bucket's smallest-id member by a single "star"
    edge, emitted row-wise. Pair volume per bucket is bounded by
    max_bucket^2/2 + n, no unbounded list exists anywhere, and
    duplicate clusters stay connected (every member shares an edge with
    the representative), which is what transitive near-dup grouping
    needs. Measured at 1M docs / local[32] (bench_scale corpus, plus a
    200k-doc identical-text hot bucket): ranking with O(1) state and
    folding the head once runs ~1.5x faster than the previous
    formulation, whose bounded-sliding-frame collect_list materialized
    up to max_bucket ids for EVERY row of the window pass.
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
    # Bucket-local pair expansion instead of a band-table self-join: a
    # self-join would evaluate the whole signature lineage twice (both
    # join inputs share it) and shuffle the band table against itself;
    # ranking members inside each bucket computes signatures once and
    # expands pairs inside each bucket, which is where LSH cost belongs.
    # ONE window pass carrying O(1) state (row_number + running first —
    # no per-row list), then branch on the rank: head members fold to a
    # cap-bounded id list (the groupBy reuses the window's
    # (band, band_key) hash partitioning — no extra exchange) and
    # expand all-pairs; overflow members emit star edges row-wise.
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "band_key").orderBy("doc_id")
    ranked = bands_df.select(
        "band",
        "band_key",
        "doc_id",
        F.row_number().over(w).alias("_rk"),
        F.first("doc_id").over(w).alias("_rep"),
    )
    head_pairs = (
        ranked.filter(F.col("_rk") <= max_bucket)
        .groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("_ids"))
        .select(
            # all-pairs among the sorted ids: element i pairs with every
            # id before it, so doc_a < doc_b by construction
            F.explode(
                F.flatten(
                    F.transform(
                        "_ids",
                        lambda x, i: F.transform(
                            F.slice("_ids", 1, i),
                            lambda p: F.struct(
                                p.alias("doc_a"), x.alias("doc_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
    )
    star_pairs = ranked.filter(F.col("_rk") > max_bucket).select(
        F.struct(
            F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
        ).alias("p")
    )
    return (
        head_pairs.unionByName(star_pairs)
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def lsh_verified_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    bands: int = MINHASH_BANDS,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """Candidate -> verify near-dup pipeline, the production shape at
    100 TB: LSH proposes candidate pairs (cost linear in docs x bands,
    never all-pairs), then EXACT word-n-gram Jaccard is computed ONLY
    on the candidates and pairs below ``threshold`` are discarded.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Verification cost is candidate-bounded: each candidate pair expands
    by doc_a's distinct grams, the (doc_b, gram) hash join keeps the
    matches, and one groupBy counts the intersection — O(pairs x
    grams-per-doc) rows through two keyed shuffles. Denominator counts
    join WITHOUT a broadcast hint (one row per candidate endpoint is
    unbounded at corpus scale; AQE broadcasts when actually small).
    Candidates that share no gram (possible under banding collisions)
    drop out of the inner intersection join — their Jaccard is 0, below
    any positive threshold, so the inner join is not a semantics cut.
    """
    cand = lsh_candidate_pairs(
        docs, n=n, bands=bands, rows_per_band=rows_per_band,
        text_col=text_col, id_col=id_col, max_bucket=max_bucket,
    )
    grams = doc_word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    inter = (
        cand.join(
            grams.select(F.col("doc_id").alias("doc_a"), "g"), "doc_a"
        )
        .join(
            grams.select(F.col("doc_id").alias("doc_b"), "g"),
            ["doc_b", "g"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    cnt = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        inter.join(
            cnt.select(
                F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na")
            ),
            "doc_a",
        )
        .join(
            cnt.select(
                F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb")
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every doc gets
    ``cluster_id`` = the smallest doc_id reachable through candidate
    pairs (singletons label themselves). This is the step that turns
    pair lists into actionable dedup groups — pick the canonical doc
    per cluster, drop the rest.

    Iterative min-label propagation: each round, every node lowers its
    label to the min of its own and its neighbors' labels; converged
    when NO row's label changed — counted exactly, in the same pass
    that computes the update (the old label rides along as a column, so
    the witness is one filter+count over the checkpointed round, works
    for ANY id type, and cannot false-converge the way a numeric
    label-sum would for string ids, where SUM silently returns NULL).
    Rounds needed = graph diameter, which LSH
    pair graphs keep small by construction (head members form cliques,
    overflow members attach by star edges to the representative).
    Per round: one shuffle join edges x labels + one agg;
    ``localCheckpoint`` truncates the growing lineage so round N's plan
    does not replay rounds 1..N-1. Scale: state is one (doc, label) row
    per doc and the edge list — both partitioned, nothing driver-side
    except the 1-row convergence scalar.
    """
    if pairs is None:
        pairs = lsh_candidate_pairs(docs, id_col=id_col)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    ).localCheckpoint(eager=True)
    labels = docs.select(
        F.col(id_col).alias("doc_id"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nb_min"))
        )
        labels = (
            labels.join(
                neighbor_min, labels.doc_id == neighbor_min.src, "left"
            )
            .select(
                "doc_id",
                F.col("cluster_id").alias("_prev"),
                F.least(
                    F.col("cluster_id"), F.coalesce("nb_min", "cluster_id")
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = labels.filter(
            F.col("_prev") != F.col("cluster_id")
        ).count()
        labels = labels.drop("_prev")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iter} rounds "
        "(pair graph diameter exceeds the bound)"
    )
