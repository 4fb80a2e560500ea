"""Deduplication operators (build mandate): exact, normalized-exact,
n-gram Jaccard, MinHash+LSH — all pure DataFrame compositions (no Python
UDFs), so they distribute: dedup is groupBy/join on hash keys.

Scale posture: exact dedup is a hash groupBy on a fingerprint (one
shuffle on a high-cardinality key — AQE handles skew); MinHash/LSH is
explode -> min-agg -> band-bucket join, the standard way to avoid the
O(n^2) pair comparison at 100 TB. Pair outputs here are on doc subsets
only to keep the DuckDB oracle tractable; the operators themselves are
unbounded (see druid_datafusion_bridge_spark.operators.dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from ..operators.dedup import (
    LSH_MAX_BUCKET,
    MINHASH_BANDS,
    MINHASH_PRIME,
    MINHASH_ROWS_PER_BAND,
    NGRAM_MAX_DF,
    doc_word_ngrams,
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    seed_coeffs,
)

# (seed, a, b) rows mirroring the Spark-side universal-hash family, so
# the oracle reproduces every minhash bit-exactly.
_SEED_ROWS = ", ".join(
    f"({s}, {a}, {b})"
    for s, (a, b) in enumerate(seed_coeffs(MINHASH_BANDS * MINHASH_ROWS_PER_BAND))
)

_ORACLE_HASHES = f"""
    base AS (
      SELECT doc_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h
      FROM grams),
    hashes AS (
      SELECT doc_id, s.seed,
             (s.a * (h >> 30) + s.b * (h & 1073741823) + s.seed)
               % {MINHASH_PRIME} AS h
      FROM base, (VALUES {_SEED_ROWS}) AS s(seed, a, b))
"""


@query(
    "dd_exact",
    oracle="""
    SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content fingerprint, keep lowest doc_id."""
    docs = table(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text", id_col="doc_id")


@query(
    "dd_exact_normalized",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY lower(regexp_replace(text, '\\s+', ' ', 'g'))
    """,
)
def dd_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after whitespace/case normalization."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "text", F.lower(F.regexp_replace("text", r"\s+", " "))
    )
    return exact_dedup(docs, text_col="text", id_col="doc_id")


# DuckDB mirror of the word-5-gram set used by the Spark operators.
_ORACLE_GRAMS = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
  grams AS (
    SELECT DISTINCT doc_id,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS g
    FROM toks, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS u(i))
"""


@query(
    "dd_ngram_jaccard",
    oracle=f"""
    WITH {_ORACLE_GRAMS},
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    kept AS (
      SELECT doc_id, g FROM grams
      WHERE g NOT IN (SELECT g FROM grams
                      GROUP BY g HAVING COUNT(*) > {NGRAM_MAX_DF})),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, shared,
           CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.2
    """,
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-5-gram Jaccard >= 0.2 (inverted-index
    join on grams — no O(n^2) cross join). Boilerplate shingles with
    document frequency > NGRAM_MAX_DF are cut before the self-join (the
    oracle's ``kept`` CTE mirrors the cut bit-exactly); dropped shingles
    can only lower a pair's Jaccard, never invent a pair."""
    docs = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=5, threshold=0.2)


@query(
    "dd_minhash_signatures",
    oracle=f"""
    WITH {_ORACLE_GRAMS},
    {_ORACLE_HASHES}
    SELECT doc_id, seed, MIN(h) AS minhash
    FROM hashes GROUP BY doc_id, seed
    """,
)
def dd_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (doc x seed -> min over the doc's 5-gram
    shingles of a universal-hash family seeded from one md5 base hash).
    Engine-independent arithmetic => exactly oracle-checkable."""
    docs = table(spark, sf_dir, "documents")
    return (
        minhash_signatures(docs)
        .select("doc_id", F.posexplode("sig").alias("seed", "minhash"))
        .select("doc_id", F.col("seed").cast("long").alias("seed"), "minhash")
    )


@query(
    "dd_minhash_lsh_pairs",
    oracle=f"""
    WITH {_ORACLE_GRAMS},
    {_ORACLE_HASHES},
    sig AS (SELECT doc_id, seed, MIN(h) AS mh FROM hashes GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // {MINHASH_ROWS_PER_BAND} AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, band),
    ranked AS (
      SELECT doc_id, band, band_key,
             row_number() OVER (PARTITION BY band, band_key
                                ORDER BY doc_id) AS rk,
             MIN(doc_id) OVER (PARTITION BY band, band_key) AS rep
      FROM bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ranked a JOIN ranked b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
       AND a.rk <= {LSH_MAX_BUCKET} AND b.rk <= {LSH_MAX_BUCKET}
      UNION
      SELECT rep AS doc_a, doc_id AS doc_b
      FROM ranked WHERE rk > {LSH_MAX_BUCKET})
    SELECT doc_a, doc_b FROM cand
    """,
)
def dd_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: equal band-signature in >=1 of the bands.
    This is the 100 TB-scale near-dup path — cost is O(docs x bands) plus
    bucket-local pair expansion, never all-pairs. The oracle mirrors the
    operator's hot-bucket bound EXACTLY (all-pairs among each bucket's
    {LSH_MAX_BUCKET} smallest doc_ids + star edges from the bucket
    representative to every overflow member), so it stays bit-exact on
    any corpus — including one with a boilerplate bucket past the cap,
    which an unbounded all-pairs oracle would over-enumerate."""
    docs = table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs)


@query(
    "dd_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      FROM documents),
    h AS (SELECT doc_id, w,
                 CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hw
          FROM toks),
    bits AS (
      SELECT doc_id, b.bit,
             CASE WHEN SUM(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1 ELSE 0 END AS bitval
      FROM h, (SELECT unnest(generate_series(0, 15)) AS bit) b
      GROUP BY doc_id, b.bit)
    SELECT doc_id,
           CAST(SUM(bitval * (1::BIGINT << bit)) AS BIGINT) AS simhash16
    FROM bits GROUP BY doc_id
    """,
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct words (md5-derived bit votes).
    Pure explode + groupBy — two shuffles, linear in corpus size."""
    from ..operators import spread

    docs = table(spark, sf_dir, "documents")
    toks = spread(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    h = toks.select(
        "doc_id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("hw")
    )
    bits = (
        h.select("doc_id", "hw", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"))
        .groupBy("doc_id", "bit")
        .agg(
            F.expr(
                "CASE WHEN SUM(CASE WHEN (shiftright(hw, bit) & 1) = 1 THEN 1 ELSE -1 END) > 0"
                " THEN 1 ELSE 0 END"
            ).alias("bitval")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.expr("SUM(bitval * shiftleft(CAST(1 AS BIGINT), bit))").alias("simhash16")
    )


# LSH band-bucket edges -> transitive closure: the shared CTE chain for
# every cluster-level oracle (assignment below, keep-best retention).
_ORACLE_CLUSTERS = f"""
    sig AS (SELECT doc_id, seed, MIN(h) AS mh FROM hashes GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // {MINHASH_ROWS_PER_BAND} AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, band),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT re.doc_id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
    clusters AS (
      SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)"""


@query(
    "dd_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE {_ORACLE_GRAMS},
    {_ORACLE_HASHES},
    {_ORACLE_CLUSTERS}
    SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id
    """,
)
def dd_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the LSH
    candidate-pair graph via iterative min-label propagation
    (operators/dedup.py duplicate_clusters); every doc labeled with the
    smallest doc_id in its component, singletons labeling themselves.
    The oracle computes the same fixpoint as a DuckDB recursive-CTE
    transitive closure — an iterative Spark operator that still carries
    an exact SQL oracle."""
    from ..operators.dedup import duplicate_clusters

    docs = table(spark, sf_dir, "documents")
    return duplicate_clusters(docs).orderBy("doc_id")


@query(
    "dd_shared_passages",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[i : i + 19], ' ') AS passage
      FROM t, unnest(range(1, len(toks) - 18)) AS r(i)
      WHERE len(toks) >= 20),
    s AS (
      SELECT passage,
             COUNT(*) AS n_docs,
             MIN(doc_id) AS first_doc,
             MAX(doc_id) AS last_doc
      FROM g GROUP BY passage HAVING COUNT(*) >= 2)
    SELECT md5(passage) AS passage_fp,
           CAST(length(passage) AS BIGINT) AS passage_chars,
           n_docs, first_doc, last_doc
    FROM s
    ORDER BY n_docs DESC, passage_fp
    LIMIT 50
    """,
)
def dd_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-passage detection (training-data substring
    dedup at shingle granularity, the distributed approximation of
    suffix-array substring dedup): every 20-token window shared
    verbatim by >= 2 documents, ranked by how many documents carry it.
    Catches boilerplate and license blocks that document-level
    fingerprints miss because the surrounding text differs.

    Scale shape: shingle explode (distinct per doc) -> one
    map-side-combined groupBy on the passage key -> HAVING >= 2 keeps
    only actually-shared passages -> top-50 by TakeOrdered. Passages
    leave the shuffle as md5 fingerprints in the output; the groupBy
    key is the passage text itself so counts are exact (hashing before
    the count would make collisions conflate passages)."""
    docs = table(spark, sf_dir, "documents")
    grams = doc_word_ngrams(docs, n=20)
    return (
        grams.groupBy(F.col("g").alias("passage"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            F.md5("passage").alias("passage_fp"),
            F.length("passage").cast("bigint").alias("passage_chars"),
            "n_docs",
            "first_doc",
            "last_doc",
        )
        .orderBy(F.col("n_docs").desc(), "passage_fp")
        .limit(50)
    )


@query(
    "dd_cluster_keep_best",
    oracle=f"""
    WITH RECURSIVE {_ORACLE_GRAMS},
    {_ORACLE_HASHES},
    {_ORACLE_CLUSTERS},
    q AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS nt
      FROM documents),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, q.nt,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.nt DESC, c.doc_id) AS rn
      FROM clusters c JOIN q USING (doc_id))
    SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
           doc_id AS keep_doc, nt AS keep_tokens,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rn = 1 ORDER BY cluster_id
    """,
)
def dd_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy over near-dup clusters — the curation step that
    follows cluster assignment: per cluster keep the member with the
    most alphanumeric tokens (the fullest version of the duplicated
    content), tie-broken on lowest doc_id; report what was kept and how
    many copies were dropped.

    Spark shape: cluster labels from the iterative min-label
    propagation (operators/dedup.py duplicate_clusters), token counts
    from built-in regexp_extract_all, then ONE agg shuffle on
    cluster_id where MAX over a (nt, -doc_id, doc_id) struct does the
    argmax with map-side partial aggregation — no window sort over the
    full corpus, no per-cluster list state; at 100 TB the retention
    pass costs one bounded shuffle beyond clustering. The oracle
    re-derives the clusters via the recursive-CTE closure and ranks
    members with a window."""
    from ..operators.dedup import duplicate_clusters

    docs = table(spark, sf_dir, "documents")
    clusters = duplicate_clusters(docs)
    nt = docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)"))
        .cast("bigint")
        .alias("nt"),
    )
    best = F.max(
        F.struct(
            F.col("nt"), (-F.col("doc_id")).alias("nd"), F.col("doc_id")
        )
    ).alias("w")
    return (
        clusters.join(nt, "doc_id")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"), best)
        .select(
            "cluster_id",
            "n_members",
            F.col("w.doc_id").alias("keep_doc"),
            F.col("w.nt").alias("keep_tokens"),
            (F.col("n_members") - 1).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


@query(
    "dd_lsh_verified_pairs",
    oracle=f"""
    WITH {_ORACLE_GRAMS},
    {_ORACLE_HASHES},
    sig AS (SELECT doc_id, seed, MIN(h) AS mh FROM hashes GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // {MINHASH_ROWS_PER_BAND} AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, band),
    ranked AS (
      SELECT doc_id, band, band_key,
             row_number() OVER (PARTITION BY band, band_key
                                ORDER BY doc_id) AS rk,
             MIN(doc_id) OVER (PARTITION BY band, band_key) AS rep
      FROM bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ranked a JOIN ranked b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
       AND a.rk <= {LSH_MAX_BUCKET} AND b.rk <= {LSH_MAX_BUCKET}
      UNION
      SELECT rep AS doc_a, doc_id AS doc_b
      FROM ranked WHERE rk > {LSH_MAX_BUCKET}),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN grams ga ON ga.doc_id = c.doc_a
      JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
      GROUP BY c.doc_a, c.doc_b),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common)
             AS jaccard
    FROM inter i
    JOIN cnt ca ON ca.doc_id = i.doc_a
    JOIN cnt cb ON cb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (ca.n + cb.n - i.n_common) >= 0.5
    """,
)
def dd_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate -> verify: LSH proposes, exact n-gram Jaccard (computed
    ONLY on candidates) confirms pairs >= 0.5 — the standard production
    near-dup pipeline (never all-pairs, never trusting banding alone).
    The oracle replays the full chain: minhash -> capped band buckets ->
    exact Jaccard on the candidate set."""
    from ..operators.dedup import lsh_verified_pairs

    docs = table(spark, sf_dir, "documents")
    return lsh_verified_pairs(docs, threshold=0.5)
