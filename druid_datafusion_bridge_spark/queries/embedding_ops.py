"""Embedding-column operators beyond search (build mandate: the
embedding half of a training-data pipeline): int8 scalar quantization
with reconstruction-error accounting, and per-dimension corpus
statistics (the calibration input asymmetric quantizers and whitening
transforms need).

Everything is JVM higher-order array functions (transform / array_max /
aggregate) — no Python in the path, whole-stage codegen applies, and
each row is processed independently (quantization) or via one
posexplode + aggregate shuffle keyed on the 64 dimension ordinals
(dim stats), so both shapes are trivially 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "em_int8_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
             embedding
      FROM embeddings)
    SELECT vec_id, scale,
           CAST(CASE WHEN scale = 0 THEN 0 ELSE
             list_sum(list_transform(embedding,
                      x -> round(CAST(x AS DOUBLE) / scale))) END
             AS BIGINT) AS q_sum,
           CAST(CASE WHEN scale = 0 THEN 0 ELSE
             list_sum(list_transform(embedding,
                      x -> abs(round(CAST(x AS DOUBLE) / scale)))) END
             AS BIGINT) AS q_l1,
           CASE WHEN scale = 0 THEN 0.0 ELSE
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)
                               - round(CAST(x AS DOUBLE) / scale) * scale)))
             END AS max_abs_err
    FROM q ORDER BY vec_id
    """,
)
def em_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (the faiss
    SQ8-style storage layout ANN indexes use to cut vector memory 4x):
    scale = max|x|/127, q_i = round(x_i/scale), with the quantized
    checksums and the max reconstruction error per vector. Stateless
    row-local map over array built-ins — quantizing 100 TB of vectors
    is a pure scan with no shuffle at all.

    Exactness contract with the oracle: float->double widening is
    exact, scale/round/mul/sub are IEEE-identical in both engines, and
    the checksum sums are integer-valued doubles (exact under any
    summation order)."""
    emb = table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))) / F.lit(127.0)
    ).alias("scale")
    emb = emb.select("vec_id", "embedding", scale)
    qi = lambda x: F.round(xd(x) / F.col("scale"))  # noqa: E731
    zero = F.col("scale") == 0
    return emb.select(
        "vec_id",
        "scale",
        F.when(zero, F.lit(0))
        .otherwise(
            F.aggregate(
                F.transform("embedding", qi), F.lit(0.0), lambda a, x: a + x
            )
        )
        .cast("long")
        .alias("q_sum"),
        F.when(zero, F.lit(0))
        .otherwise(
            F.aggregate(
                F.transform("embedding", lambda x: F.abs(qi(x))),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        .cast("long")
        .alias("q_l1"),
        F.when(zero, F.lit(0.0))
        .otherwise(
            F.array_max(
                F.transform(
                    "embedding",
                    lambda x: F.abs(xd(x) - qi(x) * F.col("scale")),
                )
            )
        )
        .alias("max_abs_err"),
    ).orderBy("vec_id")


@query(
    "em_dim_stats",
    oracle="""
    SELECT CAST(s.i - 1 AS INTEGER) AS dim,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(embedding[s.i] AS DOUBLE) * 1048576)
                         AS BIGINT)) AS DOUBLE) / 1048576 AS sum_val,
           MIN(CAST(embedding[s.i] AS DOUBLE)) AS min_val,
           MAX(CAST(embedding[s.i] AS DOUBLE)) AS max_val
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS s(i)
    GROUP BY dim ORDER BY dim
    """,
)
def em_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column
    (quantizer calibration / whitening input): posexplode to
    (dim, value) rows, one aggregate keyed on the 64 dimension
    ordinals. The sum is a 2^-20 fixed-point accumulator: multiplying
    a float32-derived double by a power of two is EXACT, floor is
    exact, and integer sums are order-independent — so the result is
    bit-identical regardless of partitioning, which a raw double sum
    is not (and a double->DECIMAL cast rounds ties differently across
    engines). Map-side partial aggregation means the shuffle carries
    64 rows per partition regardless of corpus size."""
    emb = table(spark, sf_dir, "embeddings")
    fx = F.floor(F.col("x").cast("double") * F.lit(1048576)).cast("long")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            (F.sum(fx).cast("double") / F.lit(1048576)).alias("sum_val"),
            F.min(F.col("x").cast("double")).alias("min_val"),
            F.max(F.col("x").cast("double")).alias("max_val"),
        )
        .orderBy("dim")
    )


@query(
    "em_truncate_rerank",
    oracle="""
    WITH probes AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS q
      FROM embeddings WHERE vec_id < 5),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    coarse AS (
      SELECT p.probe_id, c.vec_id, c.v, p.q,
             ROW_NUMBER() OVER (
               PARTITION BY p.probe_id
               ORDER BY round(list_cosine_similarity(c.v[1:16], p.q[1:16]), 9)
                          DESC,
                        c.vec_id) AS crank
      FROM corpus c CROSS JOIN probes p
      WHERE c.vec_id <> p.probe_id),
    rerank AS (
      SELECT probe_id, vec_id,
             round(list_cosine_similarity(v, q), 9) AS sim
      FROM coarse WHERE crank <= 20)
    SELECT probe_id, vec_id, sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY sim DESC, vec_id) AS BIGINT)
             AS rank
    FROM rerank
    QUALIFY rank <= 5
    ORDER BY probe_id, rank
    """,
)
def em_truncate_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine ANN via dimension truncation (the Matryoshka /
    MRL serving pattern): a first pass scores cosine on only the first
    16 of 64 dimensions — 4x less arithmetic and memory traffic per
    candidate — keeps the top-20 per probe, then reranks just those 20
    with the exact full-dimension cosine for the final top-5.

    Scale shape: probes broadcast; the corpus is scanned ONCE computing
    the cheap truncated score; the expensive full-dim cosine touches 20
    rows per probe instead of the whole corpus. Both phases are
    per-probe windows over (probe_id)-partitioned candidates. Ranking
    happens on 9-decimal-rounded sims with a vec_id tie-break, so the
    selection is bit-deterministic cross-engine."""
    from ..operators.similarity import as_double_vec, cosine

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("q"),
    )
    corpus = emb.select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    from pyspark.sql import Window as W

    coarse_sim = F.round(
        cosine(F.slice(F.col("v"), 1, 16), F.slice(F.col("q"), 1, 16)), 9
    )
    wc = W.partitionBy("probe_id").orderBy(
        F.col("csim").desc(), F.col("vec_id")
    )
    cand = (
        corpus.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("csim", coarse_sim)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= 20)
    )
    wr = W.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        cand.select(
            "probe_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("q")), 9).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 5)
        .orderBy("probe_id", "rank")
    )


@query(
    "sim_ivf_incremental",
    oracle="""
    SELECT vec_id AS probe_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY probe_id
    """,
)
def sim_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index MAINTENANCE: the coarse quantizer is trained only on
    the prior corpus (vec_id < 400) and FROZEN; the new batch
    (vec_id >= 400) is appended by assigning it to the existing
    centroids — one stateless broadcast-argmax pass over just the new
    rows, no re-clustering, existing cell assignments (and hence the
    cell-partitioned storage layout) untouched. Search runs over the
    combined index and must still meet the same per-probe recall
    contract as the from-scratch IVF (floor 0.4 vs the exact
    brute-force top-10 over the FULL corpus, old + new)."""
    from ..operators.similarity import brute_force_topk, ivf_topk
    from .similarity import _probes, _recall_contract

    emb = table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    probes = _probes(emb)
    ann = ivf_topk(emb, probes, k=10, n_centroids=16, nprobe=8, fit_corpus=old)
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.4)


@query(
    "em_pq_quantize",
    oracle="""
    WITH pos AS (
      SELECT generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS d,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings),
    dimagg AS (
      SELECT d, COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,18))) AS s,
             SUM(CAST(x * x AS DECIMAL(38,18))) AS ss
      FROM pos GROUP BY d),
    tot AS (
      SELECT MAX(n) AS n,
             CAST(SUM(ss) AS DOUBLE) AS tss,
             CAST(SUM(CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           AS DECIMAL(38,10))) AS DOUBLE) AS sq
      FROM dimagg)
    SELECT CAST(n AS BIGINT) AS n_vectors,
           round((tss - sq / n) / n, 9) AS mse_mean,
           TRUE AS pq_improves
    FROM tot
    """,
)
def em_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (operators/similarity.py pq_quantize: 4
    subspaces x 16 centroids = 4-byte codes, 64x smaller than float32)
    with a distortion-dominance contract: the corpus-average PQ
    reconstruction error must beat the 1-centroid-per-subspace baseline
    — whose distortion is exactly the summed per-dimension variance,
    which the oracle computes bit-for-bit (decimal-exact moment sums,
    then the identical double expression; k-means training itself is
    Spark-side and not SQL-reproducible, hence the contract form, same
    pattern as the IVF/LSH recall oracles). n_vectors and mse_mean are
    exact outputs; pq_improves pins the contract."""
    from ..operators.similarity import as_double_vec, pq_quantize

    emb = table(spark, sf_dir, "embeddings")
    pos = emb.select(
        F.posexplode(as_double_vec(F.col("embedding"))).alias("d", "x")
    )
    dimagg = pos.groupBy("d").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,18)")).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)")).alias("ss"),
    )
    tot = dimagg.agg(
        F.max("n").alias("n"),
        F.sum("ss").cast("double").alias("tss"),
        F.sum(
            (F.col("s").cast("double") * F.col("s").cast("double")).cast(
                "decimal(38,10)"
            )
        )
        .cast("double")
        .alias("sq"),
    )
    pq = pq_quantize(emb, dim=64, n_subspaces=4, codebook_size=16)
    mse_pq = pq.agg(
        (F.sum("sq_err") / F.count("*")).alias("mse_pq")
    )
    mse_mean = (F.col("tss") - F.col("sq") / F.col("n")) / F.col("n")
    return (
        tot.crossJoin(F.broadcast(mse_pq))
        .select(
            F.col("n").cast("bigint").alias("n_vectors"),
            F.round(mse_mean, 9).alias("mse_mean"),
            (F.col("mse_pq") < mse_mean).alias("pq_improves"),
        )
    )


@query(
    "em_binary_quantize",
    oracle="""
    WITH bits AS (
      SELECT vec_id, i,
             CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
                  THEN 1::BIGINT ELSE 0::BIGINT END AS b
      FROM embeddings, unnest(generate_series(1, 64)) AS u(i)),
    words AS (
      SELECT vec_id,
             SUM(CASE WHEN i <= 32 THEN b * (1::BIGINT << (i - 1))
                      ELSE 0 END) AS w0,
             SUM(CASE WHEN i > 32 THEN b * (1::BIGINT << (i - 33))
                      ELSE 0 END) AS w1
      FROM bits GROUP BY vec_id),
    probes AS (SELECT vec_id AS probe_id, w0 AS p0, w1 AS p1
               FROM words WHERE vec_id < 5),
    dists AS (
      SELECT p.probe_id, w.vec_id,
             bit_count(xor(w.w0, p.p0))
               + bit_count(xor(w.w1, p.p1)) AS hamming
      FROM probes p, words w WHERE w.vec_id <> p.probe_id),
    ranked AS (
      SELECT probe_id, vec_id, hamming,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY hamming, vec_id) AS rank
      FROM dists)
    SELECT probe_id, vec_id, CAST(hamming AS BIGINT) AS hamming,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def em_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit (binary) quantization + Hamming-distance top-k: each
    64-dim vector packs into two 32-bit sign words (32x memory cut, the
    coarse tier of modern two-stage retrieval — binary prefilter, then
    exact rerank like em_truncate_rerank), and the 5 probe vectors rank
    the corpus by XOR popcount. Quantization is a stateless scan (no
    shuffle at 100 TB); search broadcasts the bounded probe codes and
    streams the corpus through JVM-side bit_count, one window cut per
    probe. Exact in both engines: bit packing and popcounts are integer
    arithmetic, ties broken by vec_id."""
    from pyspark.sql import Window as W

    emb = table(spark, sf_dir, "embeddings")
    bits = F.transform(
        "embedding",
        lambda x: F.when(x.cast("double") > 0, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    # b * 2^i via pow: exact (2^31 < 2^53), since shiftleft's bit count
    # must be a literal int, not a per-element column
    word = lambda arr: F.aggregate(  # noqa: E731
        F.zip_with(
            arr,
            F.sequence(F.lit(0), F.lit(31)),
            lambda b, i: b * F.pow(F.lit(2.0), i).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    words = emb.select(
        "vec_id",
        word(F.slice(bits, 1, 32)).alias("w0"),
        word(F.slice(bits, 33, 32)).alias("w1"),
    )
    probes = words.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("w0").alias("p0"),
        F.col("w1").alias("p1"),
    )
    dists = (
        words.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            (
                F.bit_count(F.col("w0").bitwiseXOR(F.col("p0")))
                + F.bit_count(F.col("w1").bitwiseXOR(F.col("p1")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    w = W.partitionBy("probe_id").orderBy("hamming", "vec_id")
    return (
        dists.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("probe_id", "vec_id", "hamming", "rank")
    )
