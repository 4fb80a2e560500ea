"""Similarity-search query registrations (embeddings table).

The brute-force path carries a DuckDB oracle (explicit position-join dot
product, both engines in double); the LSH/ANN paths are Spark-only
(rows-only driver check) with recall verified against brute force in
pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..catalog import table
from . import query
from ..operators.similarity import (
    as_double_vec,
    brute_force_topk,
    cosine,
    embedding_neardup_pairs,
    lsh_topk,
)

# Oracle-side cosine between two DOUBLE lists by explicit position sum.
# generate_subscripts keeps both engines summing the same terms; the sum
# order may differ, so similarity values are rounded to 9 decimals on
# both sides before compare/rank (random-embedding sims are far apart).
_DUCK_COSINE = """
  SELECT a.vid, round(
           (SELECT SUM(x.a * y.b) FROM
              (SELECT generate_subscripts(a.v,1) i, unnest(a.v) a) x
              JOIN (SELECT generate_subscripts(q.v,1) i, unnest(q.v) b) y USING (i))
           / (sqrt((SELECT SUM(x.a*x.a) FROM (SELECT unnest(a.v) a) x)) *
              sqrt((SELECT SUM(y.b*y.b) FROM (SELECT unnest(q.v) b) y)))
         , 9) AS sim
"""


@query(
    "sim_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
    corpus AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id <> 0),
    scored AS (
      SELECT vid, round(list_cosine_similarity(a.v, (SELECT v FROM q)), 9) AS sim
      FROM corpus a)
    SELECT vid AS vec_id, sim
    FROM scored ORDER BY sim DESC, vec_id LIMIT 10
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id=0 (brute force baseline).
    Similarities rounded to 9 decimals for cross-engine fp stability."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        as_double_vec(F.col("embedding")).alias("q")
    )
    corpus = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    return (
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("v"), F.col("q")), 9).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "sim_topk_per_probe",
    oracle="""
    WITH probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS q
                    FROM embeddings WHERE vec_id < 5),
    corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT p.probe_id, c.vec_id,
             round(list_cosine_similarity(c.v, p.q), 9) AS sim
      FROM corpus c CROSS JOIN probes p
      WHERE c.vec_id <> p.probe_id),
    ranked AS (
      SELECT probe_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM scored)
    SELECT probe_id, vec_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def sim_topk_per_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-5 for 5 probe vectors: broadcast probes, one
    corpus pass, per-probe window limit — the distributed KNN shape."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )
    out = brute_force_topk(emb, probes, k=5)
    return out.select(
        "probe_id", "vec_id", F.round(F.col("sim"), 9).alias("sim"),
        F.col("rank").cast("long").alias("rank"),
    )


@query("sim_lsh_topk")  # approximate ANN => rows-only driver check
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-10 for 5 probes (the 100 TB path: bucket
    pruning instead of full scan). Recall vs brute force tested in pytest."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )
    return lsh_topk(emb, probes, dim=64, k=10, bits=4)


@query("sim_embedding_neardup")  # LSH-pruned pair search => rows-only
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= 0.95) within LSH
    buckets."""
    emb = table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.95, bits=4, dim=64).select(
        "id_a", "id_b", F.round(F.col("sim"), 9).alias("sim")
    )


@query("sim_ivf_topk")  # approximate ANN => rows-only driver check
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-10 for 5 probes: coarse-quantize into 16
    inverted lists, probe the 4 nearest cells. The second scale path
    beside LSH; recall vs brute force tested in pytest."""
    from ..operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )
    out = ivf_topk(emb, probes, k=10, n_centroids=16, nprobe=4)
    return out.select(
        "probe_id", "vec_id", F.round(F.col("sim"), 9).alias("sim"),
        F.col("rank").cast("long").alias("rank"),
    )
