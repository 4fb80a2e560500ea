"""Embedding similarity search over array<float> columns.

Two paths, mirroring what a 100 TB training-data pipeline needs:
- brute-force cosine top-k: exact baseline. The probe set is broadcast;
  the corpus side streams — one pass, no shuffle until the final top-k
  (TakeOrderedAndProject / per-group window limit).
- LSH-bucketed (random hyperplane) ANN: corpus is pre-bucketed by sign
  bits of md5-seeded deterministic hyperplanes; probes only score their
  own bucket (+ optional multi-probe neighbors), cutting the scored
  candidates by ~2^bits.

All vector math uses built-in higher-order functions (zip_with /
aggregate) in DOUBLE — JVM-side, no Python serialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import spread


def as_double_vec(col: Column) -> Column:
    """array<float> -> array<double> (exact widening; all math in double)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate (sequential,
    position order — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    probes: (probe_id, probe_vec array). Broadcast the probes; score the
    corpus in one distributed pass; per-probe top-k via window limit.
    Excludes self-matches (same id). Ties broken by vec_id for
    determinism.
    """
    c = spread(
        corpus.select(
            F.col(id_col).alias("vec_id"), as_double_vec(F.col(vec_col)).alias("v")
        )
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col("probe_vec").alias("q")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cosine(F.col("v"), F.col("q")).alias("sim"))
    )
    w = W.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "sim", "rank")
    )


def hyperplane_bucket(vec: Column, dim: int, bits: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (int in [0, 2^bits)).

    Hyperplane b, component j has deterministic pseudo-random weight
    w(b,j) = (md5_hash60("hp:b:j") / 2^59) - 1  in [-1, 1).
    Bucket bit b = sign(dot(vec, w_b)). Deterministic across runs/engines.
    """
    def weight(b: int, j: int) -> float:
        # computed driver-side once; embedded as literals in the plan
        import hashlib

        h = int(hashlib.md5(f"hp:{b}:{j}".encode()).hexdigest()[:15], 16)
        return (h / float(1 << 59)) - 1.0

    bucket = F.lit(0)
    for b in range(bits):
        w = F.array(*[F.lit(weight(b, j)) for j in range(dim)])
        proj = dot(vec, w)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k: score only candidates in the probe's LSH bucket.

    At scale the corpus would be written partitioned by bucket so a probe
    batch prunes input partitions; here bucket is a computed join key.
    """
    c = spread(
        corpus.select(
            F.col(id_col).alias("vec_id"), as_double_vec(F.col(vec_col)).alias("v")
        )
    ).withColumn("bucket", hyperplane_bucket(F.col("v"), dim, bits))
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col("probe_vec").alias("q")
    ).withColumn("bucket", hyperplane_bucket(F.col("q"), dim, bits))
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cosine(F.col("v"), F.col("q")).alias("sim"))
    )
    w = W.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "sim", "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    bits: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold) via LSH
    self-join: only same-bucket pairs are scored."""
    c = spread(
        corpus.select(
            F.col(id_col).alias("vec_id"), as_double_vec(F.col(vec_col)).alias("v")
        )
    ).withColumn("bucket", hyperplane_bucket(F.col("v"), dim, bits))
    a = c.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = c.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
