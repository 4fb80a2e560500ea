"""KMV (k-minimum-values) distinct-count sketches with set operations —
the query-time analog of Druid's ThetaSketch (union / intersection of
distinct-count sketches across slices), which the reference's README
gestures at but its code cannot read (COMPLEX columns fail on read,
`/root/reference/src/column/mod.rs:59-61`). The repo's ingest-time HLL
COMPLEX column (`sources/ingest.py`) covers mergeable counts; this
operator covers the OTHER Druid sketch use: set algebra between
sketches ("users who did A and B") that HLL cannot answer.

Built entirely from JVM built-ins on an md5-derived 60-bit hash, so the
sketch is deterministic and engine-independent: the DuckDB oracle
recomputes every output bit-exactly (the same property the dedup /
sampling operators rely on). No RNG, no Python, no UDF.

Scale posture (100 TB):
- phase 1 aggregates on (spark_partition_id, group), so its map-side
  partial collect_set dedupes within each input partition BEFORE the
  exchange and every aggregation state is bounded by one split's
  distinct hashes — shuffle volume is COUNT(DISTINCT)-class (each
  partition's deduped hash set crosses the wire once), memory is
  sketch-class (no task ever holds a whole group);
- phase 2 is the true sketch merge: its shuffle carries at most k
  longs per (partition, group), and per-group merge state is bounded
  by k x n_partitions. Set algebra then runs on single sketch rows
  (k longs each).
- a map-side k-slice BEFORE the phase-1 exchange would cut shuffle to
  k per partition-group (the DataSketches shape), but needs either a
  per-partition top-k primitive Spark's aggregate layer lacks or a
  threshold pre-filter derived from approx_count_distinct — whose HLL
  is not bit-reproducible in other engines, which would forfeit the
  exact oracle this module exists to keep. Deliberately not done.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

# 60-bit hash space (md5_hash60 yields uniform values in [0, 2^60)).
HASH_SPACE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct 60-bit hashes of
    ``value_col``, as a sorted array. Groups with fewer than k distinct
    values keep them all (the sketch is then exact).

    Two-phase: per-partition partial sketch (aggregation state bounded
    by split size), then a merge whose input is <= k hashes per
    partition per group. Every hash that is among the k smallest
    globally is among the k smallest of its own partition, so the merge
    is lossless for the head — the standard KMV merge argument. See the
    module docstring for what each exchange actually carries.
    """
    h = md5_hash60(F.col(value_col).cast("string"))
    partial = (
        df.select(F.col(group_col).alias("g"), h.alias("h"))
        .groupBy(F.spark_partition_id().alias("_pid"), "g")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("part"))
    )
    return (
        partial.select("g", F.explode("part").alias("h"))
        .groupBy("g")
        .agg(
            F.slice(
                F.array_sort(F.collect_set("h")), 1, k
            ).alias("sketch")
        )
    )


def _theta(combined: Column, k: int) -> Column:
    """Threshold hash: the kth smallest of the combined sketch when the
    union saw >= k distinct hashes, else the whole hash space (the
    sketch is exact below theta)."""
    return F.when(
        F.size(combined) >= k, F.element_at(combined, k).cast("double")
    ).otherwise(F.lit(HASH_SPACE))


def theta_set_estimates(
    sketch_a: Column,
    sketch_b: Column,
    k: int = 256,
) -> list[Column]:
    """Union / intersection distinct-count estimates from two KMV
    sketch arrays (the ThetaSketch set-algebra step). Returns columns
    ``est_union`` and ``est_intersection`` (doubles; exact counts when
    the union fits the sketch).

    theta = kth smallest of the merged sketch. Every hash below theta
    is in a slice's sketch iff the value is in the slice (the sketch
    holds ALL hashes below its own max), so membership tests below
    theta are exact:
      est_union        = (k-1) * HASH_SPACE / theta
      est_intersection = |A ∩ B below theta| / (k-1) * est_union
    All arithmetic is a fixed expression tree over exactly-representable
    doubles (integers < 2^61 and one product 255*2^60 with an 8-bit
    mantissa), so Spark and the DuckDB oracle round identically.
    """
    combined = F.array_sort(F.array_union(sketch_a, sketch_b))
    theta = _theta(combined, k)
    full = F.size(combined) >= k
    est_union = F.when(
        full, F.lit(float(k - 1)) * F.lit(HASH_SPACE) / theta
    ).otherwise(F.size(combined).cast("double"))
    inter_below = F.size(
        F.filter(
            F.array_intersect(sketch_a, sketch_b),
            lambda x: x.cast("double") < theta,
        )
    )
    est_inter = F.when(
        full, inter_below.cast("double") * est_union / F.lit(float(k - 1))
    ).otherwise(inter_below.cast("double"))
    return [est_union.alias("est_union"), est_inter.alias("est_intersection")]


def cms_buckets(value: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` bucket indices for one value — row j uses the
    md5-derived hash of ``"j:" + value`` (independent-enough rows, and
    deterministic, so the DuckDB oracle reproduces every counter)."""
    return F.array(
        *[
            md5_hash60(F.concat(F.lit(f"{j}:"), value)) % width
            for j in range(depth)
        ]
    )


def count_min_sketch(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of ``value_col`` frequencies, as its flat
    counter table ``(j, bucket, c)`` — Druid ships this family as the
    datasketches frequency aggregators; the reference cannot read any
    COMPLEX column (src/column/mod.rs:59-61).

    One scan, one exchange: each row contributes to ``depth`` buckets
    (the posexplode multiplies rows depth-x BEFORE the map-side partial
    aggregate, which then collapses each input partition to at most
    depth x width counter rows — so the shuffle carries <= depth*width
    longs per partition no matter the input size or cardinality, the
    whole point of the sketch at 100 TB). The merged table is
    depth x width rows, broadcastable for the estimate join.
    """
    v = F.col(value_col).cast("string")
    pairs = df.select(
        F.posexplode(cms_buckets(v, depth, width)).alias("j", "bucket")
    )
    return pairs.groupBy("j", "bucket").agg(F.count("*").alias("c"))


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate counts for candidate ``items`` against a
    count-min ``sketch``: est(v) = min over rows j of the counter at
    (j, hash_j(v)) — the classic CMS upper bound (never underestimates;
    overestimates only by colliding mass). The sketch is tiny
    (depth x width) and is broadcast; the candidate side never
    shuffles more than items x depth rows."""
    v = F.col(value_col).cast("string")
    probes = items.select(
        value_col,
        F.posexplode(cms_buckets(v, depth, width)).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(value_col)
        .agg(F.min("c").alias("est_count"))
    )


# --- fixed-buckets histogram (Druid fixedBucketsHistogram) -------------
#
# Deterministic mergeable quantile digest: `buckets` exact counts over
# [0, buckets*width) with "clip" outlier handling (Druid's mode of the
# same name — everything below clamps into bucket 0, everything above
# into the last bucket). Counts merge by addition, so per-slice digests
# roll up losslessly; quantiles come from linear interpolation inside
# the bucket whose cumulative count crosses the target rank. All
# arithmetic is integer counts + one IEEE-double expression over
# exactly-representable inputs, so every estimate is bit-reproducible
# in any engine evaluating the same formula (the exact-oracle property
# this module exists to keep).


def hist_bucket(value: Column, buckets: int, width: float) -> Column:
    """Clip-mode bucket index for `value`: 0 <= pos < buckets."""
    return (
        F.greatest(
            F.lit(0),
            F.least(F.floor(value / F.lit(width)), F.lit(buckets - 1)),
        )
    ).cast("long")


def quantile_from_counters(
    counters: DataFrame,
    group_cols: list[str],
    width: float,
    q: float = 0.5,
    out_col: str = "p50_est",
) -> DataFrame:
    """Quantile estimate per group from merged (group..., pos, cnt)
    counters: the first bucket whose cumulative count reaches q*n,
    interpolated linearly inside the bucket. Output:
    (group..., n, <out_col>).

    Scale: one window + one agg over the counter table, whose size is
    |groups| x buckets regardless of how many raw rows were digested —
    the whole point of the digest. Asking for several quantiles reuses
    the same counter table (each ask is another scan of |groups| x
    buckets rows, never of the raw data)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy("pos")
    cum = counters.select(
        *group_cols, "pos", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    totals = counters.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    target = F.lit(q) * F.col("n")
    return (
        cum.join(totals, list(group_cols))
        .filter(
            (F.col("cum") >= target)
            & ((F.col("cum") - F.col("cnt")) < target)
        )
        .select(
            *group_cols,
            F.col("n"),
            (
                (
                    F.col("pos")
                    + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
                )
                * F.lit(width)
            ).alias(out_col),
        )
    )


def median_from_counters(
    counters: DataFrame, group_cols: list[str], width: float
) -> DataFrame:
    """Median shorthand for quantile_from_counters(q=0.5)."""
    return quantile_from_counters(counters, group_cols, width, q=0.5)
