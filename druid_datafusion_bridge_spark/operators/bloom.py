"""Bloom-filter semi-join reduction — the runtime-filter technique that
makes 100 TB fact-dim joins affordable: hash the (filtered, small) build
side's join keys into a fixed-size bit array, broadcast it, and drop
fact rows whose keys cannot possibly match BEFORE the join's shuffle.
DataFusion/Trino/Spark all inject this automatically in some plans
(Spark: spark.sql.optimizer.runtime.bloomFilter.*); this operator is
the explicit, engine-independent form — md5-derived bit positions, so a
DuckDB oracle reproduces every bit and the no-false-negative contract
is checked exactly, not statistically.

Scale posture:
- build: one aggregate over the (already filtered) build keys; the
  bitmap is m_words 60-bit words — a few KB — assembled into a
  single-row map and broadcast. Shuffle volume: <= depth x m_words
  rows regardless of build cardinality (bit_or partials combine
  map-side).
- probe: per-row map lookups inside whole-stage codegen; the fact side
  sees ZERO additional exchange — the reduction happens in the scan's
  own stage, which is the entire point (a shuffled probe would cost
  more than the join it saves).

60 bits per word (not 64) so ``1 << bit`` never touches the sign bit —
Spark and DuckDB then agree on every shift without unsigned types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

BITS_PER_WORD = 60


def _positions(key: Column, depth: int, total_bits: int) -> list[Column]:
    """depth md5-derived bit positions in [0, total_bits) for one key."""
    return [
        md5_hash60(F.concat(F.lit(f"{j}:"), key.cast("string"))) % total_bits
        for j in range(depth)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_words: int = 256, depth: int = 3
) -> DataFrame:
    """Build the bitmap from a DataFrame of build-side join keys.

    Returns a single-row DataFrame with one map<long,long> column
    ``bm`` (word index -> 60-bit word); absent words are zero. Meant to
    be broadcast into the probe's stage.
    """
    total_bits = m_words * BITS_PER_WORD
    pos = (
        # a NULL key can never match a join, so it contributes no bits —
        # and unfiltered it would produce a NULL map key, which
        # map_from_entries rejects at runtime
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(*_positions(F.col(key_col), depth, total_bits))
            ).alias("pos")
        )
    )
    words = (
        pos.select(
            F.expr(f"pos div {BITS_PER_WORD}").alias("w"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(pos % {BITS_PER_WORD} as int))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bm")
    )


def bloom_probe_flag(
    probe: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_words: int = 256,
    depth: int = 3,
    flag_name: str = "bloom_pass",
) -> DataFrame:
    """Attach a ``bloom_pass`` boolean to every probe row: true iff all
    ``depth`` bit positions of its key are set in the bitmap. The
    bitmap (single row) rides in on a broadcast nested-loop join; every
    test is a map lookup + shift inside codegen — no probe-side
    shuffle. No false negatives by construction; false positives are
    colliding mass, bounded by the usual (1-e^{-dn/m})^d."""
    total_bits = m_words * BITS_PER_WORD
    out = probe.crossJoin(F.broadcast(bitmap))
    tests = []
    for j, pos in enumerate(_positions(F.col(key_col), depth, total_bits)):
        out = out.withColumn(f"_pos{j}", pos)
        tests.append(
            f"(shiftright(coalesce(bm[_pos{j} div {BITS_PER_WORD}], "
            f"cast(0 as bigint)), cast(_pos{j} % {BITS_PER_WORD} as int))"
            f" & 1) = 1"
        )
    # NULL probe keys yield NULL tests; a join can't match NULL, so the
    # flag is false (mirrors the build side dropping NULL keys)
    out = out.withColumn(
        flag_name, F.coalesce(F.expr(" AND ".join(tests)), F.lit(False))
    )
    return out.drop("bm", *[f"_pos{j}" for j in range(depth)])
