"""Training-data pipeline operators beyond analysis: sequence packing,
repetition signals, benchmark-contamination checks, and PII-style
redaction. All pure DataFrame compositions over JVM built-ins — these
run inside whole-stage codegen and distribute by construction.

Scale posture (100 TB):
- sequence packing is shard-local: a window keyed on (shard) packs each
  shard independently, so parallelism = shard count and no global sort
  or single-partition window exists anywhere;
- repetition signals are one explode + two-level aggregate on
  (doc_id, token) — the shuffle key is high-cardinality and skew-free;
- contamination joins the corpus's shingle inverted index against a
  BROADCAST benchmark shingle set (benchmarks are tiny vs the corpus;
  the corpus side streams);
- redaction is a stateless regexp map — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .dedup import doc_word_ngrams


def sequence_pack(
    docs: DataFrame,
    budget: int = 64,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    doc-id order within a shard and split into fixed ``budget``-token
    training sequences (the GPT-style pretraining layout). Each doc is
    assigned the sequence in which it STARTS, plus its token offset in
    that sequence — enough for a writer to emit packed shards.

    Deterministic: shard = doc_id % n_shards, order = doc_id. The
    cumulative sum is a shard-partitioned running window, so shards pack
    independently and in parallel.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("seq_in_shard"),
        F.pmod(start, F.lit(budget)).cast("long").alias("offset_in_seq"),
    )


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: token
    count, distinct-token count, the most-frequent token's share, and
    the duplicate-token fraction. High duplicate/top-share documents are
    boilerplate or degenerate text a training pipeline drops.

    One explode -> (doc, token) counts -> per-doc rollup; both shuffles
    key on high-cardinality skew-free columns.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    per_tok = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "top_count",
            (F.col("top_count") / F.col("n_tokens")).alias("top_token_share"),
            (
                (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens")
            ).alias("dup_token_frac"),
        )
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark contamination: corpus documents sharing at least one
    word n-gram shingle with any benchmark document, with the count of
    distinct shared shingles (the n-gram-overlap decontamination check
    every pretraining pipeline runs).

    The benchmark's distinct shingle set is broadcast (benchmarks are
    KBs-to-MBs against a 100 TB corpus); the corpus shingle stream joins
    against it without shuffling itself.
    """
    corpus_grams = doc_word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    bench_grams = (
        doc_word_ngrams(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("g")
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def redact(
    df: DataFrame,
    col: str,
    pattern: str = "[0-9]{3,}",
    replacement: str = "#",
) -> DataFrame:
    """PII-style redaction: mask every match of ``pattern`` in ``col``
    and count the redactions per row. Stateless JVM regexp map — the
    narrowest possible operator, no shuffle, trivially 100 TB-safe."""
    return df.withColumn(
        f"{col}_redacted", F.regexp_replace(F.col(col), pattern, replacement)
    ).withColumn(
        "n_redactions", F.regexp_count(F.col(col), F.lit(pattern)).cast("long")
    )
