"""Registry queries for the training-data pipeline operators (build
mandate, beyond the reference's surface): sequence packing, repetition
signals, contamination checks, redaction, temperature domain mixing,
deterministic stratified splits, vocabulary coverage, corpus-trained
trigram quality scoring, token-budget accounting, and the composed
end-to-end curation pipeline. Each carries an exact DuckDB oracle that
recomputes the same deterministic result in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from ..operators.text_pipeline import (
    chunk_with_stride,
    contamination_check,
    domain_mix,
    epoch_shuffle,
    redact,
    trigram_familiarity,
    repetition_signals,
    sequence_pack,
    stratified_split,
    vocab_top_coverage,
)


@query(
    "txp_chunk_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    meta AS (
      SELECT doc_id, t,
             CAST(1 + ceil(greatest(len(t) - 32, 0) / 24.0) AS BIGINT)
               AS n_chunks
      FROM toks)
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * 24 AS BIGINT) AS start_tok,
           CAST(least(32, len(t) - i * 24) AS BIGINT) AS chunk_len,
           array_to_string(t[i*24 + 1 : i*24 + 32], ' ') AS chunk_text
    FROM meta, unnest(generate_series(0, n_chunks - 1)) AS u(i)
    """,
)
def txp_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document splitting: 32-token windows advancing by 24 tokens
    (8-token overlap), the context-length chunking step before packing.
    Pure per-row array program — zero shuffles."""
    docs = table(spark, sf_dir, "documents")
    return chunk_with_stride(docs, window=32, stride=24)


@query(
    "txp_epoch_shuffle",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS sort_key
      FROM documents)
    SELECT doc_id,
           CAST(sort_key % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY sort_key % 8
                                   ORDER BY sort_key, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM k
    """,
)
def txp_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (seed 7, 8 shards): md5-keyed global
    training order, reproducible across engines and reruns — what
    orderBy(rand()) cannot give a resumable pipeline. Per-shard rank is
    the epoch writer's shuffle-then-sort layout."""
    docs = table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, seed=7, n_shards=8)


@query(
    "txp_sequence_pack",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id % 8 AS shard
      FROM documents),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_tok
      FROM toks)
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start_tok / 64.0) AS BIGINT) AS seq_in_shard,
           CAST(start_tok % 64 AS BIGINT) AS offset_in_seq
    FROM packed
    """,
)
def txp_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of documents into 64-token training
    sequences, 8 shards packed independently (see
    operators/text_pipeline.py for the scale shape)."""
    docs = table(spark, sf_dir, "documents")
    return sequence_pack(docs, budget=64, n_shards=8)


@query(
    "txp_repetition",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    per_tok AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_count
      FROM per_tok GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, top_count,
           CAST(top_count AS DOUBLE) / n_tokens AS top_token_share,
           CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens
             AS dup_token_frac
    FROM per_doc
    """,
)
def txp_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals (duplicate-token fraction,
    top-token share) — the boilerplate filter of a pretraining pipeline."""
    docs = table(spark, sf_dir, "documents")
    return repetition_signals(docs)


@query(
    "txp_contamination",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
               || t[i+4] AS g
      FROM toks, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS u(i)),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10)
    SELECT c.doc_id, COUNT(*) AS n_shared_grams
    FROM grams c JOIN bench USING (g)
    WHERE c.doc_id >= 10
    GROUP BY c.doc_id
    """,
)
def txp_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus docs sharing a word 5-gram
    with the 'benchmark' (stand-in: doc_id < 10), by shared-shingle
    count. Benchmark shingles broadcast; corpus streams."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    return contamination_check(corpus, bench, n=5)


@query(
    "txp_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]{3,}', '#', 'g') AS c_name_redacted,
           CAST(len(regexp_extract_all(c_name, '[0-9]{3,}')) AS BIGINT)
             AS n_redactions
    FROM customer
    """,
)
def txp_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking of long digit runs in customer names, with a
    per-row redaction count. (Spark regexp_replace is global by
    default; DuckDB needs the 'g' flag — pinned here.)"""
    cu = table(spark, sf_dir, "customer")
    return redact(cu, "c_name", pattern="[0-9]{3,}").select(
        "c_custkey", "c_name_redacted", "n_redactions"
    )


@query(
    "txp_incremental_dedup",
    oracle="""
    WITH prior AS (
      SELECT DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id < 250),
    batch AS (
      SELECT doc_id,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id >= 250)
    SELECT b.doc_id, b.fp
    FROM batch b ANTI JOIN prior p ON b.fp = p.fp
    """,
)
def txp_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW batch (doc_id >= 250) deduplicated
    against the fingerprint store of the prior corpus (doc_id < 250) —
    the shape every continuously-ingesting pipeline runs. Left-anti
    join on the normalized content fingerprint; at 100 TB the
    fingerprint store is a compact table keyed on fp, and the join
    shuffles only (fp, doc_id) pairs."""
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    prior = docs.filter(F.col("doc_id") < 250).select(fp.alias("fp")).distinct()
    batch = docs.filter(F.col("doc_id") >= 250).select("doc_id", fp.alias("fp"))
    return batch.join(prior, "fp", "left_anti").select("doc_id", "fp")


@query(
    "txp_training_set",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, text,
             length(text) AS nc,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nt,
             md5(text) AS fp
      FROM documents),
    keep_fp AS (SELECT fp, MIN(doc_id) AS keep_id FROM s GROUP BY fp),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM s),
    grams AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
               || t[i+4] AS g
      FROM toks, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS u(i)),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
    contaminated AS (
      SELECT DISTINCT c.doc_id FROM grams c JOIN bench USING (g)
      WHERE c.doc_id >= 10)
    SELECT s.doc_id, s.nt AS n_tokens
    FROM s
    JOIN keep_fp k ON k.fp = s.fp AND k.keep_id = s.doc_id
    ANTI JOIN contaminated c ON c.doc_id = s.doc_id
    WHERE s.lang = 'en'
      AND s.doc_id >= 10
      AND s.nt >= 20
      AND s.nc BETWEEN 50 AND 600
    """,
)
def txp_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set assembly — the composition every
    pretraining pipeline runs, as ONE Catalyst plan: language filter,
    quality bands (token count, length), exact dedup (keep lowest
    doc_id per content fingerprint), benchmark decontamination
    (anti-join on shared 5-grams vs the doc_id<10 stand-in benchmark),
    emitting (doc_id, n_tokens) ready for sequence packing. Everything
    is built-ins: one agg for the fingerprint keeper, one broadcast
    anti-join for contamination, filters pushed to the scan."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "lang",
        "text",
        F.length("text").cast("long").alias("nc"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0))
        .cast("long")
        .alias("nt"),
        F.md5("text").alias("fp"),
    )
    keep = s.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    contaminated = contamination_check(corpus, bench, n=5).select("doc_id")
    return (
        s.filter(
            (F.col("lang") == "en")
            & (F.col("doc_id") >= 10)
            & (F.col("nt") >= 20)
            & F.col("nc").between(50, 600)
        )
        .join(keep, "fp")
        .filter(F.col("keep_id") == F.col("doc_id"))
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", F.col("nt").alias("n_tokens"))
    )


@query(
    "txp_domain_mix",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    rates AS (
      SELECT lang, n_docs,
             sqrt((SELECT MIN(n_docs) FROM counts) / CAST(n_docs AS DOUBLE))
               AS rate
      FROM counts),
    kept AS (
      SELECT d.lang, COUNT(*) AS n_kept
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
                 AS BIGINT) / 1152921504606846976.0 < r.rate
      GROUP BY d.lang)
    SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept, r.rate
    FROM rates r LEFT JOIN kept k ON r.lang = k.lang
    ORDER BY r.lang
    """,
)
def txp_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixing (alpha=0.5, the XLM-R
    sampling rule): head languages are deterministically downsampled at
    rate (n_min/n_lang)^0.5 via the md5 hash-unit — reproducible across
    engines and reruns, no RNG. See operators/text_pipeline.domain_mix
    for the 100 TB shape (tiny broadcast rate table; corpus never
    shuffles)."""
    docs = table(spark, sf_dir, "documents")
    return domain_mix(docs, domain_col="lang", alpha=0.5)


@query(
    "txp_stratified_split",
    oracle="""
    SELECT lang AS stratum,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) / 1152921504606846976.0 < 0.1
                THEN 'val' ELSE 'train' END AS split,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY stratum, split
    ORDER BY stratum, split
    """,
)
def txp_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split with per-language accounting.
    Hash-based membership is stable under corpus growth — an existing
    document never migrates between splits when new data arrives, the
    invariant incremental training needs (rand()/TABLESAMPLE cannot
    give it)."""
    docs = table(spark, sf_dir, "documents")
    return stratified_split(docs, strata_col="lang", val_frac=0.1)


@query(
    "txp_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    top AS (
      SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
      FROM counts ORDER BY cnt DESC, token LIMIT 100)
    SELECT CAST(rank AS INTEGER) AS rank, token, cnt,
           CAST(SUM(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                AS DOUBLE)
             / (SELECT SUM(cnt) FROM counts) AS cum_share
    FROM top ORDER BY rank
    """,
)
def txp_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget analysis: top-100 corpus tokens by global
    frequency with the cumulative share of all token occurrences (the
    Zipf coverage curve). The top-k is a distributed
    TakeOrderedAndProject, not a vocabulary-wide sort — see
    operators/text_pipeline.vocab_top_coverage."""
    docs = table(spark, sf_dir, "documents")
    return vocab_top_coverage(docs, top_k=100)


@query(
    "txp_trigram_familiarity",
    oracle="""
    WITH tri AS (
      SELECT doc_id, substr(text, s.i, 3) AS g
      FROM documents, unnest(generate_series(1, length(text) - 2)) AS s(i)
      WHERE length(text) >= 3),
    model AS (
      SELECT g FROM (
        SELECT g, COUNT(*) AS c FROM tri GROUP BY g
        ORDER BY c DESC, g LIMIT 500)),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tri,
             CAST(SUM(CASE WHEN m.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
      FROM tri t LEFT JOIN model m ON t.g = m.g
      GROUP BY t.doc_id)
    SELECT doc_id, n_tri, n_hits,
           n_hits / CAST(n_tri AS DOUBLE) AS familiarity
    FROM scored ORDER BY doc_id
    """,
)
def txp_trigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring, CCNet-shaped but exact: a character
    trigram model is TRAINED on the corpus itself (global trigram
    counts, top-500 head kept), then every document is scored by the
    fraction of its trigrams that the model recognizes — unfamiliar
    character soup scores low, prose in the corpus's languages scores
    high. Integer hit-counting instead of log-probabilities keeps the
    score bit-exact across engines (one final double division).

    Scale shape: train = explode + count on the trigram key (map-side
    partials; key space is bounded by charset^3) + distributed top-k;
    score = ONE zero-shuffle corpus scan folding each doc's trigrams
    against the model head as a literal map. The only collect is the
    head itself — bounded by model_size (500), never by corpus size
    (the Druid-lookup posture; measured 3x over the old
    explode+join+re-aggregate score pass at 1M docs)."""
    docs = table(spark, sf_dir, "documents")
    return trigram_familiarity(docs, model_size=500)


@query(
    "txp_token_budget",
    oracle="""
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang)
    SELECT source, lang, n_docs, n_tokens,
           n_tokens / CAST((SELECT SUM(n_tokens) FROM per) AS DOUBLE)
             AS token_share
    FROM per ORDER BY source, lang
    """,
)
def txp_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture accounting: per (source, language) document and
    token totals with each cell's share of the whole token budget — the
    table every dataset card and mixture-rebalancing decision starts
    from. One aggregate over integer token counts (exact under any
    partitioning) plus a broadcast of the single-row grand total."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("total_tokens"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") / F.col("total_tokens")).alias("token_share"),
        )
        .orderBy("source", "lang")
    )


@query(
    "txp_curation_pipeline",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, text, md5(text) AS fp,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS nt
      FROM documents),
    keep_fp AS (SELECT fp, MIN(doc_id) AS keep_id FROM s GROUP BY fp),
    counts AS (SELECT lang, COUNT(*) AS n_docs FROM s GROUP BY lang),
    rates AS (
      SELECT lang,
             sqrt((SELECT MIN(n_docs) FROM counts) / CAST(n_docs AS DOUBLE))
               AS rate
      FROM counts)
    SELECT s.doc_id, s.lang,
           CASE WHEN CAST('0x' || substr(md5('split:' ||
                        CAST(s.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                     / 1152921504606846976.0 < 0.1
                THEN 'val' ELSE 'train' END AS split,
           s.nt AS n_tokens
    FROM s
    JOIN keep_fp k ON k.fp = s.fp AND k.keep_id = s.doc_id
    JOIN rates r ON r.lang = s.lang
    WHERE s.nt >= 20
      AND CAST('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) / 1152921504606846976.0 < r.rate
    ORDER BY s.doc_id
    """,
)
def txp_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern curation recipe as ONE Catalyst plan: exact dedup
    (keep lowest doc_id per content fingerprint) -> quality floor
    (>= 20 tokens) -> temperature language mix (alpha=0.5, md5
    hash-unit membership) -> deterministic 90/10 train/val split on an
    INDEPENDENTLY-salted hash (the 'split:' salt decorrelates split
    membership from mix membership — reusing one hash would make val
    systematically under-sampled from downsampled languages). Emits
    (doc_id, lang, split, n_tokens) ready for sequence packing.

    Scale shape: one aggregate for the fingerprint keeper, one tiny
    broadcast rate table, stateless hash filters — the corpus is
    shuffled exactly once (on fp)."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("fp"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0))
        .cast("long")
        .alias("nt"),
    )
    keep = s.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    counts = s.groupBy("lang").agg(F.count("*").alias("n_docs"))
    min_n = counts.agg(F.min("n_docs").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang", F.sqrt(F.col("min_n") / F.col("n_docs")).alias("rate")
    )
    unit = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
        / F.lit(float(16**15))
    )
    mix_u = unit(F.col("doc_id").cast("string"))
    split_u = unit(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    return (
        s.join(keep, "fp")
        .filter(F.col("keep_id") == F.col("doc_id"))
        .join(F.broadcast(rates), "lang")
        .filter((F.col("nt") >= 20) & (mix_u < F.col("rate")))
        .select(
            "doc_id",
            "lang",
            F.when(split_u < 0.1, "val").otherwise("train").alias("split"),
            F.col("nt").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "txp_group_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 15) AS BIGINT),
                        doc_id) AS rnk
      FROM documents)
    SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    ORDER BY lang, rnk
    """,
)
def txp_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k sample per stratum (k=10 docs per
    language): rank rows inside each stratum by their md5 hash value
    and keep the k smallest — a reproducible per-domain holdout that,
    unlike reservoir sampling, yields the SAME k documents on every
    engine, run, and (mostly) under corpus growth. One window per
    stratum; stratum cardinality provides the parallelism, and per-row
    window state is a single counter."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = W.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select(
            "lang", "doc_id", F.row_number().over(w).cast("long").alias("rnk")
        )
        .filter(F.col("rnk") <= 10)
        .orderBy("lang", "rnk")
    )


@query(
    "txp_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    pairs AS (
      SELECT substr(w, s.i, 2) AS pair
      FROM words, unnest(generate_series(1, length(w) - 1)) AS s(i)
      WHERE length(w) >= 2),
    counts AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair)
    SELECT pair, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
    FROM counts
    ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def txp_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-training primitive: global adjacent character-pair
    frequencies within words — each top pair is what a BPE trainer
    would merge next. One explode to word-internal pairs, one count on
    the pair key (bounded by charset^2, map-side partials absorb
    duplicates), distributed top-20 with a deterministic (count desc,
    pair asc) tie-break. The iterative merge loop is a driver-side
    re-run of this primitive on re-tokenized text; the heavy lifting —
    this counting pass — is the distributed part."""
    words = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), "pair").limit(20)
    from pyspark.sql import Window as W

    return top.select(
        "pair",
        "cnt",
        F.row_number()
        .over(W.orderBy(F.col("cnt").desc(), "pair"))
        .cast("long")
        .alias("rank"),
    ).orderBy("rank")


@query(
    "txp_markup_strip",
    oracle="""
    WITH h AS (
      SELECT doc_id, text,
             '<div class="doc" id="d' || CAST(doc_id AS VARCHAR)
               || '"><p>' || replace(text, ' ', '&#32;')
               || '</p><br/></div>' AS html
      FROM documents),
    c AS (
      SELECT doc_id, text, html,
             replace(regexp_replace(html, '<[^>]*>', '', 'g'),
                     '&#32;', ' ') AS cleaned
      FROM h)
    SELECT doc_id,
           CAST(length(html) AS BIGINT) AS n_html,
           CAST(length(cleaned) AS BIGINT) AS n_clean,
           CAST(cleaned = text AS BIGINT) AS roundtrip_ok
    FROM c
    """,
)
def txp_markup_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping for web-corpus cleaning: tag removal + entity
    decoding as a stateless regexp map — no shuffle at all, the shape
    an HTML-heavy crawl cleanup runs over every page. The testdata has
    no markup, so the query first wraps each document in deterministic
    tags/entities (same expression both engines) and then proves the
    cleaner inverts it exactly (roundtrip_ok = 1 for every row)."""
    docs = table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="doc" id="d'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'),
        F.replace(F.col("text"), F.lit(" "), F.lit("&#32;")),
        F.lit("</p><br/></div>"),
    )
    h = docs.select("doc_id", "text", html.alias("html"))
    cleaned = F.replace(
        F.regexp_replace(F.col("html"), "<[^>]*>", ""),
        F.lit("&#32;"),
        F.lit(" "),
    )
    return h.select(
        "doc_id",
        F.length("html").cast("bigint").alias("n_html"),
        F.length(cleaned).cast("bigint").alias("n_clean"),
        (cleaned == F.col("text")).cast("bigint").alias("roundtrip_ok"),
    )


@query(
    "txp_url_extract",
    oracle="""
    WITH pages AS (
      SELECT doc_id,
             'Fetched from https://' || source || '.example.com/corpus/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || ' and mirrored at http://mirror.' || source
               || '.example.org/' || CAST(doc_id AS VARCHAR)
               || ' ' || text AS page
      FROM documents),
    u AS (
      SELECT doc_id,
             unnest(regexp_extract_all(page, 'https?://[^ ]+')) AS url
      FROM pages)
    SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM u
    GROUP BY 1 ORDER BY domain
    """,
)
def txp_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain rollup — the provenance census a
    web-corpus curation pass runs before domain filtering. URLs are
    synthesized deterministically from document metadata (the testdata
    carries none), extracted with regexp_extract_all, and the host
    comes from Spark's native parse_url (a built-in DuckDB lacks — the
    oracle proves the regexp form is value-identical). Scale: stateless
    extract + one map-side-combined groupBy on the bounded domain key."""
    docs = table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("Fetched from https://"),
        F.col("source"),
        F.lit(".example.com/corpus/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit(" and mirrored at http://mirror."),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        F.col("text"),
    )
    u = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(page, F.lit("https?://[^ ]+"), 0)
        ).alias("url"),
    )
    return (
        u.select("doc_id", F.parse_url(F.col("url"), F.lit("HOST")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("domain")
    )

@query(
    "txp_quality_median_cut",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nt
      FROM documents),
    h AS (SELECT lang, nt, count(*) AS c FROM s GROUP BY lang, nt),
    cums AS (
      SELECT lang, nt, c,
             SUM(c) OVER (PARTITION BY lang ORDER BY nt DESC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY lang) AS total
      FROM h),
    thr AS (
      SELECT lang, MAX(nt) AS thr, MAX(total) AS n_docs
      FROM cums WHERE cum >= (total + 1) // 2 GROUP BY lang),
    k AS (
      SELECT s.lang, s.nt, t.thr, t.n_docs
      FROM s JOIN thr t USING (lang) WHERE s.nt >= t.thr)
    SELECT lang,
           CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           CAST(MAX(thr) AS BIGINT) AS nt_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(nt) AS BIGINT) AS kept_tokens
    FROM k GROUP BY lang ORDER BY lang
    """,
)
def txp_quality_median_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language median-quality retention — the RELATIVE curation
    cut beside txp_curation_pipeline's absolute quality floor: every
    language keeps its docs at or above its own median token count
    (fixed retention shape per language regardless of how the
    absolute distributions differ; the standard move when languages
    have incomparable quality scales).

    The per-group EXACT median at 100 TB without a per-doc sort: the
    scores are small integers, so the cut computes on a (lang, nt)
    HISTOGRAM — map-side-combined counts, a running-sum window over
    the tiny histogram (rows = distinct nt per lang, not docs), and
    the threshold = the largest nt whose descending cumulative count
    reaches half the group. The full corpus is touched by exactly two
    stateless passes (histogram build, threshold filter via broadcast
    join); no window ever sees a per-document row, so low-cardinality
    lang partitions can't bottleneck. Ties at the threshold keep ALL
    their docs (a value threshold, not a rank cut) — deterministic
    and integer-exact in both engines."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", "lang",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0)
        ).cast("long").alias("nt"),
    )
    h = s.groupBy("lang", "nt").agg(F.count("*").alias("c"))
    wd = (
        W.partitionBy("lang")
        .orderBy(F.col("nt").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cums = h.select(
        "lang", "nt",
        F.sum("c").over(wd).alias("cum"),
        F.sum("c").over(W.partitionBy("lang")).alias("total"),
    )
    thr = (
        cums.filter(F.col("cum") >= F.expr("(total + 1) div 2"))
        .groupBy("lang")
        .agg(F.max("nt").alias("thr"), F.max("total").alias("n_docs"))
    )
    kept = s.join(F.broadcast(thr), "lang").filter(
        F.col("nt") >= F.col("thr")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("thr").alias("nt_threshold"),
            F.count("*").alias("n_kept"),
            F.sum("nt").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "txp_lm_familiarity_filter",
    oracle="""
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM documents),
    grams AS (
      SELECT doc_id, source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 0)))
        AS u(i)),
    model AS (SELECT g, COUNT(*) AS cnt FROM grams
              WHERE source = 'src1' GROUP BY g)
    SELECT d.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(COALESCE(m.cnt, 0)) AS DOUBLE) / COUNT(*)
             AS familiarity,
           SUM(COALESCE(m.cnt, 0)) * 2 >= COUNT(*) AS keep
    FROM grams d LEFT JOIN model m ON d.g = m.g
    GROUP BY d.doc_id
    """,
)
def txp_lm_familiarity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering, the reference-model shape
    (Wenzek et al. 2019: score every document under a language model
    trained on a trusted reference corpus; keep the low-perplexity
    side). Distinct from txp_trigram_familiarity on all three axes:
    the model trains on a TRUSTED SLICE rather than the whole corpus,
    scores are count-WEIGHTED (frequency mass, a likelihood proxy)
    rather than head-membership fractions, and the row carries the
    KEEP/DROP decision a curation pipeline consumes, not just a
    score. A word-trigram model counts over the reference slice
    (source = 'src1' here), every document scores its trigram MULTISET
    against it, and the keep decision is familiarity = mean model
    count >= 0.5 — evaluated as the integer cross-product
    ``2 * sum(cnt) >= n_grams``, so the cut is exact (no float
    threshold crossing engines differently; the surfaced familiarity
    double is one division of exact integers). The model is
    broadcast by construction — a reference corpus is a bounded
    curated set (CCNet's is one Wikipedia snapshot), so the join ships
    the model, never the corpus. Documents shorter than 3 tokens have
    no trigrams and drop from the output (documented; the oracle
    agrees). One gram explode feeds both the model aggregate and the
    scoring join — Catalyst reuses the scan."""
    from ..operators import spread

    docs = table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    idx = F.when(
        F.size(t) >= 3, F.sequence(F.lit(1), F.size(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    gram_arr = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, 3)))
    # spread() before the gram explode (r12): the model aggregate and
    # the scoring join both re-evaluate this lineage, and a single-file
    # corpus would run each explode on one core
    grams = spread(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", F.explode(gram_arr).alias("g")
    )
    model = (
        grams.filter(F.col("source") == "src1")
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    fam = F.coalesce(F.col("cnt"), F.lit(0))
    return (
        grams.join(F.broadcast(model), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(fam).alias("_fam_sum"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_fam_sum").cast("double") / F.col("n_grams")).alias(
                "familiarity"
            ),
            ((F.col("_fam_sum") * 2) >= F.col("n_grams")).alias("keep"),
        )
    )


@query(
    "txp_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                  || t[i+3] || ' ' || t[i+4] AS g
      FROM toks, unnest(generate_series(1, greatest(len(t) - 4, 0)))
        AS u(i)),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src2'),
    cand AS (SELECT doc_id, g FROM grams WHERE source <> 'src2')
    SELECT c.doc_id,
           COUNT(*) AS n_grams,
           COUNT(b.g) AS n_shared,
           COUNT(b.g) > 0 AS contaminated
    FROM cand c LEFT JOIN bench b USING (g)
    GROUP BY c.doc_id
    """,
)
def txp_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/text_pipeline.py
    decontaminate): flag every training document sharing a word 5-gram
    with the benchmark slice (source = 'src2' stands in for the eval
    suite) — the train/eval overlap gate of the GPT-3 paper's 13-gram
    dedup and every serious pipeline since. The benchmark gram set is
    bounded by the eval suite and broadcasts; candidates explode
    DISTINCT grams JVM-side; the corpus never shuffles by gram.
    Documents shorter than 5 tokens have no 5-grams and drop from the
    output (documented; the oracle agrees)."""
    from ..operators.text_pipeline import decontaminate

    return decontaminate(table(spark, sf_dir, "documents"))


@query(
    "txp_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 <> 0
                     THEN ' mail u' || doc_id || '@ex'
                          || (doc_id % 5) || '.org'
                     ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                     THEN ' tel 415-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
             || ' host 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
               AS text
      FROM documents),
    s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS n_email,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
      FROM aug),
    s2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1, '\\b\\d{3}-\\d{3}-\\d{4}\\b'))
               AS n_phone,
             regexp_replace(t1, '\\b\\d{3}-\\d{3}-\\d{4}\\b',
               '<PHONE>', 'g') AS t2
      FROM s1),
    scrub AS (
      SELECT doc_id, n_email, n_phone,
             len(regexp_extract_all(t2,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
               AS n_ipv4,
             regexp_replace(t2,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
               '<IPV4>', 'g') AS scrubbed
      FROM s2)
    SELECT doc_id,
           CAST(n_email AS BIGINT) AS n_email,
           CAST(n_phone AS BIGINT) AS n_phone,
           CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(len(scrubbed) AS BIGINT) AS scrub_len,
           md5(scrubbed) AS scrub_md5
    FROM scrub
    """,
)
def txp_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/text_pipeline.py pii_scrub): email /
    phone / IPv4 redaction with per-kind counts. The synthetic corpus
    carries no PII, so the query plants deterministic doc_id-derived
    PII first (emails on 2/3 of docs, phones on evens, an IPv4 on
    every doc) — both engines augment identically, so the scrubbed
    text md5 pins every replacement byte-for-byte. The whole pass is
    regexp column expressions inside the scan's project: zero
    shuffles, zero Python — the floor cost for a redaction pass at
    100 TB is the scan itself. Patterns are Java-regex/RE2 common
    subset (no lookaround, no backreferences)."""
    from ..operators.text_pipeline import pii_scrub

    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 != 0,
                F.concat(F.lit(" mail u"), did.cast("string"),
                         F.lit("@ex"), (did % 5).cast("string"),
                         F.lit(".org")),
            ).otherwise(F.lit("")),
            F.when(
                did % 2 == 0,
                F.concat(F.lit(" tel 415-555-"),
                         F.lpad((did % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.lit(" host 10."), (did % 256).cast("string"),
            F.lit(".0."), (did % 100).cast("string"),
        ).alias("text"),
    )
    out = pii_scrub(aug)
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ipv4",
        F.length("scrubbed").cast("long").alias("scrub_len"),
        F.md5(F.col("scrubbed").cast("binary")).alias("scrub_md5"),
    )
