"""Training-data pipeline operators beyond analysis: sequence packing,
repetition signals, benchmark-contamination checks, PII-style
redaction, and the curation layer (hash-unit sampling, temperature
domain mixing, stratified splits, vocabulary coverage). All pure
DataFrame compositions over JVM built-ins — these run inside
whole-stage codegen and distribute by construction.

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


def hash_unit(*cols) -> F.Column:
    """Deterministic uniform-[0,1) value from row keys: first 15 hex
    chars of md5 over the ':'-joined keys, scaled by 16^15. Engine- and
    run-independent (md5 of UTF-8 bytes is identical everywhere), so a
    sampling decision is reproducible across Spark, DuckDB, and reruns —
    the property RNG-based sampling (rand(), TABLESAMPLE) cannot give a
    pipeline that must be re-runnable over a growing 100 TB corpus."""
    h = F.substring(F.md5(F.concat_ws(":", *[F.col(c) for c in cols])), 1, 15)
    return F.conv(h, 16, 10).cast("long") / F.lit(float(16**15))


def domain_mix(
    docs: DataFrame,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-weighted domain mixing (the multilingual-sampling rule
    of XLM-R / mT5, alpha<1 flattens the domain distribution): domain d
    with n_d docs is downsampled at rate (n_min/n_d)^(1-alpha), so the
    rarest domain keeps everything and head domains shrink toward the
    flattened mix. Membership is decided per row by ``hash_unit`` — no
    RNG, reproducible, and the filter is a stateless map.

    Scale shape: the rate table is one tiny aggregate (|domains| rows)
    broadcast back onto the corpus; the corpus itself is never shuffled.
    Returns per-domain totals, kept counts, and the applied rate.
    """
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    min_n = counts.agg(F.min("n_docs").alias("min_n"))
    ratio = F.col("min_n") / F.col("n_docs")
    # sqrt is IEEE-correctly-rounded in every engine; pow(x, 0.5) is not
    # guaranteed to be (Java Math.pow is 1-ulp) — and rate is an output
    # column compared bit-exactly against the DuckDB oracle.
    exponent = 1.0 - alpha
    rate = F.sqrt(ratio) if exponent == 0.5 else F.pow(ratio, F.lit(exponent))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        domain_col, "n_docs", rate.alias("rate")
    )
    kept = (
        docs.join(F.broadcast(rates), domain_col)
        .filter(hash_unit(id_col) < F.col("rate"))
        .groupBy(domain_col)
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, domain_col, "left")
        .select(
            domain_col,
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            "rate",
        )
        .orderBy(domain_col)
    )


def stratified_split(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    val_frac: float = 0.1,
) -> DataFrame:
    """Deterministic train/validation split with per-stratum accounting:
    a row lands in 'val' iff hash_unit(id) < val_frac, which is stable
    under corpus growth (adding documents never moves an existing one
    between splits — the property a random split lacks and incremental
    training pipelines require). Returns per (stratum, split) counts so
    stratification quality is visible. Stateless map + one aggregate."""
    split = F.when(hash_unit(id_col) < F.lit(val_frac), "val").otherwise("train")
    return (
        docs.select(F.col(strata_col).alias("stratum"), split.alias("split"))
        .groupBy("stratum", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("stratum", "split")
    )


def vocab_top_coverage(
    docs: DataFrame,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary head analysis for tokenizer budgeting: global
    whitespace-token frequencies, top-``top_k`` by (count desc, token
    asc — the tie-break makes rank deterministic), each with its
    cumulative share of ALL token occurrences (Zipf coverage curve).

    Scale shape: explode -> two-level count on the token key (map-side
    partial aggregation absorbs the per-partition duplicates, so the
    shuffle carries one row per distinct token per partition, not one
    per occurrence); the top-k is orderBy+limit, which Spark executes as
    a distributed TakeOrderedAndProject (per-partition heaps merged on
    the driver — NOT a single-partition sort of the vocabulary); only
    the k surviving rows see a window. No global sort anywhere."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(top_k)
    w = W.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "cnt",
            (
                F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, 0))
                / F.col("total")
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


def chunk_with_stride(
    docs: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into fixed ``window``-token chunks advancing
    by ``stride`` tokens (overlap = window - stride) — the long-document
    splitting step a context-length-bounded training pipeline runs before
    packing. A document of n tokens yields 1 + ceil(max(n - window, 0) /
    stride) chunks; the final chunk is short iff the tail is, and every
    token appears in at least one chunk.

    Scale shape: a pure per-row array program (split -> sequence ->
    transform/slice -> explode) — no shuffle at all; output size is
    input size x ~(window/stride) and streams through whole-stage
    codegen. Returns (doc_id, chunk_id, start_tok, chunk_len,
    chunk_text) with start_tok 0-based.
    """
    if stride > window:
        raise ValueError(
            f"stride ({stride}) > window ({window}) would silently drop "
            "the tokens between chunk ends and the next chunk start, "
            "breaking the every-token-covered invariant"
        )
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - window, F.lit(0)) / F.lit(float(stride))
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride).alias("start_tok"),
            F.least(F.lit(window), n - i * stride).cast("long").alias("chunk_len"),
            F.concat_ws(
                " ", F.slice(t, (i * stride + 1).cast("int"), window)
            ).alias("chunk_text"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select("doc_id", "c.*")


def epoch_shuffle(
    docs: DataFrame,
    seed: int = 0,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle for one epoch: every
    document gets a pseudorandom 60-bit sort key from md5(seed:doc_id),
    a shard = key mod ``n_shards``, and a dense position within its
    shard. Changing ``seed`` reshuffles the whole corpus; the same seed
    always reproduces the same order on any engine — the property
    ``df.orderBy(rand())`` cannot give a resumable pipeline.

    Scale shape: the only heavy operation is the per-shard rank, a
    window partitioned on ``shard`` — i.e. exactly the shuffle-then-
    sort-within-partition layout the epoch writer needs anyway (one
    sorted file per shard). Set ``n_shards`` to the output shard count
    (thousands at 100 TB) and each shard's sort fits one task; no
    global sort or single-partition stage exists.
    """
    from .dedup import md5_hash60

    key = md5_hash60(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    ranked = docs.select(
        F.col(id_col).alias("doc_id"),
        key.alias("sort_key"),
        F.pmod(key, F.lit(n_shards)).cast("long").alias("shard"),
    )
    w = W.partitionBy("shard").orderBy("sort_key", "doc_id")
    return ranked.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


def trigram_familiarity(
    docs: DataFrame,
    model_size: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained character-trigram quality score: global trigram
    counts, top-``model_size`` head kept (count desc, trigram asc — the
    tie-break makes the model deterministic), each document scored by
    the fraction of its trigram occurrences the model recognizes.
    Integer hit counting keeps the score bit-exact across engines; the
    only float op is one final division.

    Scale shape: train = ONE explode + count on the trigram key
    (bounded by charset^3, map-side partials) + distributed top-k;
    score = a zero-shuffle, zero-explode scan folding each document's
    trigrams against the model head as a literal map (element_at hash
    probe inside codegen). The head is collected driver-side — bounded
    by ``model_size``, never by corpus size: the same heap-resident
    posture as a Druid lookup (operators/lookup.py), and what removes
    the old second explode (corpus chars × 3 rows) plus its per-trigram
    join and per-doc aggregation shuffle from the hot path. Docs
    shorter than 3 chars have no trigrams and are excluded (score
    undefined)."""
    # spread() both corpus passes: a single-file corpus would otherwise
    # run the trigram explode AND the per-doc fold on one core (r12
    # measurement: 5.1 s -> parallel across the cluster; the narrow
    # (id, text) shuffle it costs is the same trade every dedup/
    # similarity operator already makes — operators/__init__.spread)
    from . import spread

    scored_src = spread(docs.filter(F.length(text_col) >= 3))
    tri = scored_src.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - 2),"
                f" i -> substring({text_col}, i, 3))"
            )
        ).alias("g"),
    )
    head = [
        r[0]
        for r in (
            tri.groupBy("g")
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), "g")
            .limit(model_size)
            .select("g")
            .collect()
        )
    ]
    if head:
        gmap = F.create_map(
            *[lit for g in head for lit in (F.lit(g), F.lit(1))]
        )
        hit = lambda g: F.coalesce(  # noqa: E731
            F.element_at(gmap, g).cast("long"), F.lit(0).cast("long")
        )
    else:  # corpus with no trigrams at all: every score is 0
        hit = lambda g: F.lit(0).cast("long")  # noqa: E731
    tri_arr = F.transform(
        F.sequence(F.lit(1), F.length(text_col) - 2),
        lambda i: F.col(text_col).substr(i, F.lit(3)),
    )
    return (
        scored_src
        .select(
            F.col(id_col).alias("doc_id"),
            (F.length(text_col) - 2).cast("long").alias("n_tri"),
            F.aggregate(
                tri_arr,
                F.lit(0).cast("long"),
                lambda acc, g: acc + hit(g),
            ).alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_tri",
            "n_hits",
            (F.col("n_hits") / F.col("n_tri")).alias("familiarity"),
        )
        .orderBy("doc_id")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf weighting,
    idf as the rational surrogate N/(df+1) (cross-engine IEEE-exact —
    ln() is only ~1-ulp reproducible across libm builds; see
    queries/text_analysis.py for the oracle contract).

    Scale shape: tokenize -> map-side-combined (doc, term) counts ->
    document frequencies (second partial agg, |vocab| rows) -> join
    back on term (AQE broadcasts the vocab side when it fits) ->
    per-doc top-k via a row_number window partitioned by the
    high-cardinality doc id. No global sort anywhere."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / (F.col("df") + F.lit(1)))
            ).alias("score"),
        )
    )
    # Per-doc top-k WITHOUT a window: a row_number window must
    # shuffle-and-SORT every scored (doc, term) row globally by
    # (doc, score); instead fold each doc's terms into one array
    # (bounded by the doc's distinct-term count, i.e. its length — not
    # a hot-key risk) and sort those few elements in place. Measured
    # 94 s -> window vs array fold at 1M docs / 40M scored rows.
    # Sort key: (-score, term) = score desc, term asc; struct
    # comparison is field-lexicographic, and negating a double is
    # exact, so ranking matches the oracle's ORDER BY bit-for-bit.
    folded = scored.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("neg"),
                        F.col("term"),
                        F.col("tf"),
                        F.col("df"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return folded.select(
        "doc_id", F.posexplode("top").alias("pos", "t")
    ).select(
        "doc_id",
        F.col("t.term").alias("term"),
        F.col("t.tf").alias("tf"),
        F.col("t.df").alias("df"),
        (-F.col("t.neg")).alias("score"),
        (F.col("pos") + 1).cast("integer").alias("rn"),
    )


def keyword_search(
    docs: DataFrame,
    terms: tuple[str, ...],
    limit: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive keyword search: documents containing ALL ``terms``,
    ranked by summed tf-idf (same rational-idf contract as
    tfidf_top_terms). The term filter pushes below the (doc, term)
    count via inferred join filters — only the query terms' posting
    lists survive the first shuffle — and the final top-``limit`` is a
    TakeOrdered over the hit set, never a corpus sort."""
    # normalize the query the same way the corpus is tokenized:
    # lowercase (tokens are lowered below, so 'Spark' could never hit)
    # and dedupe (a repeated term would make the conjunctive n_terms ==
    # len(terms) check impossible to satisfy)
    terms = tuple(dict.fromkeys(t.lower() for t in terms))
    if not terms:
        raise ValueError("keyword_search requires at least one term")
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = F.col("tf").cast("double") * (
        F.col("n_docs").cast("double") / (F.col("df") + F.lit(1))
    )
    return (
        tf.filter(F.col("term").isin(*terms))
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"), F.sum(score).alias("rank_score"))
        .filter(F.col("n_terms") == len(terms))
        .orderBy(F.col("rank_score").desc(), "doc_id")
        .limit(limit)
    )

def bm25_search(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 ranking (disjunctive: documents matching ANY query
    term, scored over the terms they match) — the retrieval scorer
    search engines and RAG rerankers actually use, where tf-idf
    (keyword_search) is the teaching baseline: term frequency
    saturates at k1 and long documents are penalized toward the
    corpus-average length through b.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Scale shape: identical to keyword_search — the term filter pushes
    below the (doc, term) count so only the query terms' posting
    lists survive that shuffle; the doc-length table joins on the
    high-cardinality doc_id; N and avgdl are two scalar aggregates
    broadcast by crossJoin; the final top-``limit`` is a TakeOrdered
    over the hit set. Scores round to 9 decimals before ranking (the
    repo's cross-engine fp-stability device; the per-doc sum spans at
    most len(terms) addends — IEEE addition is commutative, so 2-term
    sums are order-exact)."""
    terms = tuple(dict.fromkeys(t.lower() for t in terms))
    if not terms:
        raise ValueError("bm25_search requires at least one term")
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    # avgdl over ALL documents (token-less docs count with dl=0):
    # exact integer token total / exact doc count, one double division
    ad = dl.agg(F.sum("dl").alias("tot")).crossJoin(F.broadcast(n)).select(
        (F.col("tot").cast("double") / F.col("n_docs")).alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    ratio = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.filter(F.col("term").isin(*terms))
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ad))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum(idf * ratio), 9).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(limit)
    )


def decontaminate(
    docs: DataFrame,
    bench_source: str = "src2",
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Benchmark decontamination — the train/eval overlap gate every
    LLM training pipeline runs before a corpus ships (the GPT-3 paper's
    13-gram dedup against eval sets; Llama/PaLM run the same shape):
    a document is CONTAMINATED if it shares any word n-gram with the
    benchmark slice (``source == bench_source`` stands in for the eval
    suite). Returns one row per non-benchmark document that HAS at
    least one n-gram — documents shorter than ``n`` tokens (or with
    NULL text/source) have nothing to overlap and drop from the
    output, so absence means "too short to check", not "clean"; gate
    on presence + flag, or pre-filter short docs. Columns: distinct
    n-grams, distinct n-grams also present in the benchmark, and the
    contaminated flag.

    Scale shape: the benchmark gram set is bounded by the EVAL SUITE's
    size, not the corpus (eval sets are thousands of documents at
    most), so it broadcasts; candidate documents explode their
    DISTINCT grams JVM-side (array_distinct before explode — shuffle
    rows bounded by distinct grams, repeats collapse early) and the
    contamination count is one broadcast left join + groupBy on the
    already-hash-partitioned doc key. The corpus is never shuffled by
    gram value."""
    from . import spread

    t = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram_arr = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    )
    # spread() before the gram explode (r12): both the benchmark-gram
    # extraction and the candidate pass share this lineage, and a
    # single-file corpus would run each on one core
    grams = spread(docs.select(id_col, source_col, text_col)).select(
        id_col, source_col, F.explode(gram_arr).alias("g")
    )
    bench = (
        grams.filter(F.col(source_col) == bench_source)
        .select("g").distinct()
        .withColumn("_hit", F.lit(1))
    )
    cand = grams.filter(F.col(source_col) != bench_source)
    return (
        cand.join(F.broadcast(bench), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_hit").alias("n_shared"),
        )
        .select(
            id_col, "n_grams", "n_shared",
            (F.col("n_shared") > 0).alias("contaminated"),
        )
    )


# PII patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB): plain character classes, no backreferences or
# lookaround (RE2 has neither).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing — the redaction pass a training corpus takes
    before anything ships: emails, North-American phone numbers, and
    IPv4 literals replaced by typed placeholders, with per-kind match
    counts so the pipeline can route high-PII documents to review
    instead of silently rewriting them.

    Scale shape: three regexp_replace + three regexp_count column
    expressions in the scan's own project — whole-stage codegen, zero
    shuffles, zero Python; the cost is a linear scan of the corpus,
    which is the floor for any redaction pass. Replacement order is
    email -> phone -> ipv4, and each kind COUNTS on the text as it
    stands at its stage, so every count equals the number of
    placeholders that kind actually inserted (an IPv4-shaped sequence
    inside an already-redacted email neither matches nor counts)."""
    cur = F.col(text_col)
    counts = []
    for k, p in PII_PATTERNS.items():
        counts.append(F.regexp_count(cur, F.lit(p)).alias(f"n_{k}"))
        cur = F.regexp_replace(cur, p, f"<{k.upper()}>")
    return docs.select(
        id_col,
        *counts,
        cur.alias("scrubbed"),
    )
