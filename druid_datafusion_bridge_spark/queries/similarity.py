"""Similarity-search query registrations (embeddings table).

Every entry carries an exact DuckDB oracle: the brute-force paths check
full scored results (cosines rounded to 9 decimals for cross-engine fp
stability); the approximate ANN paths check their recall CONTRACT — a
per-probe flag that the bucketed/IVF result recovers at least a floor
fraction of the exact brute-force top-k, which DuckDB asserts as
literal TRUE; near-dup checks the exact all-pairs threshold set.
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
    knn_graph,
    lsh_topk,
    range_search,
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
    # round BEFORE ranking (round_sim=9): the oracle ranks by
    # round(sim, 9) with vec_id tie-break, so Spark must rank in the
    # same rounded universe — two sims equal to 9 decimals would
    # otherwise tie-break by their raw 10th decimal here but by vec_id
    # there, flipping rows at the rank-5 cut
    out = brute_force_topk(emb, probes, k=5, round_sim=9)
    return out.select(
        "probe_id", "vec_id", "sim",
        F.col("rank").cast("long").alias("rank"),
    )


@query(
    "sim_range_search",
    oracle="""
    WITH probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS q
                    FROM embeddings WHERE vec_id < 5),
    corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT p.probe_id, c.vec_id,
             round(list_cosine_similarity(c.v, p.q), 9) AS sim
      FROM corpus c CROSS JOIN probes p
      WHERE c.vec_id <> p.probe_id)
    SELECT probe_id, vec_id, sim FROM scored WHERE sim >= 0.25
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search: EVERY neighbor with sim >= 0.25 for 5 probe
    vectors (threshold bounds quality, not output count — the near-dup
    sweep shape). One broadcast + one corpus pass, zero shuffles: the
    filter needs no ranking window at all."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )
    return range_search(emb, probes, threshold=0.25, round_sim=9)


@query(
    "sim_knn_graph",
    oracle="""
    WITH nodes AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 200),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(a.v, b.v), 9) AS sim
      FROM nodes a JOIN nodes b ON a.vec_id <> b.vec_id),
    ranked AS (
      SELECT src, dst, sim,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY sim DESC, dst) AS rk
      FROM scored),
    directed AS (SELECT src, dst, sim FROM ranked WHERE rk <= 5)
    SELECT d.src AS id_a, d.dst AS id_b, d.sim
    FROM directed d
    JOIN directed r ON r.src = d.dst AND r.dst = d.src
    WHERE d.src < d.dst
    """,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual cosine 5-NN graph over a 200-node slice: an undirected
    edge survives only if each endpoint ranks the other in its own
    top-5 (hub suppression for clustering/community dedup). Node-count
    bounded so the all-pairs oracle stays tractable; the operator's
    scale path swaps the scored self-join for LSH buckets."""
    emb = table(spark, sf_dir, "embeddings")
    return knn_graph(emb.filter(F.col("vec_id") < 200), k=5, round_sim=9)


def _probes(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )


def _recall_contract(ann: DataFrame, exact: DataFrame, floor: float) -> DataFrame:
    """Per-probe recall of an ANN result against the exact top-k, as an
    oracle-checkable flag column. Both inputs carry (probe_id, vec_id)."""
    hits = ann.select("probe_id", "vec_id").join(
        exact.select("probe_id", "vec_id"), ["probe_id", "vec_id"]
    )
    n_hits = hits.groupBy("probe_id").agg(F.count("*").alias("n_hit"))
    n_true = exact.groupBy("probe_id").agg(F.count("*").alias("n_true"))
    return (
        n_true.join(n_hits, "probe_id", "left")
        .select(
            "probe_id",
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")
                >= F.lit(floor)
            ).alias("recall_ok"),
        )
        .orderBy("probe_id")
    )


_PROBE_ORACLE = """
    SELECT vec_id AS probe_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY probe_id
"""


@query("sim_lsh_topk", oracle=_PROBE_ORACLE)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-10 for 5 probes (the 100 TB path: bucket
    pruning instead of full scan). The sketch result itself is
    approximate, so the oracle checks the recall CONTRACT: every probe's
    bucketed top-10 must recover >= 30% of the exact brute-force top-10
    (measured 40-90% across sf0.001-0.1; the flag pins the floor).
    DuckDB asserts the same flags as literal TRUE."""
    emb = table(spark, sf_dir, "embeddings")
    probes = _probes(emb)
    ann = lsh_topk(emb, probes, dim=64, k=10, bits=4)
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.3)


@query(
    "sim_embedding_neardup",
    oracle="""
    WITH c AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.vid AS id_a, b.vid AS id_b,
           round(list_cosine_similarity(a.v, b.v), 9) AS sim
    FROM c a JOIN c b ON a.vid < b.vid
    WHERE round(list_cosine_similarity(a.v, b.v), 9) >= 0.95
    """,
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= 0.95) within LSH
    buckets. The oracle recomputes the EXACT threshold pair set with an
    all-pairs join — every bucketed pair is rescored exactly before the
    threshold (precision 1 by construction), and near-identical vectors
    agree on all hyperplane signs, so the bucketed set matches the
    exact set on a near-dup corpus (and on this random corpus both are
    empty — verified non-vacuously in tests/test_similarity.py with
    planted duplicates)."""
    emb = table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.95, bits=4, dim=64).select(
        "id_a", "id_b", F.round(F.col("sim"), 9).alias("sim")
    )


@query("sim_ivf_topk", oracle=_PROBE_ORACLE)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for 5 probes: spherical-k-means coarse quantizer
    (16 cells), probe the 8 nearest cells. The second scale path beside
    LSH. Oracle = per-probe recall contract, floor 40% (measured
    50-100% across sf0.001-0.1).

    Why nprobe=8 and a 0.4 floor: the synthetic embeddings are i.i.d.
    random in 64-d — there is NO cluster structure, so any honest IVF's
    recall tracks the corpus fraction scored (nprobe/n_cells plus a
    small directional gain). Round 1 showed 0.88-1.0 recall at nprobe=4
    only because its placeholder centroids WERE the probe vectors (the
    probe's own cell trivially contains its neighborhood); with real
    k-means centroids that artifact disappears."""
    from ..operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    probes = _probes(emb)
    ann = ivf_topk(emb, probes, k=10, n_centroids=16, nprobe=8)
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.4)


@query(
    "sim_group_centroid",
    oracle="""
    WITH pos AS (
      SELECT d.lang,
             generate_subscripts(CAST(e.embedding AS DOUBLE[]), 1) AS dim_idx,
             unnest(CAST(e.embedding AS DOUBLE[])) AS x
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id)
    SELECT lang, CAST(dim_idx AS BIGINT) AS dim_idx,
           round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 9)
             AS centroid_val
    FROM pos GROUP BY lang, dim_idx
    """,
)
def sim_group_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding centroid (mean vector per language) — the
    mean-pooling / class-centroid op of an embedding pipeline, as
    posexplode + groupBy over (group, dim): fully JVM-side, shuffles
    (lang, dim_idx, partial-sum) only. Emitted as one row per
    dimension (no array output — harness-safe). Sums run in
    decimal(38,18) on both engines (order-independent); float inputs
    aren't exactly decimal-representable at that scale, so the final
    mean is rounded to 9 decimals — the same cross-engine fp-stability
    device the cosine oracles use."""
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "lang", F.posexplode(as_double_vec(F.col("embedding"))).alias("p", "x")
    )
    return joined.groupBy(
        "lang", (F.col("p") + 1).cast("long").alias("dim_idx")
    ).agg(
        F.round(
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
            / F.count("*"),
            9,
        ).alias("centroid_val")
    )


@query("sim_pq_adc_topk", oracle=_PROBE_ORACLE)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 for 5 probes with exact rerank
    (operators/similarity.py pq_adc_topk) — the third ANN scale path
    beside LSH and IVF, and the one that serves when the FLOATS don't
    fit: the corpus scan reads 4-byte codes and sums broadcast
    lookup-table entries; only the per-probe 200-row shortlist touches
    float vectors for the exact cosine rerank. Oracle = per-probe
    recall contract, floor 40% like IVF: the synthetic embeddings are
    i.i.d. random in 64-d, the hardest case for a product code (no
    subspace structure to exploit), so the shortlist's recall tracks
    how sharply 8 coded subdistances order 2000 random points
    (measured: min-probe recall 0.6 at sf0.1, 1.0 at sf0.001/0.01;
    codebook k-means is seeded and trains on a bounded deterministic
    sample, so these are stable margins — and at 100k synthetic
    vectors the whole call runs in ~22 s where full-corpus Spark-ML
    training took 200 s)."""
    from ..operators.similarity import pq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    probes = _probes(emb)
    ann = pq_adc_topk(emb, probes, k=10, shortlist=200, n_subspaces=8)
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.4)


@query(
    "sim_filtered_topk",
    oracle="""
    WITH probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS q
                    FROM embeddings WHERE vec_id < 5),
    corpus AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE d.lang = 'en'),
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
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the RAG serving shape ("nearest English
    documents"): a metadata predicate joined from the documents table
    restricts the corpus BEFORE any distance math (pre-filtering, not
    post-filtering a top-k that may then come back short). Scale shape:
    the lang predicate and the doc_id semi-join prune at the scan
    (Catalyst pushes the filter; the join is broadcast-eligible when
    the filtered id set is small, shuffle otherwise by AQE), so at
    100 TB you score exactly the matching slice, never the corpus.
    Exactly oracled like the unfiltered brute-force paths."""
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )
    allowed = docs.filter(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(allowed, "vec_id", "left_semi")
    out = brute_force_topk(corpus, probes, k=5, round_sim=9)
    return out.select(
        "probe_id", "vec_id", "sim",
        F.col("rank").cast("long").alias("rank"),
    )

@query("sim_ivfpq_topk", oracle=_PROBE_ORACLE)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed index top-10 for 5 probes (operators/
    similarity.py ivf_pq_topk) — the faiss-IndexIVFPQ shape that
    actually serves at billion-vector scale: the coarse quantizer
    prunes WHICH vectors are scored (nprobe=8 of 16 cells), product
    codes over the RESIDUALS decide HOW (broadcast-LUT byte scan, no
    floats), and an exact cosine pass reranks the 200-row shortlist.
    Both quantizers train on one bounded driver-side sample and
    freeze. Oracle = per-probe recall contract, floor 40% like the
    flat IVF and PQ paths: i.i.d. random 64-d embeddings are the
    no-structure worst case, and the two approximations compound
    (measured min-probe recall 0.5 at every sf in 0.001-0.1; seeded
    deterministic training keeps these stable margins)."""
    from ..operators.similarity import ivf_pq_topk

    emb = table(spark, sf_dir, "embeddings")
    probes = _probes(emb)
    ann = ivf_pq_topk(
        emb, probes, k=10, n_centroids=16, nprobe=8, shortlist=200,
        n_subspaces=8,
    )
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.4)


def _ivfpq_index_dir(
    sf_dir: str,
    emb: DataFrame,
    variant: str = "",
    build_fn=None,
    config: str = "c16_s8",
) -> str:
    """The persisted IVF+PQ index for a testdata dir, built once and
    cached under <tmpdir>/ddbs_ivfpq (honors TMPDIR; the repo's
    documented ``rm -rf /tmp/ddbs_*`` cleanup convention on a default
    host) with the scan mirrors' source-fingerprint stamp — plus the
    BUILD CONFIG, so changing n_centroids/n_subspaces or the variant's
    split can never serve a stale index built by older code. A repeat
    call serves the existing index instead of leaking a corpus-sized
    copy per invocation; a regenerated source rebuilds. Build lands in
    a temp dir and renames into place so a completed index is never
    observable half-built; if the shared cache dir is unusable
    (read-only, full), the build falls back to a mkdtemp-scoped index
    (the query still answers — _scan_mirror's fallback posture)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.similarity import ivf_pq_build

    def build(into: str) -> None:
        if build_fn is not None:
            build_fn(into)
        else:
            ivf_pq_build(emb, into, n_centroids=16, n_subspaces=8)

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    fp = f"v2:{config}{variant}:{st.st_size}:{st.st_mtime_ns}"
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), "ddbs_ivfpq")
    dest = os.path.join(base, tag + variant)
    stamp = os.path.join(dest, "_FINGERPRINT")
    try:
        with open(stamp, encoding="utf-8") as f:
            if f.read() == fp:
                return dest
    except OSError:
        pass
    tmp = f"{dest}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    # probe the cache dir's writability FIRST: the build itself fails
    # through Spark's writers (Py4JJavaError / AnalysisException, not
    # OSError) on a read-only or full cache dir, so the fallback must
    # trigger before any Spark write is attempted
    try:
        os.makedirs(tmp, exist_ok=True)
        probe = os.path.join(tmp, "_WRITABLE")
        with open(probe, "w", encoding="utf-8") as f:
            f.write("1")
        os.remove(probe)
    except OSError:
        # unusable shared cache: serve a session-scoped index instead
        shutil.rmtree(tmp, ignore_errors=True)
        fallback = tempfile.mkdtemp(prefix="ddbs_ivfpq_")
        build(fallback)
        return fallback
    try:
        build(tmp)
        with open(
            os.path.join(tmp, "_FINGERPRINT"), "w", encoding="utf-8"
        ) as f:
            f.write(fp)
    except OSError:
        # the probe passed but the build still hit an I/O edge (e.g.
        # disk filled mid-write): same session-scoped fallback
        shutil.rmtree(tmp, ignore_errors=True)
        fallback = tempfile.mkdtemp(prefix="ddbs_ivfpq_")
        build(fallback)
        return fallback
    try:  # a concurrent builder of the SAME fingerprint wins
        with open(stamp, encoding="utf-8") as f:
            if f.read() == fp:
                shutil.rmtree(tmp, ignore_errors=True)
                return dest
    except OSError:
        pass
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return dest


@query("sim_ivfpq_persisted", oracle=_PROBE_ORACLE)
def sim_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ with the index PERSISTED cell-partitioned and served by a
    partition-pruned scan — the ingest/serve split that actually runs
    at billion-vector scale (operators/similarity.py ivf_pq_build +
    ivf_pq_query). The build half trains on a bounded sample, encodes
    the corpus once, and writes codes/cell=N/ hive partitions (the
    faiss inverted-list layout as parquet); the query half computes the
    probed cells from the tiny centroids table and scans ONLY those
    partitions with a literal partition filter — ADC, shortlist, and
    the exact rerank all read the pruned scan, so non-probed inverted
    lists are never opened (plan-pinned by tests/test_plans.py::
    test_ivfpq_persisted_reads_only_probed_cells). Same quantizers,
    parameters, and recall contract (floor 40%) as sim_ivfpq_topk, so
    the split changes WHERE bytes are read, not the answer."""
    from ..operators.similarity import ivf_pq_build, ivf_pq_query

    emb = table(spark, sf_dir, "embeddings")
    probes = _probes(emb)
    idx = _ivfpq_index_dir(sf_dir, emb)
    ann = ivf_pq_query(spark, idx, probes, k=10, nprobe=8, shortlist=200)
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.4)


@query(
    "sim_mmr_rerank",
    oracle="""
    WITH RECURSIVE
    probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS q
               FROM embeddings WHERE vec_id < 3),
    corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    scored AS (
      SELECT p.probe_id, c.vec_id,
             round(list_cosine_similarity(c.v, p.q), 9) AS qs, c.v
      FROM corpus c CROSS JOIN probes p WHERE c.vec_id <> p.probe_id),
    cand AS (
      SELECT probe_id, vec_id, qs, v FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                     ORDER BY qs DESC, vec_id) AS rn
        FROM scored) WHERE rn <= 20),
    pair AS (
      SELECT x.probe_id, x.vec_id AS a, y.vec_id AS b,
             round(list_cosine_similarity(x.v, y.v), 9) AS s
      FROM cand x JOIN cand y
        ON x.probe_id = y.probe_id AND x.vec_id <> y.vec_id),
    sel AS (
      (SELECT probe_id, 1 AS step, [vec_id] AS chosen, vec_id AS picked
       FROM (SELECT probe_id, vec_id,
                    ROW_NUMBER() OVER (PARTITION BY probe_id
                                       ORDER BY 0.7*qs DESC, vec_id) AS rn
             FROM cand) WHERE rn = 1)
      UNION ALL
      (SELECT probe_id, step + 1, list_append(chosen, nxt), nxt FROM (
         SELECT s.probe_id, s.step, s.chosen,
                (SELECT c.vec_id FROM cand c
                 WHERE c.probe_id = s.probe_id
                   AND NOT list_contains(s.chosen, c.vec_id)
                 ORDER BY 0.7*c.qs - (1.0 - 0.7)*(
                            SELECT MAX(p.s) FROM pair p
                            WHERE p.probe_id = s.probe_id
                              AND p.a = c.vec_id
                              AND list_contains(s.chosen, p.b))
                          DESC, c.vec_id
                 LIMIT 1) AS nxt
         FROM sel s WHERE s.step < 5) WHERE nxt IS NOT NULL))
    SELECT probe_id, picked AS vec_id, CAST(step AS INT) AS rank
    FROM sel
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity rerank for 3 probes
    (operators/similarity.py mmr_rerank): greedy argmax of
    0.7*sim(q,d) - 0.3*max_selected sim(d,s) over the exact top-20
    shortlist — the RAG serving step that stops near-duplicate
    passages from crowding out coverage. The corpus work (shortlist
    scan, bounded pair self-join) is distributed; the k-step greedy is
    inherently sequential and runs on the bounded pair table
    (shortlist^2 per probe — serving constants), where every
    production reranker puts it. EXACTLY oracled: DuckDB replays the
    same greedy with a recursive CTE over the same 9-decimal-rounded
    similarities (identical IEEE formula, identical tie-breaks), so
    all 15 selections must match bit-for-bit."""
    from ..operators.similarity import mmr_rerank

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )
    out = mmr_rerank(emb, probes, k=5, shortlist=20, lam=0.7)
    return out.select("probe_id", "vec_id", "rank")


@query("sim_ivfpq_append", oracle=_PROBE_ORACLE)
def sim_ivfpq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest into the persisted IVF+PQ index
    (operators/similarity.py ivf_pq_append): the index is BUILT on the
    even half of the corpus (training + encode), then the odd half is
    APPENDED by encoding against the frozen quantizers into the same
    cell partitions — faiss add(), the loop every production vector
    store runs per ingest batch. The serving path picks the appended
    vectors up with zero changes (partition scans, not manifests), so
    the recall contract (floor 40%; probes' true neighbors are split
    across both halves) can only hold if the appended half actually
    serves. Serving knobs are nprobe=10/shortlist=300, one step above
    the full-corpus-trained rows' 8/200: quantizers trained on HALF
    the corpus match it a little less sharply, and the measured
    min-probe recall at 8/200 grazed the floor at sf0.1 (0.3) where
    10/300 restores the margin (0.5 at sf0.1, higher at smaller sf) —
    the dial every frozen-quantizer index turns as its unseen fraction
    grows. Index cached with the same source fingerprint as
    sim_ivfpq_persisted; distribution drift is the documented trade
    (rebuild = the compaction analog)."""
    from ..operators.similarity import ivf_pq_append, ivf_pq_query

    emb = table(spark, sf_dir, "embeddings")
    probes = _probes(emb)

    def build(tmp: str) -> None:
        from ..operators.similarity import ivf_pq_build

        ivf_pq_build(
            emb.filter(F.col("vec_id") % 2 == 0), tmp,
            n_centroids=16, n_subspaces=8,
        )
        ivf_pq_append(spark, tmp, emb.filter(F.col("vec_id") % 2 == 1))

    idx = _ivfpq_index_dir(sf_dir, emb, variant="_halves",
                           build_fn=build)
    ann = ivf_pq_query(spark, idx, probes, k=10, nprobe=10,
                       shortlist=300)
    exact = brute_force_topk(emb, probes, k=10)
    return _recall_contract(ann, exact, floor=0.4)
