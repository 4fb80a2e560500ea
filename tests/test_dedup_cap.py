"""Hot-bucket cap semantics for the LSH pair expansions
(operators/dedup.py, operators/similarity.py): in a bucket larger than
``max_bucket``, the first max_bucket members (by id) run all-pairs and
every later member contributes exactly one star edge to the bucket's
smallest-id member — so pair volume per bucket is bounded by
max_bucket^2/2 + n while clusters stay connected."""

from __future__ import annotations

from pyspark.sql import functions as F

from druid_datafusion_bridge_spark.operators.dedup import lsh_candidate_pairs
from druid_datafusion_bridge_spark.operators.similarity import (
    embedding_neardup_pairs,
)


def test_oversized_bucket_head_pairs_plus_stars(spark):
    """60 identical docs with cap 10: every band bucket holds all 60, so
    the distinct pair set must be C(10,2) head pairs + 50 star edges,
    with stars all anchored at the smallest doc_id."""
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    ).repartition(8)
    pairs = lsh_candidate_pairs(docs, n=3, max_bucket=10).collect()
    assert len(pairs) == 45 + 50
    stars = [p for p in pairs if p.doc_b >= 10]
    assert len(stars) == 50
    assert all(p.doc_a == 0 for p in stars)
    head = {(p.doc_a, p.doc_b) for p in pairs if p.doc_b < 10}
    assert head == {(a, b) for a in range(10) for b in range(10) if a < b}


def test_small_bucket_unaffected_by_cap(spark):
    """Buckets at or under the cap keep plain all-pairs semantics."""
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    ).repartition(4)
    pairs = lsh_candidate_pairs(docs, n=3, max_bucket=10).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {
        (a, b) for a in range(10) for b in range(10) if a < b
    }


def test_embedding_hot_bucket_members_all_detected(spark):
    """40 identical embeddings with cap 8: every member appears in at
    least one >=0.99 pair (star edges keep clusters connected), and no
    unbounded per-bucket list is needed to find them."""
    vec = [1.0, 0.0, 0.5, 0.25] * 4
    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in vec]).cast("array<float>").alias("embedding"),
    ).repartition(8)
    pairs = embedding_neardup_pairs(
        emb, threshold=0.99, bits=2, tables=2, dim=16, max_bucket=8
    ).collect()
    seen = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    assert seen == set(range(40))
    assert all(p.sim >= 0.99 for p in pairs)


def test_duplicate_clusters_chain_and_singletons(spark):
    """Min-label propagation must follow multi-hop chains (0-1, 1-2,
    2-3, ... all collapse to cluster 0) and label untouched docs as
    their own singleton clusters."""
    from pyspark.sql import functions as F

    from druid_datafusion_bridge_spark.operators.dedup import (
        duplicate_clusters,
    )

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (8, 9)],
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(docs, pairs=pairs).collect()
    }
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
        5: 5, 6: 5,
        7: 7,
        8: 8, 9: 8,
        10: 10, 11: 11,
    }


def test_duplicate_clusters_string_ids_converge(spark):
    """The convergence witness must work for NON-numeric doc ids: a
    label-sum witness silently returns NULL for strings (None == None
    after round one) and stops before the chain collapses."""
    from druid_datafusion_bridge_spark.operators.dedup import (
        duplicate_clusters,
    )

    docs = spark.createDataFrame(
        [("doc1",), ("doc2",), ("doc3",), ("doc9",)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("doc1", "doc2"), ("doc2", "doc3")], "doc_a string, doc_b string"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(docs, pairs).collect()
    }
    assert got == {
        "doc1": "doc1",
        "doc2": "doc1",
        "doc3": "doc1",  # needs 2 propagation rounds through the chain
        "doc9": "doc9",
    }


def test_ngram_df_cut_bounds_boilerplate_expansion(spark):
    """60 docs sharing one boilerplate 5-gram (df=60 > max_df=50): the
    df-cut must drop that posting list — no pairs from boilerplate-only
    overlap — while a genuinely duplicated rare doc pair survives with
    its Jaccard computed against FULL per-doc gram counts."""
    from druid_datafusion_bridge_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # 6 tokens -> 2 grams: (b1..b5) shared by all, (b2..b5 u{i}) unique
    boiler = [
        (i, f"b1 b2 b3 b4 b5 u{i}") for i in range(60)
    ]
    # two identical rare docs: share both of their 2 grams -> jaccard 1.0
    rare = [(100, "x1 x2 x3 x4 x5 x6"), (101, "x1 x2 x3 x4 x5 x6")]
    docs = spark.createDataFrame(boiler + rare, "doc_id long, text string")
    got = ngram_jaccard_pairs(
        docs, n=5, threshold=0.2, max_df=50
    ).collect()
    # uncapped this corpus yields C(60,2)=1770 boilerplate pairs at
    # jaccard 1/3; the cut leaves exactly the true duplicate pair
    assert [(r.doc_a, r.doc_b, r.shared, r.jaccard) for r in got] == [
        (100, 101, 2, 1.0)
    ]


def test_ngram_oracle_mirrors_df_cut_past_the_bound(spark):
    """The dd_ngram_jaccard ORACLE must reproduce the df-cut bit-for-bit
    PAST the bound: 1100 docs sharing a boilerplate shingle put its df
    over NGRAM_MAX_DF=1000, where an uncut oracle would enumerate
    ~600k pairs (jaccard 1/3 >= 0.2) against the operator's 1."""
    import duckdb
    import pandas as pd

    from druid_datafusion_bridge_spark.operators.dedup import (
        NGRAM_MAX_DF,
        ngram_jaccard_pairs,
    )
    from druid_datafusion_bridge_spark.queries import all_oracles

    n = NGRAM_MAX_DF + 100
    ids = list(range(n)) + [200000, 200001]
    texts = [f"b1 b2 b3 b4 b5 u{i}" for i in range(n)] + [
        "x1 x2 x3 x4 x5 x6",
        "x1 x2 x3 x4 x5 x6",
    ]
    docs = spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    ).repartition(8)
    got = {
        (r.doc_a, r.doc_b, r.shared, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=5, threshold=0.2).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids, "text": texts}))
    want = {
        tuple(r)
        for r in con.execute(all_oracles()["dd_ngram_jaccard"]).fetchall()
    }
    assert got == want == {(200000, 200001, 2, 1.0)}


def test_lsh_oracle_mirrors_cap_past_the_bound(spark):
    """The dd_minhash_lsh_pairs ORACLE must reproduce the operator's
    hot-bucket bound bit-for-bit PAST the cap: 2100 identical docs put
    every band bucket over LSH_MAX_BUCKET=2000, where an unbounded
    all-pairs oracle would over-enumerate (~2.2M pairs vs the bounded
    ~2M head pairs + 100 star edges)."""
    import duckdb
    import pandas as pd

    from druid_datafusion_bridge_spark.operators.dedup import (
        LSH_MAX_BUCKET,
        lsh_candidate_pairs,
    )
    from druid_datafusion_bridge_spark.queries import all_oracles

    n = LSH_MAX_BUCKET + 100
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    ).repartition(8)
    got = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(docs).collect()
    }

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(n), "text": [text] * n}),
    )
    want = {
        tuple(r)
        for r in con.execute(all_oracles()["dd_minhash_lsh_pairs"]).fetchall()
    }
    assert got == want
    # and the bound actually bit: star members pair only with doc 0
    assert (2000, 2001) not in got and (0, 2001) in got
