"""Tests for the dataset-curation operators: differential fuzz for
batch sessionization (random gaps/ties vs DuckDB), growth-stability
properties of the hash-based split/mix (the invariant that justifies
hash sampling over RNG sampling), and the mathematical reconstruction
bound of int8 quantization."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from druid_datafusion_bridge_spark.catalog import table
from druid_datafusion_bridge_spark.operators.temporal import sessionize
from druid_datafusion_bridge_spark.operators.text_pipeline import (
    domain_mix,
    hash_unit,
    stratified_split,
)

from .conftest import SF_DIR

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (user, epoch_second, event_id) — tight second range forces gap ties,
# duplicate timestamps, and single-event sessions
events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=7200),
        st.integers(min_value=0, max_value=10**6),
    ),
    max_size=30,
    unique_by=lambda t: t[2],
)


@pytest.mark.slow
@given(rows=events_st)
@SET
def test_sessionize_differential(spark, rows):
    schema = "user_id long, sec long, event_id long"
    df = (
        spark.createDataFrame(rows or [], schema)
        .select("user_id", "event_id", F.timestamp_seconds("sec").alias("ts"))
    )
    got = sessionize(df, gap_seconds=600)
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["user_id", "sec", "event_id"])
    con.register("raw", pdf)
    exp = con.execute(
        """
        WITH ev AS (
          SELECT user_id, event_id, to_timestamp(sec) AS ts FROM raw),
        laged AS (
          SELECT user_id, event_id, ts,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM ev),
        numbered AS (
          SELECT user_id, ts,
                 CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 600000000
                               THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM laged)
        SELECT user_id, session_seq,
               MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
        """
    ).fetchall()
    got_rows = [
        (
            r["user_id"],
            r["session_seq"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
        )
        for r in got.collect()
    ]
    assert got_rows == [tuple(r) for r in exp]


def test_sessionize_invariants(spark):
    """Sessions partition the events: counts sum to the table size, and
    every session respects the gap bound between start and end."""
    ev = table(spark, SF_DIR, "events")
    s = sessionize(ev, gap_seconds=1800).cache()
    try:
        assert s.agg(F.sum("n_events")).first()[0] == ev.count()
        # within one session, total span < gap * n_events (each
        # consecutive hop is <= gap)
        bad = s.filter(
            F.unix_micros("session_end") - F.unix_micros("session_start")
            > F.lit(1800 * 1_000_000) * (F.col("n_events") - 1)
        )
        assert bad.count() == 0
    finally:
        s.unpersist()


def test_split_stable_under_growth(spark):
    """The defining property of hash-based splitting: restricting the
    corpus to any subset never changes an existing row's split."""
    docs = table(spark, SF_DIR, "documents")
    full = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id",
            F.when(hash_unit("doc_id") < 0.1, "val").otherwise("train").alias(
                "split"
            ),
        ).collect()
    }
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    for r in subset.select(
        "doc_id",
        F.when(hash_unit("doc_id") < 0.1, "val").otherwise("train").alias("split"),
    ).collect():
        assert full[r["doc_id"]] == r["split"]


def test_stratified_split_covers_all_rows(spark):
    docs = table(spark, SF_DIR, "documents")
    out = stratified_split(docs, strata_col="lang", val_frac=0.1)
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()


def test_domain_mix_rates(spark):
    """Rarest domain keeps rate 1.0; every rate in (0, 1]; kept <= total."""
    docs = table(spark, SF_DIR, "documents")
    rows = domain_mix(docs, domain_col="lang", alpha=0.5).collect()
    assert any(abs(r["rate"] - 1.0) < 1e-12 for r in rows)
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0 + 1e-12
        assert 0 <= r["n_kept"] <= r["n_docs"]


def test_int8_quantize_error_bound(spark):
    """Rounding to the nearest int8 level can be off by at most half a
    quantization step: max_abs_err <= scale/2 for every vector."""
    from druid_datafusion_bridge_spark.queries.embedding_ops import (
        em_int8_quantize,
    )

    q = em_int8_quantize(spark, SF_DIR)
    bad = q.filter(F.col("max_abs_err") > F.col("scale") / 2 + 1e-15)
    assert bad.count() == 0
    # q_l1 bounds: |q_i| <= 127 per dim, 64 dims
    assert q.agg(F.max("q_l1")).first()[0] <= 127 * 64


def test_vocab_coverage_monotone(spark):
    from druid_datafusion_bridge_spark.queries.text_pipeline import (
        txp_vocab_coverage,
    )

    rows = txp_vocab_coverage(spark, SF_DIR).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    counts = [r["cnt"] for r in rows]
    assert all(b <= a for a, b in zip(counts, counts[1:]))
    assert shares[-1] <= 1.0 + 1e-12


# short/empty/duplicate texts force the len<3 exclusion, tie-heavy
# models, and 100%-familiar docs
docs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),
        st.sampled_from(
            ["", "ab", "abc", "abcabc", "the cat sat", "zzzzzz", "q",
             "the cat sat on the mat", "xy xy xy"]
        ),
    ),
    max_size=20,
    unique_by=lambda t: t[0],
)


@pytest.mark.slow
@given(rows=docs_st)
@SET
def test_trigram_familiarity_differential(spark, rows):
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        trigram_familiarity,
    )

    df = spark.createDataFrame(rows or [], "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_tri"], r["n_hits"], round(r["familiarity"], 12))
        for r in trigram_familiarity(df, model_size=3).collect()
    )
    if not rows:
        # empty corpus: nothing scored (DuckDB can't type an empty
        # registered frame for the oracle query)
        assert got == []
        return
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    exp = con.execute(
        """
        WITH tri AS (
          SELECT doc_id, substr(text, s.i, 3) AS g
          FROM documents, unnest(generate_series(1, length(text) - 2)) AS s(i)
          WHERE length(text) >= 3),
        model AS (
          SELECT g FROM (
            SELECT g, COUNT(*) AS c FROM tri GROUP BY g
            ORDER BY c DESC, g LIMIT 3)),
        scored AS (
          SELECT t.doc_id, COUNT(*) AS n_tri,
                 CAST(SUM(CASE WHEN m.g IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_hits
          FROM tri t LEFT JOIN model m ON t.g = m.g
          GROUP BY t.doc_id)
        SELECT doc_id, n_tri, n_hits,
               round(n_hits / CAST(n_tri AS DOUBLE), 12) AS familiarity
        FROM scored ORDER BY doc_id
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_chunk_with_stride_covers_every_token(spark):
    """Every token index lands in >=1 chunk; chunks are window-sized
    except possibly the last; consecutive chunks overlap by
    window - stride; a short doc yields exactly one whole-doc chunk."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        chunk_with_stride,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(33))),  # one token past window
            (2, " ".join(f"t{i}" for i in range(32))),  # exactly window
            (3, "a b c"),  # short
            (4, " ".join(f"t{i}" for i in range(80))),  # several chunks
        ],
        "doc_id long, text string",
    )
    rows = chunk_with_stride(docs, window=32, stride=24).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == [1, 2, 3, 4]
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    assert by_doc[3][0].chunk_text == "a b c" and by_doc[3][0].chunk_len == 3
    # doc 1: chunks [0..32) and [24..33) — covers token 32, overlap 8
    assert [c.chunk_len for c in sorted(by_doc[1], key=lambda c: c.chunk_id)] == [32, 9]
    for doc_id, n_tokens in [(1, 33), (4, 80)]:
        covered = set()
        for c in by_doc[doc_id]:
            assert c.chunk_text.split(" ") == [
                f"t{i}" for i in range(c.start_tok, c.start_tok + c.chunk_len)
            ]
            covered.update(range(c.start_tok, c.start_tok + c.chunk_len))
        assert covered == set(range(n_tokens))


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    """Same seed reproduces the identical order; a different seed
    permutes it; positions are dense 1..n within each shard."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        epoch_shuffle,
    )

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a = sorted(epoch_shuffle(docs, seed=1, n_shards=4).collect())
    b = sorted(epoch_shuffle(docs, seed=1, n_shards=4).collect())
    c = sorted(epoch_shuffle(docs, seed=2, n_shards=4).collect())
    assert a == b
    assert a != c  # a 200-doc collision across all shards is impossible
    shard_pos: dict[int, list[int]] = {}
    for r in a:
        shard_pos.setdefault(r.shard, []).append(r.pos_in_shard)
    assert set(shard_pos) == {0, 1, 2, 3}
    for positions in shard_pos.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


# random token counts around the window/stride boundaries, including
# docs shorter than one window and exact-multiple lengths
chunk_docs_st = st.lists(
    st.integers(min_value=1, max_value=90),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@given(n_tokens=chunk_docs_st, window=st.integers(8, 40), stride=st.integers(4, 40))
@SET
def test_chunk_with_stride_differential(spark, n_tokens, window, stride):
    """chunk_with_stride must agree with a direct DuckDB recomputation
    for arbitrary document lengths, windows, and strides (stride may
    exceed window — disjoint chunks with gaps is a valid layout only
    when stride <= window, so clamp like the operator's contract)."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        chunk_with_stride,
    )

    stride = min(stride, window)  # operator contract: overlap >= 0
    rows = [
        (i, " ".join(f"x{i}_{j}" for j in range(nt)))
        for i, nt in enumerate(n_tokens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in chunk_with_stride(df, window=window, stride=stride).collect()
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    exp = con.execute(
        f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        meta AS (SELECT doc_id, t,
                 CAST(1 + ceil(greatest(len(t) - {window}, 0) / {stride}.0) AS BIGINT)
                   AS n_chunks FROM toks)
        SELECT doc_id, CAST(i AS BIGINT), CAST(i * {stride} AS BIGINT),
               CAST(least({window}, len(t) - i * {stride}) AS BIGINT),
               array_to_string(t[i*{stride} + 1 : i*{stride} + {window}], ' ')
        FROM meta, unnest(generate_series(0, n_chunks - 1)) AS u(i)
        """
    ).fetchall()
    assert got == sorted(tuple(r) for r in exp)


def test_keyword_search_normalizes_terms(spark):
    """Mixed-case and duplicate query terms must not silently match
    nothing: tokens are lowercased, so the query must be too, and a
    duplicated term must not make the ALL-terms check unsatisfiable."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        keyword_search,
    )

    docs = spark.createDataFrame(
        [(1, "spark shuffles data fast"), (2, "ducks quack")],
        "doc_id long, text string",
    )
    got = keyword_search(docs, terms=("Spark", "DATA", "spark"))
    assert [r.doc_id for r in got.collect()] == [1]


def test_chunk_with_stride_rejects_coverage_gap(spark):
    """stride > window would silently drop the tokens between one
    chunk's end and the next chunk's start — the documented
    every-token-covered invariant requires a loud error instead."""
    import pytest

    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        chunk_with_stride,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_with_stride(docs, window=16, stride=24)


def test_bloom_tolerates_null_keys(spark):
    """NULL join keys: the build side must not crash map_from_entries
    with a NULL map key, and a NULL probe key must flag bloom_pass =
    False (a join can't match NULL), not NULL."""
    from druid_datafusion_bridge_spark.operators.bloom import (
        bloom_build,
        bloom_probe_flag,
    )

    keys = spark.createDataFrame([(1,), (None,), (7,)], "k long")
    bitmap = bloom_build(keys, "k")
    probe = spark.createDataFrame([(1,), (None,), (99,)], "k long")
    got = {
        r.k: r.bloom_pass
        for r in bloom_probe_flag(probe, bitmap, "k").collect()
    }
    assert got[1] is True
    assert got[None] is False  # not NULL
    # 99 was never inserted; bloom may false-positive but must be bool
    assert isinstance(got[99], bool)


def test_decontaminate_hand_case(spark):
    """decontaminate flags exactly the docs sharing an n-gram with the
    benchmark slice; short docs drop; repeats inside one doc count
    once (array_distinct)."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        decontaminate,
    )

    rows = [
        # benchmark doc: grams "a b c", "b c d"
        (0, "a b c d", "bench"),
        # contaminated: contains "b c d" (twice -> still one distinct)
        (1, "x b c d y b c d", "train"),
        # clean: same words, different order
        (2, "d c b a z", "train"),
        # too short for 3-grams: drops
        (3, "one two", "train"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r
        for r in decontaminate(df, bench_source="bench", n=3).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["contaminated"] and got[1]["n_shared"] == 1
    # doc1 distinct 3-grams: x b c / b c d / c d y / d y b / y b c = 5
    assert got[1]["n_grams"] == 5
    assert not got[2]["contaminated"] and got[2]["n_shared"] == 0


def test_pii_scrub_patterns(spark):
    """pii_scrub: each pattern redacts and counts; order is
    email -> phone -> ipv4; non-PII digits survive."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        pii_scrub,
    )

    rows = [
        (0, "write to a.b+c@mail-srv.example.org today"),
        (1, "call 415-555-0199 or 650-555-0100 x9"),
        (2, "node 192.168.254.3 port 8080 v1.2 build 37"),
        (3, "clean text with numbers 12345 and 1.5x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[0]["n_email"] == 1 and "<EMAIL>" in got[0]["scrubbed"]
    assert "@" not in got[0]["scrubbed"]
    assert got[1]["n_phone"] == 2
    assert got[1]["scrubbed"] == "call <PHONE> or <PHONE> x9"
    assert got[2]["n_ipv4"] == 1
    assert got[2]["scrubbed"] == "node <IPV4> port 8080 v1.2 build 37"
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ipv4"] == 0
    assert got[3]["scrubbed"] == rows[3][1]


def test_pii_scrub_counts_equal_redactions(spark):
    """Counts are computed stage-by-stage on the progressively scrubbed
    text, so each kind's count equals the placeholders it inserted —
    an IPv4-shaped sequence consumed by the email redaction neither
    matches nor counts."""
    from druid_datafusion_bridge_spark.operators.text_pipeline import (
        pii_scrub,
    )

    rows = [(0, "ping 1.2.3.4@example.org and 10.0.0.1 now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    assert r["n_email"] == 1
    assert r["n_ipv4"] == 1  # only the standalone quad survives
    assert r["scrubbed"] == "ping <EMAIL> and <IPV4> now"
    assert r["scrubbed"].count("<IPV4>") == r["n_ipv4"]
