"""ANN quality tests: both approximate paths (multi-table LSH, IVF)
must achieve real recall against the exact brute-force baseline — a
structurally-correct ANN with near-zero recall is a bug, not an
approximation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from druid_datafusion_bridge_spark.catalog import table
from druid_datafusion_bridge_spark.operators.similarity import (
    as_double_vec,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def probes(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        as_double_vec(F.col("embedding")).alias("probe_vec"),
    )


@pytest.fixture(scope="module")
def truth(emb, probes):
    return {
        (r["probe_id"], r["vec_id"])
        for r in brute_force_topk(emb, probes, k=10).collect()
    }


def _structure_ok(rows):
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for group in by_probe.values():
        group.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in group] == list(range(1, len(group) + 1))
        sims = [r["sim"] for r in group]
        assert sims == sorted(sims, reverse=True)
        assert len(group) <= 10


def test_lsh_recall_and_structure(emb, probes, truth):
    rows = lsh_topk(emb, probes, dim=64, k=10, bits=4, tables=8).collect()
    _structure_ok(rows)
    got = {(r["probe_id"], r["vec_id"]) for r in rows}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.4, f"multi-table LSH recall collapsed: {recall}"


def test_ivf_recall_and_structure(emb, probes, truth):
    rows = ivf_topk(emb, probes, k=10, n_centroids=16, nprobe=4).collect()
    _structure_ok(rows)
    got = {(r["probe_id"], r["vec_id"]) for r in rows}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall collapsed: {recall}"


def test_ivf_more_probes_more_recall(emb, probes, truth):
    """nprobe is the recall/cost dial; full probe == exact search."""
    rows = ivf_topk(emb, probes, k=10, n_centroids=16, nprobe=16).collect()
    got = {(r["probe_id"], r["vec_id"]) for r in rows}
    assert got == truth  # probing every cell must reproduce brute force
