"""Engine-exact k-means (operators/clustering.py) — Lloyd-convergence
and edge-case properties.  DuckDB parity of the catalog row is covered
by the full-catalog sweep in test_catalog_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.clustering import (
    kmeans_assign_exact,
    md5_seed_centroids,
)
from excelstream_spark.tables import load_table

from .conftest import SF_DIR


def _sse(df):
    return df.agg(F.sum("dist_r")).collect()[0][0]


def test_lloyd_sse_non_increasing(spark):
    """Each Lloyd iteration's assignment cost is <= the previous one
    (the textbook convergence guarantee; both steps are exact here, so
    the inequality cannot be blurred by float noise)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    costs = [
        _sse(kmeans_assign_exact(emb, k=8, n_iter=n)) for n in (0, 1, 2)
    ]
    assert costs[0] >= costs[1] >= costs[2]
    # and the iterations actually moved something on this fixture
    assert costs[0] > costs[2]


def test_separated_blobs_cluster_perfectly(spark):
    """Two far-apart blobs, k=2: every point lands with its blob no
    matter which seeds the md5 order picked."""
    rows = [
        (i, [float(10 + (i % 3)), 10.0]) for i in range(6)
    ] + [
        (10 + i, [float(-10 - (i % 3)), -10.0]) for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = kmeans_assign_exact(emb, k=2, n_iter=2).collect()
    by_cid: dict[int, set[int]] = {}
    for r in out:
        by_cid.setdefault(r["cid"], set()).add(r["vec_id"])
    assert len(by_cid) == 2
    blobs = sorted(frozenset(v) for v in by_cid.values())
    assert sorted(map(sorted, blobs)) == [
        list(range(6)), list(range(10, 16))
    ]


def test_k_exceeding_corpus_degrades_gracefully(spark):
    """k > n: only n seeds exist; every vector still gets exactly one
    assignment and distances are finite."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = kmeans_assign_exact(emb, k=10, n_iter=1)
    rows = out.collect()
    assert len(rows) == 3
    assert len({r["vec_id"] for r in rows}) == 3
    assert all(r["dist_r"] is not None for r in rows)


def test_determinism_and_null_ids(spark):
    """Same input -> identical assignments; NULL-id vectors are
    excluded (they could never be referenced downstream)."""
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .unionByName(
            spark.createDataFrame(
                [(None, [0.0] * 8)], "vec_id bigint, embedding array<float>"
            )
        )
    )
    a = sorted(map(tuple, kmeans_assign_exact(emb, k=4, n_iter=1).collect()))
    b = sorted(map(tuple, kmeans_assign_exact(emb, k=4, n_iter=1).collect()))
    assert a == b
    assert all(t[0] is not None for t in a)


def test_seed_centroids_are_corpus_vectors(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = md5_seed_centroids(emb, k=3)
    # 3 centroids x dim rows, each a real component copy
    dim = len(emb.first()["embedding"])
    assert cents.count() == 3 * dim
    assert cents.select("cid").distinct().count() == 3


def test_kmeans_plan_broadcasts_centroids(spark):
    """100 TB shape assertions: every per-iteration centroid join is a
    BroadcastHashJoin (the k*d centroid table must never shuffle the
    exploded corpus), and the dim-row table feeds every iteration from
    the scoped persist (InMemoryTableScan), not a re-scan."""
    emb = load_table(spark, SF_DIR, "embeddings")
    out = kmeans_assign_exact(emb, k=4, n_iter=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan
    # the exploded corpus side must not appear as the build side of a
    # SortMergeJoin against centroids (dims x centroids is the only
    # dim-keyed join in the plan)
    assert "SortMergeJoin [dim" not in plan
