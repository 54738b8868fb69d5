"""Unit tests for connected-components dedup clustering: chains, merges,
singletons, and the LSH-pairs integration."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.clusters import connected_components, dedup_clusters
from aces_spark.datapipe.dedup import minhash_lsh_pairs


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_chain_transitivity(spark):
    # 1-2-3-4-5 chain: pairwise links only, one component
    labels = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        ).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_and_merge(spark):
    # two components {1,2,3} and {10,11}; 7-8 and 8-9 merge via shared node
    edges = [(2, 1), (2, 3), (10, 11), (7, 8), (9, 8)]
    labels = {
        r["node"]: r["cluster_id"] for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10
    assert labels[7] == labels[8] == labels[9] == 7


def test_long_chain_converges_fast(spark):
    # a 64-node chain needs ~6 alternating rounds, far below max_iter
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    labels = connected_components(_pairs(spark, edges), max_iter=15).collect()
    assert {r["cluster_id"] for r in labels} == {0}
    assert len(labels) == n + 1


def test_dedup_clusters_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(docs, _pairs(spark, [(1, 2), (2, 3)])).collect()
    }
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    for d in (4, 5, 6, 7):
        assert out[d] == (d, 1)


def test_keep_best_picks_argmax_with_min_id_tiebreak(spark):
    from aces_spark.datapipe.clusters import keep_best

    clustered = spark.createDataFrame(
        [
            (1, 1, 0.5),
            (2, 1, 0.9),  # winner of cluster 1
            (3, 1, 0.9),  # same score, higher id -> loses tie-break... to 2
            (7, 7, 0.1),  # singleton survives regardless of score
        ],
        "doc_id long, cluster_id long, quality double",
    )
    out = {r["doc_id"]: r for r in keep_best(clustered, "quality").collect()}
    assert set(out) == {2, 7}
    assert out[2]["n_removed"] == 2
    assert out[7]["n_removed"] == 0


def test_lsh_pairs_to_clusters_end_to_end(spark):
    # three near-identical docs chain into ONE cluster even if LSH misses
    # one of the three pairs; unrelated doc stays a singleton
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, base + " extra words"),
            (9, "completely different text about spark clusters and parquet files"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, n=3, num_hashes=16, bands=8)
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[9] == 9
