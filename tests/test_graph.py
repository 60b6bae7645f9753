"""Connected-components invariants (operators/graph.py): transitive
closure correctness on shapes that stress multi-round propagation."""

from __future__ import annotations

import pytest

from elb_log_to_mysql_spark.operators.graph import connected_components, dedup_clusters


def test_cc_chain_and_separate_components(spark):
    # chain 1-2-3-4-5 (diameter 4 → several propagation rounds),
    # triangle 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["a", "b"],
    )
    got = {
        r.id: r.cluster_id for r in connected_components(edges, "a", "b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_max_iter_raises(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"])
    with pytest.raises(RuntimeError):
        connected_components(edges, "a", "b", max_iter=1)


def test_dedup_clusters_defaults_to_own_id(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 3), (3, 5)], ["doc_id_a", "doc_id_b"])
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 2, 4: 4}
