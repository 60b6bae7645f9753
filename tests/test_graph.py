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


def test_pagerank_mass_conserved_and_degree_ordered(spark):
    """No dangling nodes in a symmetrized graph -> total rank mass
    stays ~1 each iteration; suppliers touching more parts outrank
    suppliers touching fewer."""
    from pyspark.sql import functions as F

    from elb_log_to_mysql_spark.operators.graph import pagerank
    from elb_log_to_mysql_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = li.select(p.alias("src"), s.alias("dst")).union(
        li.select(s.alias("src"), p.alias("dst"))
    )
    pr = pagerank(edges, iterations=3).cache()
    total = pr.agg(F.sum("pr")).first()[0]
    assert abs(total - 1.0) < 1e-3
    # rank correlates with degree: top-ranked supplier is a max-degree one
    deg = (
        edges.distinct().groupBy("src").count().withColumnRenamed("src", "id")
    )
    joined = pr.join(deg, "id").filter(F.col("id").startswith("s"))
    top = joined.orderBy(F.col("pr").desc()).first()
    max_deg = joined.agg(F.max("count")).first()[0]
    assert top["count"] >= 0.8 * max_deg
    pr.unpersist()


def test_pagerank_uniform_on_regular_graph(spark):
    """On a k-regular graph PageRank's fixpoint is uniform; a ring is
    2-regular, so 3 iterations must keep ranks exactly equal."""
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)]
        + [((i + 1) % 6, i) for i in range(6)],
        "src int, dst int",
    )
    from elb_log_to_mysql_spark.operators.graph import pagerank

    pr = pagerank(edges, iterations=3)
    vals = {r["pr"] for r in pr.collect()}
    assert len(vals) == 1


def test_triangle_count_known_graph(spark):
    """K4 has exactly 4 triangles; adding a pendant edge adds none."""
    from elb_log_to_mysql_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "src int, dst int")
    n = triangle_count(edges).first()["n_triangles"]
    assert n == 4


def test_triangle_count_ignores_duplicate_and_reversed_edges(spark):
    from elb_log_to_mysql_spark.operators.graph import triangle_count

    tri = [(1, 2), (2, 3), (3, 1), (2, 1), (1, 2)]
    n = triangle_count(
        spark.createDataFrame(tri, "src int, dst int")
    ).first()["n_triangles"]
    assert n == 1
